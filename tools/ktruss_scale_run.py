"""k-truss scale artifact: 500k vertices, 2000 planted K12 cliques
(132,000 clique edges — each K12 is a 12-truss) drowned in ~5M random
noise edges. ktruss(k=8) must peel ALL noise (a random edge needs 6
common neighbors to survive — vanishingly unlikely at this density)
and keep EVERY clique edge, exercising multi-round deletion +
support recomputation at a scale where each round's wedge sweep runs
distributed over the oriented CSR (pipelines/truss.py).

Usage: python tools/ktruss_scale_run.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def calib() -> float:
    import numpy as np

    a = np.ones((1500, 1500))
    t0 = time.perf_counter()
    a @ a
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import numpy as np
    import ray

    c0 = calib()
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from neo4j_graph_algorithms_ray.pipelines.truss import ktruss
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    n, n_cliques, csize, m_noise = 500_000, 2000, 12, 5_000_000
    rng = np.random.default_rng(41)
    t0 = time.perf_counter()
    # cliques on vertices [0, n_cliques*csize)
    base = np.arange(n_cliques, dtype=np.int64)[:, None] * csize
    iu, iv = np.triu_indices(csize, 1)
    cu = (base + iu[None, :]).ravel()
    cv = (base + iv[None, :]).ravel()
    a = rng.integers(0, n, m_noise, dtype=np.int64)
    b = rng.integers(0, n, m_noise, dtype=np.int64)
    keep = a != b
    src = np.concatenate([cu, a[keep]])
    dst = np.concatenate([cv, b[keep]])
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = GraphTables.from_arrays(src, dst)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = ktruss(g, k=8)
    t_truss = time.perf_counter() - t0

    # exact recovery check: survivors == the planted clique edges
    clique_keys = set(
        (int(x) * n + int(y)) for x, y in zip(cu, cv)
    )
    got_keys = set(
        (int(g.vids[x]) * n + int(g.vids[y]))
        for x, y in zip(res.u, res.v)
    )
    out = {
        "artifact": "ktruss_scale_planted_cliques",
        "vertices": int(g.n),
        "edges": int(g.m),
        "k": 8,
        "planted_clique_edges": len(clique_keys),
        "surviving_edges": len(got_keys),
        "exact_recovery": got_keys == clique_keys,
        "rounds": res.rounds,
        "converged": res.converged,
        "gen_seconds": round(t_gen, 3),
        "build_seconds": round(t_build, 3),
        "ktruss_seconds": round(t_truss, 3),
        "cpu_calibration_sec": c0,
        "cpu_calibration_end_sec": calib(),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
