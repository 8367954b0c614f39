"""k-core scale artifact at REALISTIC sparsity: a seeded random simple
graph with n=5M vertices / ~50M undirected edges (avg degree ~20 — the
web-graph regime), exercising both round-4 levers at once: frontier
filtering (the active set collapses after a few rounds on sparse
graphs) and the range-split histogram fold (m >= 10M). Correctness is
cross-checked against the exact Batagelj peeling oracle on a seeded
1/64 vertex-induced subgraph of the SAME generator (full-graph peeling
at this size is minutes of single-core Python; the subgraph check plus
the small-scale property tests pin the kernel).

Usage: python tools/kcore_sparse_scale_run.py [out_json]
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

    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    n = 5_000_000
    m_target = 50_000_000
    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    a = rng.integers(0, n, m_target, dtype=np.int64)
    b = rng.integers(0, n, m_target, dtype=np.int64)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    key = np.unique(lo * n + hi)
    src, dst = key // n, key % n
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded()
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = kcore(g)
    t_kcore = time.perf_counter() - t0

    dense = np.zeros(n, dtype=np.int64)
    dense[g.vids] = res.coreness

    out = {
        "artifact": "kcore_sparse_scale",
        "vertices": int(g.n),
        "edges": int(g.m),
        "gen_seconds": round(t_gen, 3),
        "build_seconds": round(t_build, 3),
        "kcore_seconds": round(t_kcore, 3),
        "rounds": res.iterations,
        "converged": res.converged,
        "max_coreness": int(res.coreness.max()),
        "frontier_sizes": res.metrics["frontier_sizes"],
        "cpu_calibration_sec": c0,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }

    # correctness: exact peel on a seeded vertex-induced subgraph
    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore_peel_oracle

    sub_mask = (np.arange(n) % 64) == 0
    e_keep = sub_mask[src] & sub_mask[dst]
    s_src, s_dst = src[e_keep], dst[e_keep]
    remap = -np.ones(n, dtype=np.int64)
    sub_vids = np.flatnonzero(sub_mask)
    remap[sub_vids] = np.arange(len(sub_vids))
    g_sub = GraphTables.from_arrays(s_src, s_dst)
    r_sub = kcore(g_sub)
    oracle = kcore_peel_oracle(
        remap[s_src], remap[s_dst], len(sub_vids)
    )
    got = np.zeros(len(sub_vids), dtype=np.int64)
    got[remap[g_sub.vids]] = r_sub.coreness
    present = np.zeros(len(sub_vids), dtype=bool)
    present[remap[g_sub.vids]] = True
    out["subgraph_oracle_match"] = bool(
        np.array_equal(got[present], oracle[present])
    )
    out["cpu_calibration_end_sec"] = calib()
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
