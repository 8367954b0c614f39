"""HyperANF scale artifact: n=10M vertices / ~40M undirected edges
(seeded sparse random graph), run on the range-sharded shard-pool
engine (pipelines/anf.py). What this pins:

  - the register matrix (n x 64 uint8 = 640 MB at this n) is never
    held whole by any single process: it lives as R range slices in
    plasma, owned by per-range fold tasks, and the driver's RSS stays
    flat across the run (measured before/after);
  - per-round driver traffic is R floats (the estimator partials);
  - correctness at scale: bit-exact cross-engine agreement with the
    single-task kernel on a seeded 1/16 vertex-induced subgraph of
    the SAME generator (the full bit-exact equivalence is pinned by
    tests/test_paths.py::test_hyperanf_sharded_matches_single_task).

Usage: python tools/anf_scale_run.py [out_json]
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


def rss_mb() -> float:
    import psutil

    return round(psutil.Process().memory_info().rss / 2**20, 1)


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

    from neo4j_graph_algorithms_ray.pipelines.anf import (
        _ANF_M,
        hyperanf,
    )
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    n = 10_000_000
    m_target = 40_000_000
    rng = np.random.default_rng(11)
    t0 = time.perf_counter()
    a = rng.integers(0, n, m_target, dtype=np.int64)
    b = rng.integers(0, n, m_target, dtype=np.int64)
    keep = a != b
    src, dst = a[keep], b[keep]
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = GraphTables.from_arrays(src, dst)
    sg = g.sharded()
    t_build = time.perf_counter() - t0

    rss_before = rss_mb()
    t0 = time.perf_counter()
    t = hyperanf(g, rounds=4, directed=False, sharded=True)
    t_anf = time.perf_counter() - t0
    rss_after = rss_mb()
    npairs = t["n_pairs"].to_numpy()

    R = max(2, len(sg.actors))
    out = {
        "artifact": "anf_scale",
        "vertices": int(g.n),
        "edges": int(g.m),
        "rounds": 4,
        "gen_seconds": round(t_gen, 3),
        "build_seconds": round(t_build, 3),
        "hyperanf_seconds": round(t_anf, 3),
        "n_pairs": [float(x) for x in npairs],
        "monotone": bool((np.diff(npairs) >= 0).all()),
        "register_matrix_mb_total": round(g.n * _ANF_M / 2**20, 1),
        "register_ranges": R,
        "register_mb_per_range_slice": round(g.n * _ANF_M / R / 2**20, 1),
        "driver_rss_mb_before": rss_before,
        "driver_rss_mb_after": rss_after,
        "shards": len(sg.actors),
        "cpu_calibration_sec": c0,
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }

    # cross-engine witness on a seeded 1/16 vertex-induced subgraph
    sub_mask = (np.arange(n) % 16) == 0
    e_keep = sub_mask[src] & sub_mask[dst]
    g_sub = GraphTables.from_arrays(src[e_keep], dst[e_keep])
    a_curve = hyperanf(g_sub, rounds=3, directed=False, sharded=False)[
        "n_pairs"
    ].to_numpy()
    b_curve = hyperanf(g_sub, rounds=3, directed=False, sharded=True)[
        "n_pairs"
    ].to_numpy()
    out["subgraph_cross_engine_bit_exact"] = bool(
        np.array_equal(a_curve, b_curve)
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
