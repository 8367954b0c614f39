"""Scale artifact for the round-4 kernels: HITS (transposed scatter)
and k-core (h-operator histogram fold) on the headline repo-link graph
(~131.5M weighted edges, 20k vertices at sf0.1 corpus sizing) — the
same cached corpus/edge table bench.py's headline uses.

Usage: python tools/hits_kcore_scale_run.py [out_json]
Writes one JSON line with wall times, rounds, fold-row telemetry and
the cpu calibration marker.
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

    import bench

    from neo4j_graph_algorithms_ray.pipelines.kcore import kcore
    from neo4j_graph_algorithms_ray.pipelines.pagerank import hits
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    sf = bench._sf_token()
    repos = bench._CORPUS_REPOS.get(sf, 3000)
    # reuse (or build) the cached corpus + derived edge table
    head_env = bench.headline(sf)
    edir = f"/tmp/raygraph_bench/edges_sf{sf}_r{repos}_g12000"
    g = GraphTables.from_dataset(
        rd.read_parquet(os.path.join(edir, "edges")),
        weight="weight",
        vids=np.load(os.path.join(edir, "vids.npy")),
    )
    sg = g.sharded()
    sg.scatter_sum(np.zeros(g.n))  # warm

    t0 = time.perf_counter()
    h = hits(g, fixed_iterations=10)
    t_hits = time.perf_counter() - t0

    t0 = time.perf_counter()
    kc = kcore(g)
    t_kcore = time.perf_counter() - t0

    out = {
        "artifact": "hits_kcore_scale",
        "sf": sf,
        "vertices": g.n,
        "edges": g.m,
        "hits_iterations": h.iterations,
        "hits_seconds": round(t_hits, 3),
        "hits_edges_per_sec": round(2 * h.iterations * g.m / t_hits, 0),
        "kcore_rounds": kc.iterations,
        "kcore_converged": kc.converged,
        "kcore_seconds": round(t_kcore, 3),
        "kcore_max_coreness": int(kc.coreness.max()) if g.n else 0,
        "headline_warm_iter_sec": head_env["warm_iter_sec"],
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
