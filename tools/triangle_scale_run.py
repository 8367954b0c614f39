"""Scale demonstration for the bucketed triangle path (VERDICT r1 #2):
run ``triangle_count_bucketed`` on a synthetic ≥10^8-edge graph that is
GENERATED DISTRIBUTED (no edge ever materializes on the driver) and
report wall time + driver peak RSS.

Usage: python tools/triangle_scale_run.py [edges_millions=100] [n=10_000_000]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    em = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    m = em * 1_000_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from neo4j_graph_algorithms_ray.pipelines.triangles import (
        triangle_count_bucketed,
    )
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    per_block = 2_000_000
    blocks = m // per_block

    def gen(batch) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(9000 + int(bid))
            si = rng.integers(0, n, per_block, dtype=np.int64)
            di = rng.integers(0, n, per_block, dtype=np.int64)
            out.append(pa.table({"si": si, "di": di}))
        return pa.concat_tables(out)

    edges = (
        rd.range(blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
        .materialize()
    )
    graph = GraphTables(
        vids_ref=ray.put(np.arange(n, dtype=np.int64)),
        n=n,
        edges=edges,
        m=m,
    )
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6  # GB
    t0 = time.perf_counter()
    res = triangle_count_bucketed(graph)
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "edges": m,
                "vertices": n,
                "triangles": res.triangle_count,
                "wall_sec": round(wall, 1),
                "driver_rss_before_gb": round(rss0, 2),
                "driver_rss_peak_gb": round(rss1, 2),
                "num_cpus": cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
