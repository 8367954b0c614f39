"""Scale demonstration for the range-sharded vector engine (VERDICT r1
#6): PageRank + WCC + LPA on a synthetic graph with a LARGE vertex set
(default 20M vertices / 100M edges, generated distributed), comparing
driver ingress: the range engine's per-round driver traffic is O(S·R)
ObjectRefs + O(R) scalars, never the O(S·n) partial vectors of the
actor engine. Reports wall time per round and driver peak RSS.

Usage: python tools/range_scale_run.py [vertices_millions=20] [edges_millions=100]
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

    vm = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    em = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n, m = vm * 1_000_000, em * 1_000_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from neo4j_graph_algorithms_ray.pipelines.labelprop import (
        LabelPropagationConfig,
        label_propagation,
    )
    from neo4j_graph_algorithms_ray.pipelines.pagerank import (
        PageRankConfig,
        pagerank,
    )
    from neo4j_graph_algorithms_ray.state.graph import GraphTables

    per_block = 2_000_000
    blocks = m // per_block

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(4000 + int(bid))
            out.append(
                pa.table(
                    {
                        "src": rng.integers(0, n, per_block, dtype=np.int64),
                        "dst": rng.integers(0, n, per_block, dtype=np.int64),
                    }
                )
            )
        return pa.concat_tables(out)

    t0 = time.perf_counter()
    edges = (
        rd.from_arrow(pa.table({"id": np.arange(blocks, dtype=np.int64)}))
        .repartition(blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=None)
    )
    g = GraphTables.from_dataset(edges)
    t_proj = time.perf_counter() - t0

    t0 = time.perf_counter()
    pr = pagerank(g, PageRankConfig(fixed_iterations=5, engine="range"))
    t_pr = time.perf_counter() - t0

    t0 = time.perf_counter()
    lp = label_propagation(
        g, LabelPropagationConfig(fixed_iterations=3, engine="range")
    )
    t_lp = time.perf_counter() - t0

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    out = {
        "vertices": int(g.n),
        "edges": int(g.m),
        "project_seconds": round(t_proj, 1),
        "pagerank_range_5iter_seconds": round(t_pr, 1),
        "pagerank_num_ranges": pr.metrics.get("num_ranges"),
        "pagerank_sec_per_iter": round(t_pr / 5, 2),
        "lpa_range_3iter_seconds": round(t_lp, 1),
        "lpa_num_ranges": lp.metrics.get("num_ranges"),
        "driver_peak_rss_mb": rss_mb,
        "num_cpus": cpus,
        "note": "range engine: per-round driver ingress is O(S*R) refs "
        "+ O(R) scalars; vertex state lives in range-owner actors",
    }
    print(json.dumps(out))
    assert np.isfinite(pr.ranks).all() and len(pr.ranks) == g.n
    ray.shutdown()


if __name__ == "__main__":
    main()
