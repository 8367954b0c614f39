"""SemDeDup scale artifact: 1M vectors (dim 64) with 500k planted
leader/copy near-dup pairs, run against a DELIBERATELY undersized
8-cell codebook — every cell (~125k rows) is far above ``max_cell``,
so the whole corpus flows through the skew path: the vid-ordered tile
chain whose per-block memory is O(max_cell²) regardless of cell size
(pipelines/similarity.py semantic_dedup). What this pins:

  - bounded per-block work on a skewed codebook: the largest sims
    tile is max_cell x 2·max_cell doubles (reported in MB), never
    cell² (a 125k cell would be 125 GB);
  - correctness under chaining: every planted copy sits at witness
    distance 1 (adjacent vid), so every copy assigned to its
    leader's cell MUST be dropped and every leader kept — exactly.
    Copies whose 1e-6 perturbation crosses a Voronoi boundary into a
    different cell are missed by the CELL ASSIGNMENT (SemDeDup's own
    documented recall tradeoff, ~1 per 500k here) and are reported
    separately — the chain itself must be lossless;
  - what the auto-sizing default would have chosen at this n
    (n // 1000 = 1000 cells) is recorded alongside.

Usage: python tools/semdedup_scale_run.py [out_json]
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
    import pyarrow as pa
    import ray
    import psutil  # ray's vendored copy — importable only after ray

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

    from neo4j_graph_algorithms_ray.pipelines.similarity import (
        _float_lists,
        semantic_dedup,
    )

    n_pairs, dim, max_cell = 500_000, 64, 2048
    n = 2 * n_pairs
    rng = np.random.default_rng(23)
    t0 = time.perf_counter()
    leaders = rng.standard_normal((n_pairs, dim)).astype(np.float32)
    m = np.empty((n, dim), dtype=np.float32)
    m[0::2] = leaders
    m[1::2] = leaders + 1e-6 * rng.standard_normal(
        (n_pairs, dim)
    ).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": _float_lists(m, np.float32, dim),
            }
        )
    ).materialize()
    t_gen = time.perf_counter() - t0

    rss_before = round(psutil.Process().memory_info().rss / 2**20, 1)
    t0 = time.perf_counter()
    out = (
        semantic_dedup(
            emb, threshold=0.95, n_centroids=8, train_iters=2,
            max_cell=max_cell,
        )
        .to_pandas()
    )
    t_dedup = time.perf_counter() - t0
    rss_after = round(psutil.Process().memory_info().rss / 2**20, 1)

    out = out.sort_values("vec_id")
    kept = out["kept"].to_numpy()
    cl = out["cluster"].to_numpy()
    same_cell = cl[0::2] == cl[1::2]
    cells = out.groupby("cluster").size()
    res = {
        "artifact": "semdedup_scale_skewed",
        "vectors": int(n),
        "dim": dim,
        "planted_pairs": n_pairs,
        "n_centroids_forced": 8,
        "n_centroids_auto_would_be": int(min(8192, max(16, n // 1000))),
        "max_cell": max_cell,
        "largest_cell_rows": int(cells.max()),
        "largest_tile_sims_mb": round(max_cell * 2 * max_cell * 8 / 2**20, 1),
        "uncapped_largest_cell_sims_gb_avoided": round(
            int(cells.max()) ** 2 * 8 / 2**30, 1
        ),
        "gen_seconds": round(t_gen, 3),
        "dedup_seconds": round(t_dedup, 3),
        "leaders_kept": int(kept[0::2].sum()),
        "copies_dropped": int((~kept[1::2]).sum()),
        "same_cell_pairs": int(same_cell.sum()),
        "cell_boundary_misses": int(kept[1::2][~same_cell].sum()),
        "chain_lossless": bool(
            kept[0::2].all() and (~kept[1::2][same_cell]).all()
        ),
        "driver_rss_mb_before": rss_before,
        "driver_rss_mb_after": rss_after,
        "cpu_calibration_sec": c0,
        "cpu_calibration_end_sec": calib(),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    line = json.dumps(res)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
