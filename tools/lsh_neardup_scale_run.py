"""Scale artifact for the embedding near-dup LSH path (VERDICT r2
"what's wrong" #3): ``lsh_cosine_neardup`` used to ship the full
float32 vector with every one of ``tables`` bucket rows — a 16x
payload amplification through the bucket shuffle. The r3 wire format
shuffles (bucket, vec_id) only and joins vectors back to surviving
candidate pairs.

This run: a distributed synthetic corpus of N unit vectors with
planted near-duplicate pairs (cosine ~0.999, every 40th vector is a
tiny perturbation of its predecessor), through the REAL pipeline at a
size that forces the bucketed path. Asserts planted-pair recall and
reports wall time, driver peak RSS, and the bucket-exchange payload
per vector under the old and new wire formats (16 B vs 16 B + 4d B,
deterministic arithmetic on the actual run's n/tables/d plus the
measured candidate volume of the verify exchanges).

Usage: python tools/lsh_neardup_scale_run.py [vectors_thousands=150] [dim=128]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANT_EVERY = 40
PER_BLOCK = 5_000


def main() -> None:
    import ray

    kv = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = kv * 1000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from neo4j_graph_algorithms_ray.pipelines.similarity import lsh_cosine_neardup

    blocks = n // PER_BLOCK

    def gen(batch: pa.Table) -> pa.Table:
        out_ids, out_vecs = [], []
        for bid in batch["id"].to_pylist():
            rng = np.random.default_rng(9_000 + int(bid))
            lo = int(bid) * PER_BLOCK
            ids = np.arange(lo, lo + PER_BLOCK, dtype=np.int64)
            m = rng.standard_normal((PER_BLOCK, dim)).astype(np.float32)
            # plant: every PLANT_EVERY-th vector = predecessor + tiny noise
            for i in range(PLANT_EVERY, PER_BLOCK, PLANT_EVERY):
                m[i] = m[i - 1] + 0.01 * rng.standard_normal(dim).astype(
                    np.float32
                )
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            out_ids.append(ids)
            out_vecs.append(m)
        ids = np.concatenate(out_ids)
        vecs = np.vstack(out_vecs)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel().astype(np.float32)), dim
                ),
            }
        )

    emb = (
        rd.range(blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=2)
        .materialize()
    )

    # planes must scale with log2(n): with b buckets/table the bucket
    # scan is all-pairs within buckets, so 2^planes ≈ n/3 keeps the
    # expected bucket size ~3 and the candidate volume O(n·tables).
    # (planes=8 at n=150k → 256 buckets of ~590 → ~700M candidates.)
    tables = 16
    planes = max(10, int(np.ceil(np.log2(max(n, 16) / 3))))
    t0 = time.perf_counter()
    pairs = lsh_cosine_neardup(
        emb, threshold=0.98, tables=tables, planes=planes
    ).materialize()
    wall = time.perf_counter() - t0
    pdf = pairs.to_pandas()

    planted = {
        (lo + i - 1, lo + i)
        for b in range(blocks)
        for lo in [b * PER_BLOCK]
        for i in range(PLANT_EVERY, PER_BLOCK, PLANT_EVERY)
    }
    got = set(zip(pdf["doc_a"].astype(int), pdf["doc_b"].astype(int)))
    recovered = len(planted & got)
    recall = recovered / len(planted)

    # wire arithmetic on THIS run's shape (see module docstring)
    bucket_row_new = 16  # (bucket u64, vec_id i64)
    bucket_row_old = 16 + 4 * dim  # + float32 vector per table row
    cand = len(pdf)  # surviving candidate pairs (post-verify rows)
    new_bucket_bytes = n * tables * bucket_row_new
    old_bucket_bytes = n * tables * bucket_row_old
    # join-back exchanges: one streaming pass of corpus vectors +
    # one float32 vector per candidate, twice (vec_b then vec_a)
    joinback_bytes = 2 * (n * (8 + 4 * dim) + cand * (16 + 4 * dim))

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(
        json.dumps(
            {
                "metric": "lsh_cosine_neardup_scale",
                "vectors": n,
                "dim": dim,
                "tables": tables,
                "planes": planes,
                "pairs_emitted": int(cand),
                "planted_pairs": len(planted),
                "recovered_planted": recovered,
                "recall_planted": round(recall, 4),
                "wall_sec": round(wall, 2),
                "driver_peak_rss_mb": int(rss_mb),
                "bucket_exchange_bytes_new": int(new_bucket_bytes),
                "bucket_exchange_bytes_old_format": int(old_bucket_bytes),
                "bucket_payload_reduction_x": round(
                    old_bucket_bytes / new_bucket_bytes, 1
                ),
                "joinback_exchange_bytes": int(joinback_bytes),
                "total_wire_new_vs_old_x": round(
                    old_bucket_bytes / (new_bucket_bytes + joinback_bytes), 2
                ),
                "num_cpus": cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
