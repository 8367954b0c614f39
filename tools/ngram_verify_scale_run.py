"""Throughput artifact for the vectorized ngram_jaccard_pairs verify
stage (round-4): N docs, >=100k candidate pairs, wall + pairs/sec.

Usage: python tools/ngram_verify_scale_run.py [n_docs] [n_pairs] [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH/ngram_verify_scale.json"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    from neo4j_graph_algorithms_ray.pipelines.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(5)
    words = np.array("alpha beta gamma delta ray arrow data block shard vector "
                     "graph edge node hash batch actor fold scan merge sketch".split())
    texts = [" ".join(rng.choice(words, 60)) for _ in range(n_docs)]
    docs_df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    tmp = "/tmp/ngram_scale_docs.parquet"
    docs_df.to_parquet(tmp)
    docs = rd.read_parquet(tmp).materialize()

    a = rng.integers(0, n_docs, n_pairs)
    b = rng.integers(0, n_docs, n_pairs)
    m = a != b
    pairs = pd.DataFrame({
        "doc_a": np.minimum(a[m], b[m]).astype(np.int64),
        "doc_b": np.maximum(a[m], b[m]).astype(np.int64),
    }).drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)

    t0 = time.perf_counter()
    out = ngram_jaccard_pairs(docs, pairs)
    dt = time.perf_counter() - t0
    scored = int(out["jaccard"].notna().sum())
    rec = {
        "what": "ngram_jaccard_pairs batched-shingle verify (round-5)",
        "n_docs": n_docs,
        "n_candidate_pairs": int(len(pairs)),
        "n_scored": scored,
        "seconds": round(dt, 3),
        "pairs_per_sec": round(len(pairs) / dt, 1),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "mean_jaccard": float(np.nanmean(out["jaccard"].to_numpy())),
    }
    print(json.dumps(rec))
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
