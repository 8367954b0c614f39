"""Throughput artifact for the round-3 vectorized sketch stages:
``stages.minhash.simhash64`` (batch-unique word hashing + per-bit
bincount folds, replacing a per-doc/per-word Python loop) and
``stages.text.fingerprint64`` (sliding-window extraction + batch-unique
window hashing + segmented min-reduceat, replacing ~257 sha256 calls
per document in a Python loop).

Measures end-to-end docs/sec through the REAL Ray pipelines
(simhash_neardup sketch stage and doc fingerprints map_batches) on a
distributed synthetic corpus, and the raw single-process stage
throughput old-vs-new (the old scalar kernels are reproduced inline
for the comparison — byte-identical outputs asserted on a sample).

Usage: python tools/sketch_throughput_run.py [docs_thousands=100]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 65k-token synthetic vocabulary: a tiny vocab overlaps heavily across
# docs in a batch, overstating the batch-unique hashing win; a large
# vocab keeps per-batch unique-word counts realistic so the old-vs-new
# ratio is honest.
_WORDS = np.array([f"w{i:04x}" for i in range(65536)], dtype=object)


def gen_block(block_id: int, docs_per_block: int) -> pd.DataFrame:
    rng = np.random.default_rng(4_000 + block_id)
    lo = block_id * docs_per_block
    ids = np.arange(lo, lo + docs_per_block, dtype=np.int64)
    texts = [" ".join(rng.choice(_WORDS, size=rng.integers(40, 120))) for _ in ids]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def old_simhash(texts: pd.Series) -> np.ndarray:
    """Round-2 scalar definition (per-doc per-word loop)."""

    def sh(t: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(t.split()):
            h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:8], "big")
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = np.uint64(0)
        for i in np.flatnonzero(acc > 0):
            v |= np.uint64(1) << np.uint64(i)
        return int(v >> np.uint64(1))

    return texts.map(sh).to_numpy(np.int64)


def old_fingerprint(texts: pd.Series, ngram: int = 8) -> np.ndarray:
    """Round-2 scalar definition (~257 sha256 calls/doc)."""

    def fp(t: str) -> int:
        b = t.encode()
        if len(b) < ngram:
            return int.from_bytes(hashlib.sha256(b).digest()[:8], "big") >> 1
        best = None
        for i in range(0, len(b) - ngram + 1, max(1, (len(b) - ngram) // 256 or 1)):
            h = int.from_bytes(hashlib.sha256(b[i : i + ngram]).digest()[:8], "big")
            if best is None or h < best:
                best = h
        return best >> 1

    return texts.map(fp).to_numpy(np.int64)


def main() -> None:
    import ray
    import ray.data as rd

    from neo4j_graph_algorithms_ray.stages.minhash import simhash64
    from neo4j_graph_algorithms_ray.stages.text import fingerprint64

    docs_k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    dpb = 5000
    n_blocks = docs_k * 1000 // dpb
    n_docs = n_blocks * dpb

    # ---- single-process stage throughput, old vs new, in TWO regimes:
    # "high_entropy" (65k random-word vocab — windows/words barely
    # repeat, so both paths are sha256-bound and the fair claim is
    # non-regression via the vectorized hash kernel) and "boilerplate"
    # (template-heavy text — windows repeat massively, the batch-level
    # dedup collapses the sha volume and the speedup is large). Best of
    # 3 per cell: this VM's throttling flaps 5-7x between identical
    # runs, and best-of is the least-noisy point estimate.
    def bench_regime(texts: pd.Series) -> dict:
        def best3(fn, *a):
            times, out = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*a)
                times.append(time.perf_counter() - t0)
            return min(times), out

        sh_new_t, new_sh = best3(simhash64, texts)
        sh_old_t, old_sh = best3(old_simhash, texts)
        assert (new_sh == old_sh).all(), "simhash64 parity violated"
        fp_new_t, new_fp = best3(fingerprint64, texts)
        fp_old_t, old_fp_v = best3(old_fingerprint, texts)
        assert (new_fp == old_fp_v).all(), "fingerprint64 parity violated"
        return {
            "sample_docs": len(texts),
            "simhash_new_sec": round(sh_new_t, 3),
            "simhash_old_sec": round(sh_old_t, 3),
            "simhash_speedup": round(sh_old_t / max(sh_new_t, 1e-9), 1),
            "fingerprint_new_sec": round(fp_new_t, 3),
            "fingerprint_old_sec": round(fp_old_t, 3),
            "fingerprint_speedup": round(fp_old_t / max(fp_new_t, 1e-9), 1),
        }

    sample = pd.concat([gen_block(i, dpb) for i in range(4)], ignore_index=True)
    rng = np.random.default_rng(99)
    tmpl = [
        " ".join(rng.choice(_WORDS[:2000], size=12)) for _ in range(400)
    ]  # 400 reusable boilerplate lines
    boiler = pd.Series(
        [
            " ".join(rng.choice(np.array(tmpl, dtype=object), size=8))
            for _ in range(len(sample))
        ]
    )
    stage = {
        "high_entropy": bench_regime(sample["text"]),
        "boilerplate": bench_regime(boiler),
    }

    # ---- end-to-end Ray pipelines on the full corpus
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    rd.DataContext.get_current().enable_progress_bars = False
    from neo4j_graph_algorithms_ray.pipelines.dedup import simhash_neardup
    from neo4j_graph_algorithms_ray.stages.text import fingerprint64 as _fp

    docs = rd.range(n_blocks).map_batches(
        lambda df: pd.concat(
            [gen_block(int(b), dpb) for b in df["id"]], ignore_index=True
        ),
        batch_format="pandas",
        batch_size=4,
    ).materialize()

    t0 = time.perf_counter()
    res = simhash_neardup(docs)
    n_groups = len(res.groups)
    sim_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_fp = (
        docs.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"], "fp": _fp(df["text"])}
            ),
            batch_format="pandas",
        ).count()
    )
    fp_wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "sketch_stage_throughput",
                "docs": n_docs,
                "stage_bench": stage,
                "simhash_neardup_wall_sec": round(sim_wall, 3),
                "simhash_docs_per_sec": round(n_docs / sim_wall),
                "neardup_groups": n_groups,
                "fingerprint_wall_sec": round(fp_wall, 3),
                "fingerprint_docs_per_sec": round(n_docs / fp_wall),
                "rows": n_fp,
                "num_cpus": cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
