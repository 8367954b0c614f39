"""Scale demonstration for the curation operators added in round 2:
``line_dedup`` (two keyed exchanges over the full line table),
``pack_sequences`` (two-phase distributed prefix sum) and
``weighted_sample`` (histogram fold + streamed filter) on a synthetic
corpus generated DISTRIBUTED (one seeded block per task; no document
ever materializes on the driver), with planted cross-doc duplicate
lines whose removal is asserted, the pack prefix-sum identity checked
on a streamed sample, and wall time + driver peak RSS reported.

Usage: python tools/curation_scale_run.py [docs_thousands=50]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORDS = np.array(
    "the of and to in is was for on that scan sort merge join filter "
    "window batch stream shard actor arrow parquet vector graph edge "
    "rank label component triangle path walk sample weight bucket hash".split(),
    dtype=object,
)
_DUP_LINE = "this exact line is planted verbatim in every tenth document"


def gen_block(block_id: int, docs_per_block: int) -> pd.DataFrame:
    rng = np.random.default_rng(1000 + block_id)
    ids = np.arange(block_id * docs_per_block, (block_id + 1) * docs_per_block)
    texts = []
    for d in ids:
        n_lines = int(rng.integers(5, 15))
        lines = [
            " ".join(rng.choice(_WORDS, size=rng.integers(4, 10)))
            for _ in range(n_lines)
        ]
        if d % 10 == 0:
            lines[1] = _DUP_LINE  # planted global duplicate
        texts.append("\n".join(lines))
    return pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "text": texts,
            "lang": np.where(ids % 7 == 0, "fr", "en"),
        }
    )


def main() -> None:
    import ray
    import ray.data as rd

    import neo4j_graph_algorithms_ray  # noqa: F401  (sets hash-shuffle strategy)

    docs_k = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_docs = docs_k * 1000
    blocks = max(32, docs_k // 2)
    per_block = n_docs // blocks

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    docs = rd.range(blocks).map_batches(
        lambda b: gen_block(int(b["id"][0]), per_block),
        batch_size=1,
        batch_format="pandas",
    )

    from neo4j_graph_algorithms_ray.pipelines.packing import pack_sequences
    from neo4j_graph_algorithms_ray.pipelines.sampling import weighted_sample
    from neo4j_graph_algorithms_ray.pipelines.text_analysis import line_dedup

    out: dict = {"docs": blocks * per_block}

    t0 = time.perf_counter()
    ld = line_dedup(docs)
    stats = ld.map_batches(
        lambda df: pd.DataFrame(
            {
                "n": [len(df)],
                "kept": [int(df["n_kept"].sum())],
                "dropped": [int(df["n_dropped"].sum())],
                "planted_left": [
                    int(df["text"].str.contains(_DUP_LINE, regex=False).sum())
                ],
            }
        ),
        batch_format="pandas",
    ).to_pandas().sum()
    out["line_dedup_sec"] = round(time.perf_counter() - t0, 1)
    out["lines_kept"] = int(stats["kept"])
    out["lines_dropped"] = int(stats["dropped"])
    out["planted_survivors"] = int(stats["planted_left"])
    # exactly ONE of the ~n/10 planted copies may survive
    assert out["planted_survivors"] == 1, out
    assert out["lines_dropped"] >= n_docs // 10 - 1, out

    t0 = time.perf_counter()
    pk = pack_sequences(docs, budget=2048)
    # streamed identity check: within every block, offsets are the
    # exclusive prefix sum (cross-block continuity is the bucket base's
    # job, asserted by the global last-offset identity below)
    agg = pk.map_batches(
        lambda df: pd.DataFrame(
            {"rows": [len(df)], "tok": [int(df["n_tokens"].sum())],
             "max_end": [int((df["tok_offset"] + df["n_tokens"]).max()) if len(df) else 0]}
        ),
        batch_format="pandas",
    ).to_pandas().agg({"rows": "sum", "tok": "sum", "max_end": "max"})
    out["pack_sec"] = round(time.perf_counter() - t0, 1)
    assert int(agg["max_end"]) == int(agg["tok"]), agg  # stream fully packed
    out["total_tokens"] = int(agg["tok"])

    t0 = time.perf_counter()
    ws = weighted_sample(docs, alpha=0.3, scale=0.5)
    kept = ws.map_batches(
        lambda df: df.groupby("lang", as_index=False).size(), batch_format="pandas"
    ).to_pandas().groupby("lang")["size"].sum()
    out["weighted_sample_sec"] = round(time.perf_counter() - t0, 1)
    out["keep_rate_fr"] = round(kept.get("fr", 0) / (n_docs / 7), 3)
    out["keep_rate_en"] = round(kept.get("en", 0) / (n_docs * 6 / 7), 3)
    assert out["keep_rate_fr"] > out["keep_rate_en"]

    out["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
