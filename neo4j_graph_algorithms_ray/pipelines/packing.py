"""Sequence packing for training-data assembly: lay the corpus out as
one token stream (docs concatenated in ``doc_id`` order) chopped into
fixed-size training bins — the concat-and-chunk packing every LLM
pretraining pipeline runs after cleaning/dedup.

The global token offset of each doc is an exact distributed prefix
sum, done in two phases so nothing large ever sits on the driver:

  1. one streamed pass folds per-batch PARTIAL token sums into a
     bucket histogram (bucket = ``doc_id >> bucket_bits``) — the
     driver holds one int64 per bucket, never per doc;
  2. an exclusive scan over the (small) histogram is broadcast via
     ``ray.put``; a hash repartition on the bucket key co-locates each
     bucket so the intra-bucket cumsum is batch-local.

The shuffle carries only ``(doc_id, n_tokens, bucket)`` — 24 bytes a
doc regardless of text size. The same layout is SQL:
``SUM(n_tokens) OVER (ORDER BY doc_id ROWS ... 1 PRECEDING)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..stages.text import token_count
from ..state.partitioning import keyed_repartition, shuffle_width, source_size_bytes


def pack_sequences(
    docs: "rd.Dataset",
    budget: int = 256,
    bucket_bits: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Per doc: ``(doc_id, n_tokens, tok_offset, bin_id, bin_pos)``
    where ``tok_offset`` is the exclusive prefix sum of whitespace
    token counts in ``doc_id`` order, ``bin_id = tok_offset // budget``
    (the training bin the doc STARTS in; long docs spill into later
    bins, exactly like chunked pretraining batches) and ``bin_pos`` its
    offset inside that bin."""

    def count(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": token_count(df[text_col]),
                "bucket": ids >> bucket_bits,
            }
        )

    tok = docs.map_batches(count, batch_format="pandas")

    # phase 1: bucket histogram (driver holds one scalar per bucket)
    hist: dict[int, int] = {}
    for b in tok.map_batches(
        lambda df: df.groupby("bucket", as_index=False)["n_tokens"].sum(),
        batch_format="pandas",
    ).iter_batches(batch_format="pandas"):
        for k, v in zip(b["bucket"].to_numpy(), b["n_tokens"].to_numpy()):
            hist[int(k)] = hist.get(int(k), 0) + int(v)
    buckets = np.array(sorted(hist), dtype=np.int64)
    sums = np.array([hist[int(k)] for k in buckets], dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(sums)[:-1]])
    base_ref = ray.put((buckets, base))

    # phase 2: bucket-local cumsum on the co-located pair table —
    # zero-copy Arrow in, numpy lexsort + segmented rebase, Arrow out
    # (no pandas conversion on this pure-integer fold)
    def offsets(t: "pa.Table", _b=base_ref) -> "pa.Table":
        import pyarrow as pa

        if not t.num_rows:
            z = np.empty(0, np.int64)
            return pa.table(
                {c: z for c in ("doc_id", "n_tokens", "tok_offset", "bin_id", "bin_pos")}
            )
        buckets, base = ray.get(_b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_all = t["n_tokens"].to_numpy(zero_copy_only=False)
        bk_all = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk_all))
        ids, n, bk = ids[order], n_all[order], bk_all[order]
        cum = np.cumsum(n) - n  # exclusive within the frame
        # rebase each bucket's run: subtract the run's own start, add
        # the global bucket base
        starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
        run_lens = np.diff(np.concatenate([starts, [len(bk)]]))
        off = (
            cum
            - np.repeat(cum[starts], run_lens)
            + np.repeat(base[np.searchsorted(buckets, bk[starts])], run_lens)
        )
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": n,
                "tok_offset": off,
                "bin_id": off // budget,
                "bin_pos": off % budget,
            }
        )

    # the shuffled token table is 24 B/doc — an input-bytes width is a
    # generous upper bound, and small corpora fold in one block
    return keyed_repartition(
        tok, shuffle_width(source_size_bytes(docs)), ["bucket"]
    ).map_batches(offsets, batch_format="pyarrow", batch_size=None)
