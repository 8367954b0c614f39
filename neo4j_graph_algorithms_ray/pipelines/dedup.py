"""Deduplication pipelines over a documents table (doc_id, text).

First-class training-data operators (task brief): exact (hash),
MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard verification,
embedding-cosine near-dup (see similarity.py). All follow the same
shape: vectorized sketch per batch → hash-repartition on the bucket
key so groups are block-complete → per-block candidate generation →
verification → connected components over dup pairs (min-label).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.minhash import (
    char_shingles_u64,
    hamming64,
    lsh_bands,
    minhash_signature,
    signature_jaccard,
    simhash64,
)
from ..stages.text import sha256_hex


def dedup_exact(
    docs: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "rd.Dataset":
    """(doc_id, dup_count): one row per distinct content, keeper = min id.

    sha256-bucketed: hash per batch, hash-repartition on the digest so
    each content group is complete in one block, fold per block.
    """

    def add_sha(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df[id_col], "sha": sha256_hex(df[text_col])}
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sha", sort=False)["doc_id"]
        out = g.agg(["min", "size"]).reset_index(drop=True)
        out.columns = ["doc_id", "dup_count"]
        return out.astype({"doc_id": "int64", "dup_count": "int64"})

    return (
        docs.map_batches(add_sha, batch_format="pandas")
        .repartition(8, keys=["sha"])
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


@dataclass
class NearDupResult:
    pairs: pd.DataFrame  # doc_a, doc_b, similarity estimate
    groups: pd.DataFrame  # doc_id, group_id (= min doc_id of component)


def _pairs_to_groups(pairs: pd.DataFrame, a="doc_a", b="doc_b") -> pd.DataFrame:
    """Connected components over dup pairs (driver union-find — the
    candidate-pair set is small by construction; the dataflow path for
    huge pair sets is pipelines.components.wcc)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs[a], pairs[b]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame(rows, columns=["doc_id", "group_id"]).astype("int64")


def minhash_lsh_neardup(
    docs: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> NearDupResult:
    """MinHash+LSH near-duplicate detection.

    Default 16 bands × 4 rows: the LSH s-curve midpoint is
    (1/bands)^(1/rows) ≈ 0.5, matched to the default ``threshold``.

    shingle → minhash per batch; explode to (band_id, band_hash, doc_id,
    signature); hash-repartition on band_hash; per-block bucket scan
    emits candidate pairs verified by signature-estimated Jaccard ≥
    threshold; min-label components give group ids.
    """

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        sigs = [
            minhash_signature(char_shingles_u64(t), num_perm) for t in df[text_col]
        ]
        rows = []
        for i, sig in zip(ids, sigs):
            bh = lsh_bands(sig, bands)
            for bidx in range(bands):
                rows.append((int(bidx), int(bh[bidx]) >> 1, int(i), sig.tobytes()))
        return pd.DataFrame(rows, columns=["band_id", "band_hash", "doc_id", "sig"])

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in df.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            sigs = [np.frombuffer(s, dtype=np.uint64) for s in grp["sig"]]
            order = np.argsort(ids)
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    x, y = order[ii], order[jj]
                    est = signature_jaccard(sigs[x], sigs[y])
                    if est >= threshold:
                        out.append((int(ids[x]), int(ids[y]), est))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "similarity"])

    cand = (
        docs.map_batches(sketch, batch_format="pandas")
        .repartition(8, keys=["band_hash"])
        .map_batches(bucket_pairs, batch_format="pandas", batch_size=None)
    )
    pairs = cand.to_pandas()
    if len(pairs):
        pairs = (
            pairs.groupby(["doc_a", "doc_b"], as_index=False)["similarity"].max()
        )
    groups = _pairs_to_groups(pairs)
    return NearDupResult(pairs=pairs, groups=groups)


def simhash_neardup(
    docs: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> NearDupResult:
    """SimHash near-dup: 4 16-bit bands (any ≤3-bit-different pair shares
    ≥1 exact band), bucket scan verifies true Hamming distance."""

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        sh = simhash64(df[text_col])
        rows = []
        for i, h in zip(ids, sh):
            for bidx in range(4):
                rows.append((bidx, int((h >> (16 * bidx)) & 0xFFFF), int(i), int(h)))
        return pd.DataFrame(rows, columns=["band_id", "band_hash", "doc_id", "simhash"])

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in df.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            hs = grp["simhash"].to_numpy(np.int64)
            o = np.argsort(ids)
            ids, hs = ids[o], hs[o]
            for ii in range(len(ids)):
                d = hamming64(hs[ii + 1 :], np.repeat(hs[ii], len(ids) - ii - 1))
                for jj in np.flatnonzero(d <= max_hamming):
                    out.append((int(ids[ii]), int(ids[ii + 1 + jj]), int(d[jj])))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    cand = (
        docs.map_batches(sketch, batch_format="pandas")
        .repartition(8, keys=["band_hash"])
        .map_batches(bucket_pairs, batch_format="pandas", batch_size=None)
    )
    pairs = cand.to_pandas()
    if len(pairs):
        pairs = pairs.drop_duplicates(["doc_a", "doc_b"])
        pairs["similarity"] = 1.0 - pairs.pop("hamming") / 64.0
    else:
        pairs["similarity"] = pd.Series([], dtype="float64")
    groups = _pairs_to_groups(pairs)
    return NearDupResult(pairs=pairs, groups=groups)


def ngram_jaccard_pairs(
    docs: "rd.Dataset",
    candidate_pairs: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> pd.DataFrame:
    """EXACT n-gram Jaccard for given candidate pairs (verification stage
    after a sketch prefilter): broadcast the candidate id set, collect
    only those shingle sets, score pairs."""
    wanted = set(candidate_pairs["doc_a"]) | set(candidate_pairs["doc_b"])
    w_ref = ray.put(wanted)

    def shingle_sets(df: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        sel = df[df[id_col].isin(w)]
        return pd.DataFrame(
            {
                "doc_id": sel[id_col].to_numpy(np.int64),
                "shingles": [
                    char_shingles_u64(t, k).tobytes() for t in sel[text_col]
                ],
            }
        )

    sets = docs.map_batches(shingle_sets, batch_format="pandas").to_pandas()
    lookup = {
        int(r.doc_id): np.frombuffer(r.shingles, dtype=np.uint64)
        for r in sets.itertuples()
    }
    sims = []
    for a, b in zip(candidate_pairs["doc_a"], candidate_pairs["doc_b"]):
        sa, sb = lookup[int(a)], lookup[int(b)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        sims.append(inter / union if union else 1.0)
    out = candidate_pairs.copy()
    out["jaccard"] = sims
    return out
