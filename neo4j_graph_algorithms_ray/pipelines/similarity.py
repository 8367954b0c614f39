"""Similarity search over an embedding column (vec_id, embedding:list<float>).

- ``ann_topk``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix, per-block top-k candidates, driver
  merge of k·#blocks rows. Exact; the baseline the scale path must match.
- ``lsh_topk``: random-hyperplane LSH bucketed variant — the scale
  path: queries and vectors bucket by sign-pattern; only same-bucket
  (± probe distance) pairs score. Approximate; recall measured in tests
  against ``ann_topk``.
- ``cosine_neardup``: all-pairs cosine ≥ threshold via blocked matmul
  against the (broadcast) matrix — the embedding near-dup operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _to_matrix(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(df[vec_col].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def ann_topk(
    embeddings: "rd.Dataset",
    query_ids: list[int],
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> pd.DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, sim, rank).

    Deterministic ordering: sim desc, vec_id asc. ``sim`` is float64
    cosine of the float32 inputs.
    """
    qset = set(int(q) for q in query_ids)
    q_rows = embeddings.filter(
        lambda r: int(r[id_col]) in qset
    ).to_pandas()
    q_rows = q_rows.sort_values(id_col)
    qm = _normalize(_to_matrix(q_rows, vec_col))
    qids = q_rows[id_col].to_numpy(np.int64)
    q_ref = ray.put((qids, qm))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qmat = ray.get(q_ref)
        m = _normalize(_to_matrix(df, vec_col))
        vids = df[id_col].to_numpy(np.int64)
        sims = qmat @ m.T  # (q, block)
        out = []
        for qi in range(len(ids)):
            s = sims[qi]
            mask = np.ones(len(vids), dtype=bool)
            if not include_self:
                mask &= vids != ids[qi]
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vids[idx], -s[idx]))][:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": ids[qi],
                        "vec_id": vids[order],
                        "sim": s[order],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    cand = embeddings.map_batches(block_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top.astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})


def metric_topk(
    embeddings: "rd.Dataset",
    query_ids: list[int],
    k: int = 5,
    *,
    metric: str = "euclidean",  # euclidean | pearson | dot | cosine
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact top-k per query under the reference's other similarity
    metrics (``algo.similarity.euclidean/pearson`` — SURVEY §2.6):
    (query_id, vec_id, score, rank). Euclidean ranks ascending distance;
    the rest descending similarity; ties → vec_id asc. Same blocked
    per-batch kernel + driver k-merge as ``ann_topk``."""
    qset = set(int(q) for q in query_ids)
    q_rows = embeddings.filter(lambda r: int(r[id_col]) in qset).to_pandas()
    q_rows = q_rows.sort_values(id_col)
    qm = _to_matrix(q_rows, vec_col)
    qids = q_rows[id_col].to_numpy(np.int64)
    if metric == "pearson":
        qm = qm - qm.mean(axis=1, keepdims=True)
        qm = _normalize(qm)
    elif metric == "cosine":
        qm = _normalize(qm)
    q_ref = ray.put((qids, qm))
    ascending = metric == "euclidean"

    def block_topk(df: pd.DataFrame, _metric=metric) -> pd.DataFrame:
        ids, qmat = ray.get(q_ref)
        m = _to_matrix(df, vec_col)
        vids = df[id_col].to_numpy(np.int64)
        if _metric == "pearson":
            m2 = _normalize(m - m.mean(axis=1, keepdims=True))
            scores = qmat @ m2.T
        elif _metric == "cosine":
            scores = qmat @ _normalize(m).T
        elif _metric == "dot":
            scores = qmat @ m.T
        else:  # euclidean distance
            qn = (qmat**2).sum(axis=1, keepdims=True)
            mn = (m**2).sum(axis=1)
            scores = np.sqrt(np.maximum(qn + mn - 2.0 * (qmat @ m.T), 0.0))
        out = []
        for qi in range(len(ids)):
            s = scores[qi]
            mask = vids != ids[qi]
            idx = np.flatnonzero(mask)
            if not len(idx):
                continue
            key = s[idx] if ascending else -s[idx]
            order = idx[np.lexsort((vids[idx], key))][:k]
            out.append(
                pd.DataFrame(
                    {"query_id": ids[qi], "vec_id": vids[order], "score": s[order]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    cand = embeddings.map_batches(block_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, ascending, True]
    )
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top.astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})


def lsh_topk(
    embeddings: "rd.Dataset",
    query_ids: list[int],
    k: int = 5,
    *,
    planes: int = 12,
    probes: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Random-hyperplane LSH approximate top-k (scale path): score only
    vectors whose sign-bucket is within ``probes`` bit flips of the
    query bucket."""
    first = embeddings.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, planes))
    qset = set(int(q) for q in query_ids)
    q_rows = embeddings.filter(lambda r: int(r[id_col]) in qset).to_pandas()
    q_rows = q_rows.sort_values(id_col)
    qm = _normalize(_to_matrix(q_rows, vec_col))
    qids = q_rows[id_col].to_numpy(np.int64)
    qbuck = (qm @ H > 0) @ (1 << np.arange(planes))
    ref = ray.put((qids, qm, qbuck, H))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qmat, qb, Hm = ray.get(ref)
        m = _normalize(_to_matrix(df, vec_col))
        vids = df[id_col].to_numpy(np.int64)
        vb = (m @ Hm > 0) @ (1 << np.arange(Hm.shape[1]))
        out = []
        for qi in range(len(ids)):
            xor = np.bitwise_xor(vb.astype(np.int64), int(qb[qi]))
            popcnt = np.array([bin(x).count("1") for x in xor])
            mask = (popcnt <= probes) & (vids != ids[qi])
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            s = m[idx] @ qmat[qi]
            order = np.lexsort((vids[idx], -s))[:k]
            out.append(
                pd.DataFrame(
                    {"query_id": ids[qi], "vec_id": vids[idx][order], "sim": s[order]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    cand = embeddings.map_batches(block_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top.astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})


def cosine_neardup(
    embeddings: "rd.Dataset",
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """All pairs with cosine ≥ threshold (doc_a < doc_b): blocked matmul
    against the broadcast normalized matrix. O(n²/B) per block —
    exact baseline; LSH bucketing is the >10^6-vector path."""
    full = embeddings.to_pandas().sort_values(id_col)
    m = _normalize(_to_matrix(full, vec_col))
    vids = full[id_col].to_numpy(np.int64)
    ref = ray.put((vids, m))

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        avids, am = ray.get(ref)
        bm = _normalize(_to_matrix(df, vec_col))
        bvids = df[id_col].to_numpy(np.int64)
        sims = bm @ am.T
        bi, ai = np.nonzero((sims >= threshold) & (bvids[:, None] < avids[None, :]))
        return pd.DataFrame(
            {
                "doc_a": bvids[bi],
                "doc_b": avids[ai],
                "sim": sims[bi, ai],
            }
        )

    out = embeddings.map_batches(block_pairs, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
