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
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..state.partitioning import shuffle_width, source_size_bytes


def _to_matrix(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack(df[vec_col].to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _select_rows(
    embeddings: "rd.Dataset", ids: list[int], id_col: str
) -> pd.DataFrame:
    """Vectorized id-set row selection (pyarrow ``is_in`` per batch —
    no per-row Python filter UDF)."""
    idset = pa.array(sorted({int(q) for q in ids}), type=pa.int64())

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=idset))

    return embeddings.map_batches(f, batch_format="pyarrow").to_pandas()


def _stream_matrix(
    embeddings: "rd.Dataset", id_col: str, vec_col: str, normalize: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Stream the (id, vector) matrix to the driver in batches
    (no full-table pandas materialization), sorted by id; rows
    L2-normalized unless ``normalize=False`` (euclidean callers need
    raw magnitudes). O(n·d) driver/object-store memory — the
    exact-baseline envelope; the >10^7-vector path is
    ``lsh_cosine_neardup``."""
    ids_chunks: list[np.ndarray] = []
    vec_chunks: list[np.ndarray] = []
    for b in embeddings.select_columns([id_col, vec_col]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        ids_chunks.append(b[id_col].to_numpy(np.int64))
        m = _to_matrix(b, vec_col)
        vec_chunks.append(_normalize(m) if normalize else m)
    if not ids_chunks:
        return np.empty(0, np.int64), np.empty((0, 0))
    vids = np.concatenate(ids_chunks)
    m = np.vstack(vec_chunks)
    order = np.argsort(vids)
    return vids[order], m[order]


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
    q_rows = _select_rows(embeddings, query_ids, id_col).sort_values(id_col)
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
    q_rows = _select_rows(embeddings, query_ids, id_col).sort_values(id_col)
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
    q_rows = _select_rows(embeddings, query_ids, id_col).sort_values(id_col)
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
        from ..stages.minhash import popcount64

        for qi in range(len(ids)):
            xor = np.bitwise_xor(vb.astype(np.int64), int(qb[qi]))
            popcnt = popcount64(xor.astype(np.uint64))
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


def _kmeans_assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    d2 = (
        (m * m).sum(1, keepdims=True)
        - 2.0 * (m @ c.T)
        + (c * c).sum(1)[None, :]
    )
    return np.argmin(d2, axis=1)  # first min == smallest centroid id


def train_kmeans(
    embeddings: "rd.Dataset",
    n_centroids: int = 16,
    train_iters: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd training of a small centroid codebook:
    per-block assignment + per-cluster sum/count partials; the driver
    folds only the k×d codebook per sweep. Deliberately deterministic
    and SQL-recomputable: init = the embeddings of the ``n_centroids``
    smallest ids, assignment = euclidean argmin with min-centroid
    tie-break, and every updated centroid is rounded to a 1e-6 grid so
    numpy and SQL summation-order differences cannot drift the
    iteration."""
    init = (
        embeddings.select_columns([id_col, vec_col])
        .sort(id_col)
        .limit(n_centroids)
        .to_pandas()
    )
    cent = np.round(_to_matrix(init, vec_col), 6)
    assign = _kmeans_assign

    for _ in range(train_iters):
        c_ref = ray.put(cent)

        def part(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            m = _to_matrix(df, vec_col)
            a = assign(m, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pd.DataFrame(
                {
                    "cl": np.arange(len(c), dtype=np.int64),
                    "cnt": cnt,
                    "s": list(sums),
                }
            )

        folded = embeddings.map_batches(part, batch_format="pandas").to_pandas()
        sums = np.zeros_like(cent)
        cnt = np.zeros(len(cent), dtype=np.int64)
        for cl, c_, s_ in zip(folded["cl"], folded["cnt"], folded["s"]):
            sums[cl] += np.asarray(s_)
            cnt[cl] += int(c_)
        nonempty = cnt > 0
        new_c = cent.copy()
        new_c[nonempty] = sums[nonempty] / cnt[nonempty, None]
        cent = np.round(new_c, 6)
    return cent


def kmeans_clusters(
    embeddings: "rd.Dataset",
    n_centroids: int = 16,
    train_iters: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "rd.Dataset":
    """Corpus embedding clustering — the diversity/coverage probe of
    curation pipelines (and the cell assignment IVF search builds on):
    ``(vec_id, cluster)`` per vector from the :func:`train_kmeans`
    codebook, assigned in one streamed ``map_batches`` against the
    broadcast centroids."""
    cent = train_kmeans(
        embeddings, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
    )
    c_ref = ray.put(cent)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        return pd.DataFrame(
            {
                "vec_id": df[id_col].to_numpy(np.int64),
                "cluster": _kmeans_assign(_to_matrix(df, vec_col), c).astype(
                    np.int64
                ),
            }
        )

    return embeddings.map_batches(f, batch_format="pandas")


def ivf_topk(
    embeddings: "rd.Dataset",
    query_ids: list[int],
    k: int = 5,
    *,
    n_centroids: int = 16,
    train_iters: int = 4,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k (coarse k-means quantizer — the
    inverted-file scale path next to ``lsh_topk``): a
    :func:`train_kmeans` codebook, then exact cosine scoring of each
    query against ONLY the vectors whose cell is among the query's
    ``nprobe`` nearest centroids. Deterministic and SQL-recomputable
    end-to-end (the oracle unrolls the same Lloyd sweeps)."""
    assign = _kmeans_assign
    cent = train_kmeans(
        embeddings, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
    )

    q_rows = _select_rows(embeddings, query_ids, id_col).sort_values(id_col)
    qm_raw = _to_matrix(q_rows, vec_col)
    qm = _normalize(qm_raw)
    qids = q_rows[id_col].to_numpy(np.int64)
    qd2 = (
        (qm_raw * qm_raw).sum(1, keepdims=True)
        - 2.0 * (qm_raw @ cent.T)
        + (cent * cent).sum(1)[None, :]
    )
    # nprobe nearest cells per query (tie → smaller centroid id: stable
    # argsort of (distance, id) pairs)
    probed = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((qids, qm, probed, cent))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids, qmat, prb, c = ray.get(ref)
        m_raw = _to_matrix(df, vec_col)
        m = _normalize(m_raw)
        vids = df[id_col].to_numpy(np.int64)
        a = assign(m_raw, c)
        out = []
        for qi in range(len(ids)):
            mask = np.isin(a, prb[qi]) & (vids != ids[qi])
            idx = np.flatnonzero(mask)
            if not len(idx):
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
    exact baseline; ``lsh_cosine_neardup`` is the >10^6-vector path.
    The broadcast matrix is stream-built (batched iter_batches, no
    full-table pandas materialization) and shipped via ray.put once."""
    vids, m = _stream_matrix(embeddings, id_col, vec_col)
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


def metric_pairs(
    embeddings: "rd.Dataset",
    cutoff: float,
    *,
    metric: str = "cosine",  # cosine | pearson | euclidean
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 4,
) -> "rd.Dataset":
    """Cutoff pair STREAM under any §2.6 metric — the reference
    ``algo.similarity.cosine/pearson/euclidean.stream`` surface
    (similarityCutoff semantics: cosine/pearson keep score ≥ cutoff,
    euclidean keeps distance ≤ cutoff; one row per unordered pair,
    vec_id_a < vec_id_b). The cutoff compares the ROUNDED score
    (``round_decimals``, half-away) so boundary pairs bucket
    identically to a SQL oracle using the same ROUND.

    Same blocked-broadcast kernel as :func:`cosine_neardup`
    (stream-built matrix shipped once via ray.put, O(n²/B) matmul per
    block) — exact; for cosine at ≥10⁶ vectors route through
    :func:`lsh_cosine_neardup` instead. Returns a Dataset
    ``(vec_id_a, vec_id_b, score)``.
    """
    # euclidean needs raw magnitudes; cosine/pearson are
    # scale-invariant (centering commutes with row scaling), so the
    # pre-normalized stream is fine for them
    vids_m = _stream_matrix(
        embeddings, id_col, vec_col, normalize=metric != "euclidean"
    )
    scale = 10.0**round_decimals

    def prep(m: np.ndarray) -> np.ndarray:
        if metric == "pearson":
            return _normalize(m - m.mean(axis=1, keepdims=True))
        if metric == "cosine":
            return _normalize(m)
        return m  # euclidean: raw

    ref = ray.put((vids_m[0], prep(vids_m[1])))

    def block_pairs(df: pd.DataFrame) -> pd.DataFrame:
        avids, am = ray.get(ref)
        bm = prep(_to_matrix(df, vec_col))
        bvids = df[id_col].to_numpy(np.int64)
        if metric == "euclidean":
            bn = (bm**2).sum(axis=1, keepdims=True)
            an = (am**2).sum(axis=1)
            scores = np.sqrt(np.maximum(bn + an - 2.0 * (bm @ am.T), 0.0))
        else:
            scores = bm @ am.T
        scores = np.floor(scores * scale + 0.5) / scale
        hit = scores <= cutoff if metric == "euclidean" else scores >= cutoff
        bi, ai = np.nonzero(hit & (bvids[:, None] < avids[None, :]))
        return pd.DataFrame(
            {
                "vec_id_a": bvids[bi],
                "vec_id_b": avids[ai],
                "score": scores[bi, ai],
            }
        )

    return embeddings.map_batches(block_pairs, batch_format="pandas")


def lsh_cosine_neardup(
    embeddings: "rd.Dataset",
    threshold: float = 0.95,
    *,
    tables: int = 16,
    planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> "rd.Dataset":
    """LSH-bucketed cosine near-dup — the scale path for
    ``cosine_neardup``: ``tables`` independent random-hyperplane tables
    of ``planes`` bits bucket each vector; only same-bucket pairs score
    (exact cosine verify), so no O(n²) sweep and no full-matrix
    broadcast. A pair colliding in ≥1 table survives; recall vs the
    exact kernel is 1-(1-p^planes)^tables with p = 1 - θ/π (measured in
    tests/test_similarity_windows.py). Buckets larger than
    ``max_bucket`` are skipped (degenerate-hash blowup guard — mirrors
    the corpus heavy-key cap). Returns a Dataset (doc_a, doc_b, sim),
    exact-verified, deduped across tables."""
    first = embeddings.take(1)
    if not first:
        return rd.from_pandas(
            pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        )
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((tables, dim, planes))
    h_ref = ray.put(H)
    weights = (1 << np.arange(planes)).astype(np.int64)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        Hm = ray.get(h_ref)
        m = _normalize(_to_matrix(df, vec_col))
        vids = df[id_col].to_numpy(np.int64)
        frames = []
        for t in range(Hm.shape[0]):
            bits = (m @ Hm[t] > 0) @ weights
            frames.append(
                pd.DataFrame(
                    {
                        "bucket": (np.int64(t) << np.int64(32)) | bits,
                        "vec_id": vids,
                        "vec": [v.astype(np.float32).tobytes() for v in m],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(df: pd.DataFrame, _thr=threshold, _cap=max_bucket) -> pd.DataFrame:
        out_a, out_b, out_s = [], [], []
        for _, grp in df.groupby("bucket", sort=False):
            k = len(grp)
            if k < 2 or k > _cap:
                continue
            vids = grp["vec_id"].to_numpy(np.int64)
            m = np.frombuffer(b"".join(grp["vec"]), dtype=np.float32).reshape(k, -1)
            m64 = m.astype(np.float64)
            sims = m64 @ m64.T
            ai, bi = np.nonzero(
                np.triu(sims >= _thr, 1) & (vids[:, None] != vids[None, :])
            )
            lo = np.minimum(vids[ai], vids[bi])
            hi = np.maximum(vids[ai], vids[bi])
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sims[ai, bi])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"),
                 "doc_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # same pair found by several tables — keep one (max sim; sims are
        # equal up to fp noise since the verify is exact)
        return df.groupby(["doc_a", "doc_b"], as_index=False, sort=False)["sim"].max()

    return (
        embeddings.map_batches(sketch, batch_format="pandas")
        .repartition(shuffle_width(source_size_bytes(embeddings)), keys=["bucket"])
        .map_batches(bucket_pairs, batch_format="pandas", batch_size=None)
        .repartition(shuffle_width(source_size_bytes(embeddings)), keys=["doc_a"])
        .map_batches(dedup_pairs, batch_format="pandas", batch_size=None)
    )
