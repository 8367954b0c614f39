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

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..state.partitioning import (
    keyed_repartition,
    shuffle_width,
    source_size_bytes,
)


def _to_matrix(batch, vec_col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column. Arrow input is
    the hot path: one zero-copy flatten + reshape per chunk (no
    per-row object array); pandas falls back to np.stack for the
    small driver-side frames (query rows)."""
    if isinstance(batch, pa.Table):
        col = batch.column(vec_col)
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        mats: list[np.ndarray] = []
        for ch in chunks:
            if not len(ch):
                continue
            if isinstance(ch, pa.ExtensionArray):
                # Ray tensor extension column (ArrowTensorArray /
                # V2) — produced when an upstream stage emitted an
                # ndarray column; its to_numpy is already the (n, d)
                # zero-copy view.
                mats.append(np.asarray(ch.to_numpy(zero_copy_only=False)))
                continue
            flat = ch.flatten().to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(ch).to_numpy(zero_copy_only=False)
            d = int(lens[0])
            mats.append(flat.reshape(-1, d))
        if not mats:
            return np.empty((0, 0))
        m = mats[0] if len(mats) == 1 else np.vstack(mats)
        return m.astype(np.float64, copy=False)
    return np.stack(batch[vec_col].to_numpy()).astype(np.float64)


def _ids_i64(batch, col: str) -> np.ndarray:
    if isinstance(batch, pa.Table):
        return batch[col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return batch[col].to_numpy(np.int64)


def _float_lists(m: np.ndarray, dtype: type, dim: int) -> pa.Array:
    """(n, d) -> fixed_size_list<dtype>[d]: ONE ravel+cast, no per-row
    Python objects (the Arrow wire format of the LSH join-back
    payload)."""
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(m, dtype=dtype).ravel()), dim
    )


def _split_union_block(
    t: pa.Table, side_col: str, payload: str, extract=None
) -> tuple[pa.Table, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split a unioned keyed block into candidate rows (side >= 0) and
    vector rows (side == -1). Returns (cand_table, ckeys, cside,
    vkeys_sorted, vm_sorted) — the candidate sub-table comes from the
    SAME mask that produced ckeys/cside, so any payload a caller reads
    off it is row-aligned with them by construction; the vector side is
    sorted by key, ready for a searchsorted gather (the numpy
    hash-join). ``extract`` overrides the payload reader (default
    float-list ``_to_matrix``; dedup's minhash join-back passes a
    uint64 signature reader — float64 would corrupt 64-bit hashes)."""
    side = _ids_i64(t, side_col)
    keys = _ids_i64(t, "key")
    is_vec = side < 0
    vt = t.filter(pa.array(is_vec))
    ct = t.filter(pa.array(~is_vec))
    vkeys = keys[is_vec]
    vm = (extract or _to_matrix)(vt, payload)
    order = np.argsort(vkeys, kind="stable")
    return ct, keys[~is_vec], side[~is_vec], vkeys[order], vm[order]


def _gather_by_key(
    vkeys: np.ndarray, vm: np.ndarray, ckeys: np.ndarray
) -> np.ndarray:
    if not len(ckeys):
        return vm[:0]
    pos = np.searchsorted(vkeys, ckeys)
    # keys are partition-complete by construction (every key hashed
    # here); guard anyway so a malformed input fails loudly
    if pos.max(initial=-1) >= len(vkeys) or not np.array_equal(
        vkeys[pos], ckeys
    ):
        raise ValueError("candidate key missing its vector row")
    return vm[pos]


def _auto_tables(threshold: float, planes: int, target_miss: float = 0.01) -> int:
    """Hyperplane-LSH table count for ~``1 - target_miss`` recall AT the
    similarity threshold (pairs above it only do better). Per-plane
    collision probability p = 1 - arccos(threshold)/pi, so one table
    hits with p^planes and ``tables`` independent tables miss with
    (1 - p^planes)^tables; solve for tables. This keeps recall roughly
    CONSTANT as the auto-sized plane count grows with the corpus — a
    fixed table count silently decays threshold-adjacent recall from
    ~1.0 at planes=6 to ~0.8 at planes=22 (10M vectors). Clamped to
    [4, 64]: past 64 tables the bucket exchange cost outweighs the
    recall tail, and the clamp point is the documented recall floor."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    hit = p**planes
    if hit >= 1.0:
        return 4
    miss = max(1.0 - hit, 1e-12)
    return int(np.clip(np.ceil(np.log(target_miss) / np.log(miss)), 4, 64))


def _pair_dedup(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Collapse duplicate (a, b) rows (vectorized lexsort + run mask)."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.empty(len(a), dtype=bool)
    if len(a):
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[first], b[first]


def _rowwise_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot product. NOT ``np.einsum("ij,ij->i", ...)``: the
    default (non-``optimize``) einsum runs a naive sequential C loop
    that measures 60-120x slower than the vectorized multiply+pairwise
    ``sum`` on this hardware (10.9 s vs 0.14 s for 72k x 128 f64) —
    it dominated the whole LSH verify stage. Pairwise summation is
    also the more accurate reduction order."""
    return (a * b).sum(axis=1)


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
        batch_format="pyarrow", batch_size=8192
    ):
        ids_chunks.append(_ids_i64(b, id_col))
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

    def block_topk(df: "pa.Table") -> pd.DataFrame:
        ids, qmat = ray.get(q_ref)
        m = _normalize(_to_matrix(df, vec_col))
        vids = _ids_i64(df, id_col)
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

    cand = embeddings.map_batches(block_topk, batch_format="pyarrow").to_pandas()
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

    def block_topk(df: "pa.Table", _metric=metric) -> pd.DataFrame:
        ids, qmat = ray.get(q_ref)
        m = _to_matrix(df, vec_col)
        vids = _ids_i64(df, id_col)
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

    cand = embeddings.map_batches(block_topk, batch_format="pyarrow").to_pandas()
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

    def block_topk(df: "pa.Table") -> pd.DataFrame:
        ids, qmat, qb, Hm = ray.get(ref)
        m = _normalize(_to_matrix(df, vec_col))
        vids = _ids_i64(df, id_col)
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

    cand = embeddings.map_batches(block_topk, batch_format="pyarrow").to_pandas()
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


_KMEANS_LOCAL_BYTES = 64 * 1024 * 1024  # collected-matrix gate for local Lloyd


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
    proj = embeddings.select_columns([id_col, vec_col])
    assign = _kmeans_assign
    # gate on the size of the matrix that would actually be collected
    # (rows x dim x float64) — NOT source_size_bytes, whose leaf-input
    # estimate deliberately survives map_batches lineage and so can
    # under-count a row-expanding upstream transform
    n_total = proj.count()
    head = proj.take(1)
    dim = len(head[0][vec_col]) if head else 0
    if n_total * max(dim, 1) * 8 <= _KMEANS_LOCAL_BYTES:
        # single-task gate (house pattern, cf. exact metric_pairs /
        # hyperanf): below ~64 MB the per-round Dataset execution
        # overhead dominates the k×d arithmetic, so collect the matrix
        # once and run every Lloyd round locally. Identical init,
        # assignment and update rule; the 1e-6 centroid grid absorbs
        # summation-order differences exactly as it already does for
        # the SQL oracle's recomputation. The distributed path below
        # is unchanged and takes over above the gate.
        df = proj.sort(id_col).to_pandas()
        m = _to_matrix(df, vec_col)
        cent = np.round(m[:n_centroids], 6)
        for _ in range(train_iters):
            a = assign(m, cent)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=len(cent)).astype(np.int64)
            nonempty = cnt > 0
            new_c = cent.copy()
            new_c[nonempty] = sums[nonempty] / cnt[nonempty, None]
            cent = np.round(new_c, 6)
        return cent

    # distributed Lloyd: materialize the projected vectors ONCE so the
    # per-round sweep maps over resident blocks instead of re-running
    # the upstream read/derivation every iteration (PageRank's
    # load-once-iterate-many pattern)
    emb = proj.materialize()
    init = emb.sort(id_col).limit(n_centroids).to_pandas()
    cent = np.round(_to_matrix(init, vec_col), 6)

    for _ in range(train_iters):
        c_ref = ray.put(cent)

        def part(df: "pa.Table") -> pd.DataFrame:
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

        folded = emb.map_batches(part, batch_format="pyarrow").to_pandas()
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

    def f(df: "pa.Table") -> pd.DataFrame:
        c = ray.get(c_ref)
        return pd.DataFrame(
            {
                "vec_id": _ids_i64(df, id_col),
                "cluster": _kmeans_assign(_to_matrix(df, vec_col), c).astype(
                    np.int64
                ),
            }
        )

    return embeddings.map_batches(f, batch_format="pyarrow")


def semantic_dedup(
    embeddings: "rd.Dataset",
    threshold: float = 0.95,
    n_centroids: Optional[int] = None,
    train_iters: int = 4,
    *,
    max_cell: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "rd.Dataset":
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with
    the shared k-means codebook, then keep, per cluster, only vectors
    with no LOWER-id near-duplicate (cosine ≥ threshold) in the same
    cluster — the deterministic "leader" variant of the paper's
    within-cluster pruning. The cluster assignment bounds the
    quadratic; pairs that land in different cells are missed by
    construction, the documented SemDeDup recall tradeoff. One keyed
    exchange on the cluster id; the per-block work is a per-cluster
    blocked matmul (the loop is over clusters, not rows). Returns
    ``(vec_id, cluster, kept)``.

    Scale levers (the r4 verdict's #2, same family as
    ``lsh_cosine_neardup``'s auto-sized planes):

    - ``n_centroids=None`` (default) auto-sizes the codebook to
      ``clamp(n // 1000, 16, 8192)`` so cells average ~1000 vectors
      regardless of corpus size (16 at the small-fixture sizes, so
      the fixed SQL oracle is unchanged);
    - ``max_cell`` caps the per-cell scan: a cell larger than
      ``max_cell`` (a skewed codebook — the normal case on
      near-duplicate-heavy corpora) is processed as a CHAIN of
      vid-ordered tiles, each scanning itself plus the previous tile,
      so per-block memory is O(max_cell²) and compute O(cell ·
      max_cell · d) instead of O(cell²·d). Leader semantics survive
      chaining because keep-status needs only ONE lower-id witness;
      witnesses more than one tile back are missed — the same bounded
      -recall tradeoff as the cell assignment itself, pinned by
      ``test_similarity.py``'s chain tests."""
    if n_centroids is None:
        n_centroids = int(min(8192, max(16, embeddings.count() // 1000)))
    cent = train_kmeans(
        embeddings, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
    )
    c_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _to_matrix(t, vec_col)
        return pa.table(
            {
                "vec_id": _ids_i64(t, id_col),
                "cluster": _kmeans_assign(m, c).astype(np.int64),
                vec_col: t[vec_col],
            }
        )

    ex = keyed_repartition(
        embeddings.map_batches(assign, batch_format="pyarrow"),
        shuffle_width(source_size_bytes(embeddings)),
        ["cluster"],
    )

    def dedup_block(t: pa.Table, _thr=threshold, _cap=max_cell) -> pa.Table:
        empty = pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64()),
             "kept": pa.array([], pa.bool_())}
        )
        if not t.num_rows:
            return empty
        vid = _ids_i64(t, "vec_id")
        cl = _ids_i64(t, "cluster")
        # _to_matrix yields float64, so threshold comparisons match the
        # DOUBLE-precision SQL oracle exactly (ADVICE r4)
        m = _normalize(_to_matrix(t, vec_col))
        order = np.lexsort((vid, cl))
        vid, cl, m = vid[order], cl[order], m[order]
        starts = np.flatnonzero(np.concatenate(([True], cl[1:] != cl[:-1])))
        ends = np.append(starts[1:], len(cl))
        kept = np.ones(len(vid), dtype=bool)
        for s, e in zip(starts, ends):  # per CLUSTER, not per row
            if e - s < 2:
                continue
            if e - s <= _cap:
                sims = m[s:e] @ m[s:e].T
                dup = (np.triu(sims, 1) >= _thr).any(axis=0)
                kept[s:e] &= ~dup
                continue
            # skewed cell above the cap: vid-ordered tile chain — each
            # tile scans itself + the previous tile (docstring)
            tiles = list(range(s, e, _cap))
            for j, t0 in enumerate(tiles):
                t1 = min(t0 + _cap, e)
                p0 = tiles[j - 1] if j else t0
                sims = m[t0:t1] @ m[p0:t1].T
                lower = (
                    np.arange(p0, t1)[None, :] < np.arange(t0, t1)[:, None]
                )
                dup = ((sims >= _thr) & lower).any(axis=1)
                kept[t0:t1] &= ~dup
        return pa.table({"vec_id": vid, "cluster": cl, "kept": kept})

    return ex.map_batches(dedup_block, batch_format="pyarrow", batch_size=None)


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

    def block_topk(df: "pa.Table") -> pd.DataFrame:
        ids, qmat, prb, c = ray.get(ref)
        m_raw = _to_matrix(df, vec_col)
        m = _normalize(m_raw)
        vids = _ids_i64(df, id_col)
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

    cand = embeddings.map_batches(block_topk, batch_format="pyarrow").to_pandas()
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

    def block_pairs(df: "pa.Table") -> pd.DataFrame:
        avids, am = ray.get(ref)
        bm = _normalize(_to_matrix(df, vec_col))
        bvids = _ids_i64(df, id_col)
        sims = bm @ am.T
        bi, ai = np.nonzero((sims >= threshold) & (bvids[:, None] < avids[None, :]))
        return pd.DataFrame(
            {
                "doc_a": bvids[bi],
                "doc_b": avids[ai],
                "sim": sims[bi, ai],
            }
        )

    out = embeddings.map_batches(block_pairs, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# above this vector count the exact blocked-broadcast pair kernel is an
# O(n²) sweep no cluster should run — metric_pairs(engine="auto")
# switches to the LSH-bucketed candidate/verify path
_EXACT_PAIRS_MAX_VECS = 100_000


def metric_pairs(
    embeddings: "rd.Dataset",
    cutoff: float,
    *,
    metric: str = "cosine",  # cosine | pearson | euclidean
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 4,
    engine: str = "auto",  # auto | exact | bucketed
) -> "rd.Dataset":
    """Cutoff pair STREAM under any §2.6 metric — the reference
    ``algo.similarity.cosine/pearson/euclidean.stream`` surface
    (similarityCutoff semantics: cosine/pearson keep score ≥ cutoff,
    euclidean keeps distance ≤ cutoff; one row per unordered pair,
    vec_id_a < vec_id_b). The cutoff compares the ROUNDED score
    (``round_decimals``, half-away) so boundary pairs bucket
    identically to a SQL oracle using the same ROUND.

    Engines: ``exact`` is the blocked-broadcast kernel of
    :func:`cosine_neardup` (stream-built matrix shipped once via
    ray.put, O(n²/B) matmul per block); ``bucketed`` is
    :func:`lsh_metric_pairs` (hyperplane-sign LSH for cosine/pearson,
    p-stable for euclidean — no O(n²) sweep, no full-matrix broadcast;
    recall measured in tests). ``auto`` picks exact below
    ``_EXACT_PAIRS_MAX_VECS`` vectors. Returns a Dataset
    ``(vec_id_a, vec_id_b, score)``.
    """
    if engine == "auto":
        engine = (
            "exact" if embeddings.count() <= _EXACT_PAIRS_MAX_VECS else "bucketed"
        )
    if engine == "bucketed":
        return lsh_metric_pairs(
            embeddings, cutoff, metric=metric, id_col=id_col, vec_col=vec_col,
            round_decimals=round_decimals,
        )
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
    tables: int | None = None,
    planes: int | None = None,
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
    tests/test_round2.py). ``planes=None`` (the default) auto-sizes to
    ``max(6, ceil(log2(n/3)))`` from one ``count()`` so the expected
    bucket size stays ~3 at ANY corpus size — a fixed plane count is a
    scale footgun: the bucket scan is all-pairs within buckets, so 6
    planes (64 buckets/table) at 10^6 vectors means ~10^4-row buckets
    and an O(n²/64) candidate explosion. ``tables=None`` (the default)
    auto-sizes WITH the plane count via :func:`_auto_tables` so recall
    at the threshold stays ~0.99 as planes grow — more planes thin each
    table's hit rate, so the table count must rise to compensate
    (clamped at 64; beyond the clamp, recall at the exact threshold
    degrades and the clamp is the documented floor). Passing BOTH
    ``planes`` and ``tables`` explicitly skips the ``count()``
    entirely (exchange widths then fall back to the input-file size
    hint / CPU floor) — the escape hatch for derived datasets where an
    extra execution of the upstream plan matters. Buckets larger than
    ``max_bucket`` are skipped (degenerate-hash blowup guard — mirrors
    the corpus heavy-key cap). Returns a Dataset (doc_a, doc_b, sim),
    exact-verified, deduped across tables.

    Shuffle payload: the bucket exchange carries ONLY 16 B/row
    (bucket, vec_id) — NOT the embedding — so the ``tables``-way
    fan-out costs 16·16 B/vector instead of 16 vector payloads.
    Vectors are joined back to the surviving CANDIDATE pairs for the
    exact verify in two further keyed exchanges (attach vec_b on the
    doc_b key, then vec_a + score on the doc_a key), each moving one
    float32 vector per candidate plus one streaming pass of the corpus
    vectors.

    Every stage is zero-copy Arrow (``batch_format="pyarrow"``): the
    vector payload rides a ``fixed_size_list<float32>[d]`` column
    (null on candidate rows — the union side that carries no vector),
    id joins are numpy ``argsort``+``searchsorted`` gathers, and no
    stage builds per-row Python objects."""
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
    if planes is None or tables is None:
        n_total = embeddings.count()
        if planes is None:
            planes = min(30, max(6, int(np.ceil(np.log2(max(n_total, 16) / 3)))))
        if tables is None:
            tables = _auto_tables(threshold, planes)
        # widths sized from each EXCHANGE's estimated volume, not the
        # input table: the bucket fan-out is tables x n 16 B rows, and
        # the verify exchanges carry ~(n + expected_candidates) float32
        # vectors, with E[candidates] ~ n * bucket_mean * tables / 2,
        # bucket_mean = n / 2^planes. An input-size hint undersizes
        # both (serializing the verify) and the CPU-floor default
        # oversizes them at small n (aggregator spin-up). The bucket
        # exchange is additionally sized by its OUTPUT work — the
        # within-bucket pair scan is superlinear in partition size, so
        # a bytes-in hint alone would collapse candidate generation
        # into one task (~64 work-bytes per expected candidate).
        est_cand = int(
            n_total * max(n_total / float(1 << planes), 0.5) * tables / 2
        )
        width = shuffle_width(
            max(16 * n_total * tables, 64 * est_cand), min_width=1
        )
        verify_width = shuffle_width(
            (n_total + est_cand) * (16 + 4 * dim), min_width=1
        )
    else:
        # both sketch parameters given: never execute the upstream plan
        # just to size exchanges — fall back to the input-file size
        # hint (CPU floor when absent)
        sz = source_size_bytes(embeddings)
        width = shuffle_width(sz)
        verify_width = shuffle_width(sz)
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((tables, dim, planes))
    h_ref = ray.put(H)
    weights = (1 << np.arange(planes)).astype(np.int64)

    def sketch(t: pa.Table) -> pa.Table:
        Hm = ray.get(h_ref)
        m = _normalize(_to_matrix(t, vec_col))
        vids = _ids_i64(t, id_col)
        n, T = len(vids), Hm.shape[0]
        bits = np.empty((T, n), dtype=np.int64)
        for tt in range(T):
            bits[tt] = (m @ Hm[tt] > 0) @ weights
        return pa.table(
            {
                "bucket": (
                    (np.repeat(np.arange(T, dtype=np.int64), n) << np.int64(32))
                    | bits.reshape(-1)
                ),
                "vec_id": np.tile(vids, T),
            }
        )

    def bucket_candidates(t: pa.Table, _cap=max_bucket) -> pa.Table:
        # run-length bucket scan (same shape as dedup.bucket_pairs):
        # candidate (lo, hi) id pairs only — no vectors here
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64())}
        )
        if not t.num_rows:
            return empty
        bh = _ids_i64(t, "bucket")
        ids = _ids_i64(t, "vec_id")
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        new = np.empty(len(bh), dtype=bool)
        new[0] = True
        new[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(bh))
        lens = ends - starts
        pick = (lens >= 2) & (lens <= _cap)
        if not pick.any():
            return empty
        I_parts, J_parts = [], []
        for L in np.unique(lens[pick]):
            s_L = starts[pick][lens[pick] == L]
            ii, jj = np.triu_indices(int(L), 1)
            I_parts.append((s_L[:, None] + ii[None, :]).ravel())
            J_parts.append((s_L[:, None] + jj[None, :]).ravel())
        I = np.concatenate(I_parts)
        J = np.concatenate(J_parts)
        a, b = ids[I], ids[J]
        keep = a != b
        return pa.table(
            {"doc_a": np.minimum(a, b)[keep], "doc_b": np.maximum(a, b)[keep]}
        )

    vtype = pa.list_(pa.float32(), dim)

    def _f32_lists(m: np.ndarray) -> pa.Array:
        return _float_lists(m, np.float32, dim)

    def vec_rows(t: pa.Table) -> pa.Table:
        # normalized float32 payload (same float32 round-trip as the
        # prior wire format so verified sims are bit-identical)
        m = _normalize(_to_matrix(t, vec_col))
        n = len(m)
        return pa.table(
            {
                "key": _ids_i64(t, id_col),
                "doc_a": np.full(n, -1, np.int64),
                "vec": _f32_lists(m),
            }
        )

    def cand_rows_b(t: pa.Table) -> pa.Table:
        # home candidates on doc_b; dedup across tables happens here
        # (every copy of a pair lands in this one keyed block); the
        # vec column is NULL on candidate rows — the union side that
        # carries no payload
        a = _ids_i64(t, "doc_a")
        b = _ids_i64(t, "doc_b")
        a, b = _pair_dedup(a, b)
        return pa.table(
            {"key": b, "doc_a": a, "vec": pa.nulls(len(a), vtype)}
        )

    def attach_b(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "vec_b": pa.nulls(0, vtype)}
        )
        if not t.num_rows:
            return empty
        _, ckeys, cdoc_a, vkeys, vm = _split_union_block(t, "doc_a", "vec")
        if not len(ckeys):
            return empty
        # cross-BLOCK duplicate pairs: the same (a, b) can surface from
        # several bucket partitions; they all hash to this one doc_b
        # block, so collapse them here before the gather
        cdoc_a, ckeys = _pair_dedup(cdoc_a, ckeys)
        gathered = _gather_by_key(vkeys, vm, ckeys)
        # re-key on doc_a for the second attach; carry doc_b + its vec
        return pa.table(
            {"key": cdoc_a, "doc_b": ckeys, "vec_b": _f32_lists(gathered)}
        )

    def vec_rows2(t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t, vec_col))
        return pa.table(
            {
                "key": _ids_i64(t, id_col),
                "doc_b": np.full(len(m), -1, np.int64),
                "vec_b": _f32_lists(m),
            }
        )

    def score(t: pa.Table, _thr=threshold) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
        if not t.num_rows:
            return empty
        ct, ckeys, cdoc_b, vkeys, vm = _split_union_block(t, "doc_b", "vec_b")
        if not len(ckeys):
            return empty
        va = _gather_by_key(vkeys, vm, ckeys)
        vb = _to_matrix(ct, "vec_b")  # same mask as ckeys — aligned
        sim = _rowwise_dot(va, vb)
        keep = sim >= _thr
        return pa.table(
            {"doc_a": ckeys[keep], "doc_b": cdoc_b[keep], "sim": sim[keep]}
        )

    candidates = keyed_repartition(
        embeddings.map_batches(sketch, batch_format="pyarrow"),
        width,
        ["bucket"],
    ).map_batches(bucket_candidates, batch_format="pyarrow", batch_size=None)
    with_b = keyed_repartition(
        candidates.map_batches(cand_rows_b, batch_format="pyarrow").union(
            embeddings.map_batches(vec_rows, batch_format="pyarrow")
        ),
        verify_width,
        ["key"],
    ).map_batches(attach_b, batch_format="pyarrow", batch_size=None)
    return keyed_repartition(
        with_b.union(embeddings.map_batches(vec_rows2, batch_format="pyarrow")),
        verify_width,
        ["key"],
    ).map_batches(score, batch_format="pyarrow", batch_size=None)


def lsh_metric_pairs(
    embeddings: "rd.Dataset",
    cutoff: float,
    *,
    metric: str = "euclidean",  # euclidean | pearson | cosine
    tables: int | None = None,
    planes: int | None = None,
    bucket_width: Optional[float] = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 4,
    max_bucket: int = 10_000,
) -> "rd.Dataset":
    """Bucketed cutoff pair-stream — the scale path behind
    :func:`metric_pairs` for EVERY §2.6 metric (the reference
    ``algo.similarity.euclidean/pearson.stream`` at sizes where the
    exact O(n²) sweep is infeasible):

    - cosine/pearson: random-hyperplane sign buckets over the
      (centered+)normalized vectors — pearson(x, y) IS the cosine of
      the centered vectors, so one sketch serves both;
    - euclidean: p-stable projections (Datar et al. 2004) —
      ``planes`` quantized Gaussian projections
      ``floor((v·a + b)/w)`` per table, bucket = their mixed hash;
      ``bucket_width`` defaults to 2·cutoff (the collision s-curve
      midpoint lands near the cutoff).

    Same shuffle discipline as :func:`lsh_cosine_neardup`: the
    ``tables``-way bucket exchange carries (bucket, vec_id) rows ONLY;
    candidate pairs are deduped on their first keyed exchange and
    exact-verified (float64, same prep as the exact kernel, same
    ROUND-half-away compare) by joining vectors back on two further
    keyed exchanges. Approximate in RECALL only — every emitted pair
    is exact-verified; recall vs the exact kernel is measured in
    tests/test_similarity_windows.py. Buckets above ``max_bucket``
    are skipped (degenerate-hash guard). Returns a Dataset
    ``(vec_id_a, vec_id_b, score)``.
    """
    first = embeddings.take(1)
    empty = pd.DataFrame(
        {"vec_id_a": pd.Series([], dtype="int64"),
         "vec_id_b": pd.Series([], dtype="int64"),
         "score": pd.Series([], dtype="float64")}
    )
    if not first:
        return rd.from_pandas(empty)
    dim = len(first[0][vec_col])
    if planes is None or tables is None:
        n_total = embeddings.count()
        if planes is None:
            if metric == "euclidean":
                # p-stable buckets aren't 2^planes-bounded (the mixed
                # hash space is open; bucket population is set by
                # bucket_width), so a fixed plane count doesn't blow up
                # with n.
                planes = 8
            else:
                # sign buckets: 2^planes buckets/table — size to the
                # corpus (expected bucket ~3) like lsh_cosine_neardup,
                # same footgun.
                planes = min(
                    30, max(6, int(np.ceil(np.log2(max(n_total, 16) / 3))))
                )
        if tables is None:
            if metric == "euclidean":
                # fixed planes → per-table hit rate doesn't decay with
                # n; the historic default holds at any size
                tables = 12
            else:
                # pearson(x, y) IS the cosine of the centered vectors,
                # so the hyperplane recall model applies to both sign
                # metrics: grow tables with planes to hold ~0.99 recall
                # at the cutoff
                tables = _auto_tables(cutoff, planes)
        # per-exchange volume sizing, same rationale as
        # lsh_cosine_neardup (input-size hints serialize the verify;
        # CPU floor over-spins aggregators at small n); float64 payload
        # here. Euclidean's p-stable bucket population is set by
        # bucket_width, not 2^planes — assume the same ~3-row target
        # the sign paths size for. The bucket exchange adds an
        # output-work term (~64 B per expected candidate) because the
        # within-bucket pair scan is superlinear in partition size.
        bucket_mean = (
            3.0 if metric == "euclidean" else max(n_total / float(1 << planes), 0.5)
        )
        est_cand = int(n_total * bucket_mean * tables / 2)
        width = shuffle_width(
            max(16 * n_total * tables, 64 * est_cand), min_width=1
        )
        verify_width = shuffle_width(
            (n_total + est_cand) * (16 + 8 * dim), min_width=1
        )
    else:
        # both sketch parameters given: skip the count() — size from
        # the input-file hint (CPU floor when absent)
        sz = source_size_bytes(embeddings)
        width = shuffle_width(sz)
        verify_width = shuffle_width(sz)
    rng = np.random.default_rng(seed)
    scale = 10.0**round_decimals

    def prep(m: np.ndarray) -> np.ndarray:
        if metric == "pearson":
            return _normalize(m - m.mean(axis=1, keepdims=True))
        if metric == "cosine":
            return _normalize(m)
        return m  # euclidean: raw

    if metric == "euclidean":
        w = float(bucket_width) if bucket_width is not None else 2.0 * max(cutoff, 1e-9)
        A = rng.standard_normal((tables, dim, planes))
        B = rng.uniform(0.0, w, size=(tables, planes))
        sk_ref = ray.put((A, B))

        def buckets(m: np.ndarray) -> np.ndarray:
            Am, Bm = ray.get(sk_ref)
            T = Am.shape[0]
            out = np.empty((T, len(m)), dtype=np.int64)
            mix1 = np.uint64(0xBF58476D1CE4E5B9)
            for t in range(T):
                h = np.floor((m @ Am[t] + Bm[t][None, :]) / w).astype(np.int64)
                acc = np.full(len(m), np.uint64(t) + np.uint64(0x9E3779B97F4A7C15))
                for j in range(h.shape[1]):
                    v = h[:, j].astype(np.uint64)
                    acc = (acc ^ v) * mix1
                    acc ^= acc >> np.uint64(29)
                out[t] = (acc >> np.uint64(1)).astype(np.int64)
            return out
    else:
        H = rng.standard_normal((tables, dim, planes))
        h_ref = ray.put(H)
        wts = (1 << np.arange(planes)).astype(np.int64)

        def buckets(m: np.ndarray) -> np.ndarray:
            Hm = ray.get(h_ref)
            T = Hm.shape[0]
            out = np.empty((T, len(m)), dtype=np.int64)
            for t in range(T):
                out[t] = ((np.int64(t) << np.int64(32)) | ((m @ Hm[t] > 0) @ wts))
            return out

    vtype = pa.list_(pa.float64(), dim)  # float64: exact-kernel prep

    def sketch(t: pa.Table) -> pa.Table:
        m = prep(_to_matrix(t, vec_col))
        vids = _ids_i64(t, id_col)
        bk = buckets(m)  # (T, n)
        return pa.table(
            {"bucket": bk.reshape(-1), "vec_id": np.tile(vids, bk.shape[0])}
        )

    def bucket_candidates(t: pa.Table, _cap=max_bucket) -> pa.Table:
        cand_empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64())}
        )
        if not t.num_rows:
            return cand_empty
        bh = _ids_i64(t, "bucket")
        ids = _ids_i64(t, "vec_id")
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        new = np.empty(len(bh), dtype=bool)
        new[0] = True
        new[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(bh))
        lens = ends - starts
        pick = (lens >= 2) & (lens <= _cap)
        if not pick.any():
            return cand_empty
        I_parts, J_parts = [], []
        for L in np.unique(lens[pick]):
            s_L = starts[pick][lens[pick] == L]
            ii, jj = np.triu_indices(int(L), 1)
            I_parts.append((s_L[:, None] + ii[None, :]).ravel())
            J_parts.append((s_L[:, None] + jj[None, :]).ravel())
        I = np.concatenate(I_parts)
        J = np.concatenate(J_parts)
        a, b = ids[I], ids[J]
        keep = a != b
        return pa.table(
            {"doc_a": np.minimum(a, b)[keep], "doc_b": np.maximum(a, b)[keep]}
        )

    def vec_rows(marker_col: str):
        def f(t: pa.Table) -> pa.Table:
            m = prep(_to_matrix(t, vec_col))
            return pa.table(
                {
                    "key": _ids_i64(t, id_col),
                    marker_col: np.full(len(m), -1, np.int64),
                    "vec" if marker_col == "doc_a" else "vec_b": (
                        _float_lists(m, np.float64, dim)
                    ),
                }
            )

        return f

    def cand_rows_b(t: pa.Table) -> pa.Table:
        a, b = _pair_dedup(_ids_i64(t, "doc_a"), _ids_i64(t, "doc_b"))
        return pa.table(
            {"key": b, "doc_a": a, "vec": pa.nulls(len(a), vtype)}
        )

    def attach_b(t: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {"key": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "vec_b": pa.nulls(0, vtype)}
        )
        if not t.num_rows:
            return out_empty
        _, ckeys, cdoc_a, vkeys, vm = _split_union_block(t, "doc_a", "vec")
        if not len(ckeys):
            return out_empty
        cdoc_a, ckeys = _pair_dedup(cdoc_a, ckeys)  # cross-block dups
        gathered = _gather_by_key(vkeys, vm, ckeys)
        return pa.table(
            {
                "key": cdoc_a,
                "doc_b": ckeys,
                "vec_b": _float_lists(gathered, np.float64, dim),
            }
        )

    def score(t: pa.Table, _cut=cutoff) -> pa.Table:
        out_empty = pa.table(
            {"vec_id_a": pa.array([], pa.int64()),
             "vec_id_b": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
        if not t.num_rows:
            return out_empty
        ct, ckeys, cdoc_b, vkeys, vm = _split_union_block(t, "doc_b", "vec_b")
        if not len(ckeys):
            return out_empty
        va = _gather_by_key(vkeys, vm, ckeys)
        vb = _to_matrix(ct, "vec_b")  # same mask as ckeys — aligned
        if metric == "euclidean":
            s = np.sqrt(
                np.maximum(
                    (va * va).sum(axis=1) + (vb * vb).sum(axis=1)
                    - 2.0 * _rowwise_dot(va, vb),
                    0.0,
                )
            )
        else:
            s = _rowwise_dot(va, vb)
        s = np.floor(s * scale + 0.5) / scale
        keep = s <= _cut if metric == "euclidean" else s >= _cut
        return pa.table(
            {"vec_id_a": ckeys[keep], "vec_id_b": cdoc_b[keep], "score": s[keep]}
        )

    candidates = keyed_repartition(
        embeddings.map_batches(sketch, batch_format="pyarrow"),
        width,
        ["bucket"],
    ).map_batches(bucket_candidates, batch_format="pyarrow", batch_size=None)
    with_b = keyed_repartition(
        candidates.map_batches(cand_rows_b, batch_format="pyarrow").union(
            embeddings.map_batches(vec_rows("doc_a"), batch_format="pyarrow")
        ),
        verify_width,
        ["key"],
    ).map_batches(attach_b, batch_format="pyarrow", batch_size=None)
    return keyed_repartition(
        with_b.union(
            embeddings.map_batches(vec_rows("doc_b"), batch_format="pyarrow")
        ),
        verify_width,
        ["key"],
    ).map_batches(score, batch_format="pyarrow", batch_size=None)
