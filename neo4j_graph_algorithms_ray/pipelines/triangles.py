"""Triangle counting / clustering coefficients (reference: algo.triangleCount,
algo.triangle.stream).

Semantics match the reference kernels
(``algo/.../impl/triangle/TriangleCountBase.java``,
``TriangleStream.java``, proc ``algo/.../TriangleProc.java``): the graph
is treated as UNDIRECTED (canonicalized + deduplicated, self-loops
dropped — the loader's sorted-unique-adjacency precondition); each
triangle is credited to all three vertices;
``coefficient(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`` (0 when deg<2);
``averageClusteringCoefficient`` is the mean over all vertices; the
stream variant emits each triangle exactly once as an ordered triple.

Execution (SURVEY.md §2.4 T1): instead of the reference's shared-memory
sorted-adjacency intersection, a DEGREE-ORDERED wedge semi-join:

1. canonicalize + dedup undirected edges;
2. orient every edge low→high by the total order (degree, vid) — this
   bounds oriented out-degree by O(√m) on any graph and kills power-law
   hub skew (the explicit skew handling the north star asks for);
3. build the oriented CSR (neighbor lists sorted by that order) plus a
   sorted packed-edge-key array ONCE, broadcast via the object store
   (O(m) — same envelope as the dense vectors; the >10^9-edge upgrade
   path is a bucketed hash semi-join of wedge tables, SURVEY §2.4);
4. fan wedge generation + closing-edge membership check over vertex
   ranges with ``map_batches`` on ``ray.data.range(n)`` — each task
   reads the CSR zero-copy, emits the matched triangles only.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.dense import group_sum, scatter_combine
from ..state.graph import GraphTables


def canonical_undirected(graph: GraphTables) -> tuple[np.ndarray, np.ndarray]:
    """Dense (u, v) canonical undirected edges, u < v, deduped, no loops.

    Per-block canonicalization + pre-dedup runs distributed; the final
    global dedup folds packed keys on the driver (O(m) memory — the
    shuffle path is groupby((u,v)).take_first at larger scale).
    """
    n = graph.n

    def canon(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        u = np.minimum(si, di)
        v = np.maximum(si, di)
        keep = u != v
        key = np.unique(u[keep] * n + v[keep])
        return pa.table({"key": key})

    parts = graph.edges.map_batches(canon, batch_format="pyarrow", batch_size=None)
    chunks = [
        b["key"].to_numpy(zero_copy_only=False)
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not chunks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    key = np.unique(np.concatenate(chunks))
    return key // n, key % n


@dataclass
class TriangleResult:
    triangles: np.ndarray  # per dense vertex
    coefficients: np.ndarray
    triangle_count: int
    average_coefficient: float
    node_count: int
    metrics: dict = field(default_factory=dict)


def _wedge_partial(
    batch: pa.Table, *, csr_ref, n: int
) -> pa.Table:
    """Emit matched triangles (a,b,c as dense ids) for a vertex range.

    Fully vectorized: vertices are grouped by oriented out-degree (≤
    O(√m) distinct values thanks to the degree orientation), each
    degree class expands its wedges with one fancy-indexing shot, and
    the closing-edge membership check is a single ``searchsorted``
    semi-join per class."""
    lo_hi = batch["a"].to_numpy(zero_copy_only=False)
    indptr, nbrs, ekeys = ray.get(csr_ref)
    deg = indptr[lo_hi + 1] - indptr[lo_hi]
    out_a, out_b, out_c = [], [], []
    for k in np.unique(deg):
        if k < 2:
            continue
        vs = lo_hi[deg == k]
        starts = indptr[vs]
        nb = nbrs[starts[:, None] + np.arange(k)]  # (V, k), rank-sorted
        bi, ci = np.triu_indices(int(k), 1)
        wb = nb[:, bi].ravel()
        wc = nb[:, ci].ravel()
        a_rep = np.repeat(vs, len(bi))
        key = wb * n + wc
        hit = np.searchsorted(ekeys, key)
        ok = (hit < len(ekeys)) & (
            ekeys[np.minimum(hit, len(ekeys) - 1)] == key
        )
        if ok.any():
            out_a.append(a_rep[ok])
            out_b.append(wb[ok].astype(np.int64))
            out_c.append(wc[ok].astype(np.int64))
    if not out_a:
        z = np.empty(0, np.int64)
        return pa.table({"a": z, "b": z, "c": z})
    return pa.table(
        {
            "a": np.concatenate(out_a),
            "b": np.concatenate(out_b),
            "c": np.concatenate(out_c),
        }
    )


def _oriented_csr(u: np.ndarray, v: np.ndarray, n: int):
    """Orient canonical edges by (degree, vid) order; return
    (indptr, neighbors-sorted-by-order, sorted packed keys, degrees)."""
    deg = (
        np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    ).astype(np.int64)
    order = np.lexsort((np.arange(n), deg))  # position → vertex
    r = np.empty(n, dtype=np.int64)
    r[order] = np.arange(n)  # vertex → rank in (deg, vid) order
    swap = r[u] > r[v]
    a = np.where(swap, v, u)
    b = np.where(swap, u, v)
    # sort adjacency by (a, rank(b)) so each neighbor list is rank-sorted
    o = np.lexsort((r[b], a))
    a, b = a[o], b[o]
    indptr = np.searchsorted(a, np.arange(n + 1))
    ekeys = np.sort(a * n + b)
    return indptr, b, ekeys, deg


def triangle_stream(graph: GraphTables) -> "rd.Dataset":
    """Each triangle once as (node_a, node_b, node_c), original vids,
    sorted ascending within the row (reference TriangleStream)."""
    n = graph.n
    u, v = canonical_undirected(graph)
    indptr, nbrs, ekeys, _deg = _oriented_csr(u, v, n)
    csr_ref = ray.put((indptr, nbrs, ekeys))
    vids_ref = graph.vids_ref

    def to_vids(batch: pa.Table) -> pa.Table:
        vids = ray.get(vids_ref)
        tri = np.sort(
            np.stack(
                [
                    vids[batch["a"].to_numpy(zero_copy_only=False)],
                    vids[batch["b"].to_numpy(zero_copy_only=False)],
                    vids[batch["c"].to_numpy(zero_copy_only=False)],
                ]
            ),
            axis=0,
        )
        return pa.table({"node_a": tri[0], "node_b": tri[1], "node_c": tri[2]})

    verts = rd.from_arrow(pa.table({"a": np.arange(n, dtype=np.int64)}))
    return verts.map_batches(
        _wedge_partial,
        batch_format="pyarrow",
        batch_size=4096,
        fn_kwargs={"csr_ref": csr_ref, "n": n},
    ).map_batches(to_vids, batch_format="pyarrow", batch_size=None)


def _triangle_counts_dense(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Small-graph kernel: per-vertex triangle counts via one BLAS
    matmul — ((A@A) ∘ A).rowsum / 2. Exact; O(n³) flops but tiny
    constants, so it beats the wedge pipeline up to a few thousand
    vertices (it is the analog of the reference keeping a sequential
    Tarjan/intersection kernel for small graphs next to the parallel
    one)."""
    A = np.zeros((n, n), dtype=np.float32)
    A[u, v] = 1.0
    A[v, u] = 1.0
    return (((A @ A) * A).sum(axis=1) / 2.0).astype(np.int64)


_DENSE_KERNEL_MAX_N = 4096


def triangle_count(graph: GraphTables, kernel: str = "auto") -> TriangleResult:
    """``kernel``: "auto" picks dense ≤4096 vertices, the broadcast
    wedge semi-join up to the single-task CSR ceiling, and the
    fully-distributed bucketed kernel above it (O(n) driver state — no
    whole-graph CSR broadcast at cluster scale);
    "dense"/"wedge"/"bucketed" force a path (tests assert agreement)."""
    from ..state.csr import SYM_CSR_SINGLE_TASK_MAX_M

    if kernel == "bucketed" or (
        kernel == "auto" and graph.m > SYM_CSR_SINGLE_TASK_MAX_M
    ):
        return triangle_count_bucketed(graph)
    t0 = time.perf_counter()
    n = graph.n
    u, v = canonical_undirected(graph)
    use_dense = kernel == "dense" or (kernel == "auto" and n <= _DENSE_KERNEL_MAX_N)
    if n and use_dense:
        deg = (np.bincount(u, minlength=n) + np.bincount(v, minlength=n)).astype(
            np.int64
        )
        tri = _triangle_counts_dense(u, v, n)
        with np.errstate(divide="ignore", invalid="ignore"):
            coeff = np.where(deg > 1, 2.0 * tri / (deg * (deg - 1.0)), 0.0)
        return TriangleResult(
            triangles=tri,
            coefficients=coeff,
            triangle_count=int(tri.sum() // 3),
            average_coefficient=float(coeff.mean()) if n else 0.0,
            node_count=n,
            metrics={
                "seconds": time.perf_counter() - t0,
                "edges_canonical": len(u),
                "kernel": "dense",
            },
        )
    indptr, nbrs, ekeys, deg = _oriented_csr(u, v, n)
    csr_ref = ray.put((indptr, nbrs, ekeys))

    def tri_partial(batch: pa.Table) -> pa.Table:
        matched = _wedge_partial(batch, csr_ref=csr_ref, n=n)
        allv = np.concatenate(
            [
                matched["a"].to_numpy(zero_copy_only=False),
                matched["b"].to_numpy(zero_copy_only=False),
                matched["c"].to_numpy(zero_copy_only=False),
            ]
        )
        idx, cnt = group_sum(allv, np.ones(len(allv)))
        return pa.table({"idx": idx, "val": cnt})

    verts = rd.from_arrow(pa.table({"a": np.arange(n, dtype=np.int64)}))
    tri = scatter_combine(verts, tri_partial, n, op="sum").astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(deg > 1, 2.0 * tri / (deg * (deg - 1.0)), 0.0)
    return TriangleResult(
        triangles=tri,
        coefficients=coeff,
        triangle_count=int(tri.sum() // 3),
        average_coefficient=float(coeff.mean()) if n else 0.0,
        node_count=n,
        metrics={"seconds": time.perf_counter() - t0, "edges_canonical": len(u)},
    )


def canonical_edges_ds(graph: GraphTables) -> "rd.Dataset":
    """Distributed canonical dedup: per-block canonicalize (u<v, no
    loops) + local unique → hash repartition on the packed key → global
    per-block unique. The canonical edge set NEVER folds on the driver
    (contrast ``canonical_undirected`` — the broadcast-CSR small-graph
    path). Requires n < 2^32 (packed uint64 keys)."""
    from ..state.partitioning import shuffle_width

    n = graph.n
    if n >= (1 << 32):  # pragma: no cover - beyond the packed-key domain
        raise OverflowError("canonical_edges_ds packs (u,v) into uint64: n < 2^32")

    def canon(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False).astype(np.uint64)
        di = batch["di"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = np.minimum(si, di)
        v = np.maximum(si, di)
        keep = u != v
        key = np.unique((u[keep] << np.uint64(32)) | v[keep])
        return pa.table({"k": key})

    def uniq(batch: pa.Table) -> pa.Table:
        k = np.unique(batch["k"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "u": (k >> np.uint64(32)).astype(np.int64),
                "v": (k & np.uint64(0xFFFFFFFF)).astype(np.int64),
            }
        )

    from ..state.partitioning import keyed_repartition, source_size_bytes

    return keyed_repartition(
        graph.edges.map_batches(canon, batch_format="pyarrow", batch_size=None),
        shuffle_width(source_size_bytes(graph.edges)),
        ["k"],
    ).map_batches(uniq, batch_format="pyarrow", batch_size=None)


def triangle_count_bucketed(graph: GraphTables) -> TriangleResult:
    """Fully-distributed triangle count (the >broadcast-scale path the
    reference's ``IntersectingTriangleCount.java`` semantics map to at
    cluster scale): no O(m) driver fold and no whole-graph CSR broadcast
    — driver state is O(n) dense vectors only (degrees/counts), the
    same envelope as PageRank.

    1. ``canonical_edges_ds``: distributed canonical dedup.
    2. degrees: map-side pre-aggregated fold into a dense O(n) vector.
    3. orient low→high by (degree, vid); hash-repartition by the wedge
       apex ``a`` so each apex's oriented adjacency is block-complete;
       per block emit wedge rows (closing-key, apex).
    4. union wedges with oriented-edge marker rows; hash-repartition on
       the closing key; per block a wedge is a triangle iff its key has
       a marker — pre-aggregated per-vertex counts fold into the dense
       result.
    Skew: degree orientation bounds oriented out-degree by O(√m), so a
    power-law hub's wedge fan-out is bounded; hot closing-keys are
    impossible (keys are unique edges)."""
    from ..state.partitioning import shuffle_width

    t0 = time.perf_counter()
    n = graph.n
    canon = canonical_edges_ds(graph).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        allv = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        idx, cnt = group_sum(allv, np.ones(len(allv)))
        return pa.table({"idx": idx, "val": cnt})

    deg = scatter_combine(canon, deg_partial, n, op="sum").astype(np.int64)
    deg_ref = ray.put(deg)

    def orient(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        swap = (dg[u] > dg[v]) | ((dg[u] == dg[v]) & (u > v))
        a = np.where(swap, v, u)
        b = np.where(swap, u, v)
        return pa.table({"a": a, "b": b})

    from ..state.partitioning import keyed_repartition

    oriented = keyed_repartition(
        canon.map_batches(orient, batch_format="pyarrow", batch_size=None),
        shuffle_width(),
        ["a"],
    ).materialize()  # consumed twice: wedge fan-out + closing markers

    def wedges(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        # rank-sort within each apex group so emitted (wb, wc) pairs are
        # rank-ordered — i.e. oriented-edge keys
        o = np.lexsort((b, dg[b], a))
        a, b = a[o], b[o]
        bounds = np.flatnonzero(np.diff(a)) + 1
        bounds = np.concatenate(([0], bounds, [len(a)]))
        out_k, out_a = [], []
        for gi in range(len(bounds) - 1):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            nb = b[lo:hi].astype(np.uint64)
            bi, ci = np.triu_indices(hi - lo, 1)
            out_k.append((nb[bi] << np.uint64(32)) | nb[ci])
            out_a.append(np.full(len(bi), a[lo], dtype=np.int64))
        if not out_k:
            return pa.table(
                {"wk": np.empty(0, np.uint64), "apex": np.empty(0, np.int64)}
            )
        return pa.table({"wk": np.concatenate(out_k), "apex": np.concatenate(out_a)})

    wedge_ds = oriented.map_batches(wedges, batch_format="pyarrow", batch_size=None)

    def edge_markers(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "wk": (a << np.uint64(32)) | b,
                "apex": np.full(len(a), -1, dtype=np.int64),
            }
        )

    markers = oriented.map_batches(edge_markers, batch_format="pyarrow", batch_size=None)

    def match_partial(batch: pa.Table) -> pa.Table:
        wk = batch["wk"].to_numpy(zero_copy_only=False)
        apex = batch["apex"].to_numpy(zero_copy_only=False)
        closed = np.unique(wk[apex < 0])
        cand = apex >= 0
        pos = np.searchsorted(closed, wk[cand])
        hit = (pos < len(closed)) & (
            closed[np.minimum(pos, max(len(closed) - 1, 0))] == wk[cand]
        ) if len(closed) else np.zeros(int(cand.sum()), dtype=bool)
        mk = wk[cand][hit]
        ma = apex[cand][hit]
        allv = np.concatenate(
            [ma, (mk >> np.uint64(32)).astype(np.int64),
             (mk & np.uint64(0xFFFFFFFF)).astype(np.int64)]
        )
        idx, cnt = group_sum(allv, np.ones(len(allv)))
        return pa.table({"idx": idx, "val": cnt})

    tri = scatter_combine(
        keyed_repartition(wedge_ds.union(markers), shuffle_width(), ["wk"]),
        match_partial,
        n,
        op="sum",
    ).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(deg > 1, 2.0 * tri / (deg * (deg - 1.0)), 0.0)
    return TriangleResult(
        triangles=tri,
        coefficients=coeff,
        triangle_count=int(tri.sum() // 3),
        average_coefficient=float(coeff.mean()) if n else 0.0,
        node_count=n,
        metrics={"seconds": time.perf_counter() - t0, "kernel": "bucketed"},
    )


def triangle_table(graph: GraphTables) -> pa.Table:
    res = triangle_count(graph)
    return graph.to_table(
        {"triangles": res.triangles, "coefficient": res.coefficients}
    )


# ----------------------------------------------------------------------
# Balanced triads (reference: algo.balancedTriads,
# algo/.../impl/triangle/BalancedTriads.java — mknblch specialty):
# signed-triangle classification, balanced ⇔ product of edge signs > 0
# ----------------------------------------------------------------------
@dataclass
class BalancedTriadsResult:
    balanced: np.ndarray  # per dense vertex
    unbalanced: np.ndarray
    balanced_count: int
    unbalanced_count: int
    metrics: dict = field(default_factory=dict)


def canonical_undirected_signed(graph: GraphTables) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical undirected edges + sign (+1 / −1 from the weight; a
    pair stored twice keeps the min-weight sign deterministically)."""
    n = graph.n

    def canon(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        u = np.minimum(si, di)
        v = np.maximum(si, di)
        keep = u != v
        key = u[keep] * n + v[keep]
        order = np.lexsort((w[keep], key))
        k_s, w_s = key[order], w[keep][order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        return pa.table({"key": k_s[first], "w": w_s[first]})

    parts = graph.edges.map_batches(canon, batch_format="pyarrow", batch_size=None)
    keys, ws = [], []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        keys.append(b["key"].to_numpy(zero_copy_only=False))
        ws.append(b["w"].to_numpy(zero_copy_only=False))
    if not keys:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    key = np.concatenate(keys)
    w = np.concatenate(ws)
    order = np.lexsort((w, key))
    k_s, w_s = key[order], w[order]
    first = np.ones(len(k_s), dtype=bool)
    first[1:] = k_s[1:] != k_s[:-1]
    k_s, w_s = k_s[first], w_s[first]
    sign = np.where(w_s >= 0, 1.0, -1.0)
    return k_s // n, k_s % n, sign


def balanced_triads(graph: GraphTables) -> BalancedTriadsResult:
    """Per-vertex balanced/unbalanced triad counts over the signed
    undirected graph; each triad credited to all three vertices."""
    t0 = time.perf_counter()
    if not graph.weighted:
        raise ValueError("balanced triads require a weighted (signed) graph")
    n = graph.n
    u, v, sign = canonical_undirected_signed(graph)
    indptr, nbrs, ekeys, _deg = _oriented_csr(u, v, n)
    # sign lookup aligned to sorted packed keys
    skey = np.sort(u * n + v)
    sidx = np.argsort(u * n + v, kind="stable")
    signs_by_key = sign[sidx]
    csr_ref = ray.put((indptr, nbrs, ekeys))
    sign_ref = ray.put((skey, signs_by_key))

    def part(batch: pa.Table) -> pa.Table:
        matched = _wedge_partial(batch, csr_ref=csr_ref, n=n)
        a = matched["a"].to_numpy(zero_copy_only=False)
        b = matched["b"].to_numpy(zero_copy_only=False)
        c = matched["c"].to_numpy(zero_copy_only=False)
        sk, sv = ray.get(sign_ref)

        def look(x, y):
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            return sv[np.searchsorted(sk, lo * n + hi)]

        prod = look(a, b) * look(b, c) * look(a, c)
        allv = np.concatenate([a, b, c])
        bal = np.concatenate([prod > 0] * 3).astype(np.float64)
        idx_b, cnt_b = group_sum(allv, bal)
        idx_u, cnt_u = group_sum(allv, 1.0 - bal)
        return pa.table(
            {
                "idx": np.concatenate([idx_b, idx_u]),
                "b": np.concatenate([cnt_b, np.zeros(len(idx_u))]),
                "u": np.concatenate([np.zeros(len(idx_b)), cnt_u]),
            }
        )

    verts = rd.from_arrow(pa.table({"a": np.arange(n, dtype=np.int64)}))
    parts = verts.map_batches(part, batch_format="pyarrow", batch_size=4096)
    bal = np.zeros(n, dtype=np.float64)
    unb = np.zeros(n, dtype=np.float64)
    for batch in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = batch["idx"].to_numpy(zero_copy_only=False)
        np.add.at(bal, idx, batch["b"].to_numpy(zero_copy_only=False))
        np.add.at(unb, idx, batch["u"].to_numpy(zero_copy_only=False))
    bal_i = bal.astype(np.int64)
    unb_i = unb.astype(np.int64)
    return BalancedTriadsResult(
        balanced=bal_i,
        unbalanced=unb_i,
        balanced_count=int(bal_i.sum() // 3),
        unbalanced_count=int(unb_i.sum() // 3),
        metrics={"seconds": time.perf_counter() - t0},
    )


def triangle_count_numpy_oracle(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Brute-force per-vertex triangle counts from canonical edges (tests)."""
    adj = np.zeros((n, n), dtype=bool)
    adj[u, v] = True
    adj[v, u] = True
    tri = np.zeros(n, dtype=np.int64)
    for a in range(n):
        nb = np.flatnonzero(adj[a])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if adj[nb[i], nb[j]]:
                    tri[a] += 1
    return tri // 1
