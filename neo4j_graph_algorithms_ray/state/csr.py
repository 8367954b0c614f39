"""CSR assembly in REMOTE tasks — bounded driver RSS.

Several kernels (Brandes betweenness, random walks, link prediction)
need the whole adjacency as one CSR because their inner loops are
per-source graph traversals. The CSR itself is the same O(m)
object-store envelope as the edge Dataset; what must NOT happen is the
O(m) concatenation/sort on the DRIVER. These helpers run the build in a
Ray task fed by the Dataset's existing block ObjectRefs — the driver
touches only refs, the finished CSR lands in plasma and is shared
zero-copy by every consumer task.
"""

from __future__ import annotations

import numpy as np
import ray


def _block_refs(ds) -> list:
    return [
        ref
        for bundle in ds.iter_internal_ref_bundles()
        for ref, _meta in bundle.blocks
    ]


@ray.remote
def _build_csr(n: int, directed: bool, weighted: bool, dedup_min: bool, *blocks):
    sis, dis, ws = [], [], []
    for t in blocks:
        if not t.num_rows:
            continue
        sis.append(t["si"].to_numpy(zero_copy_only=False))
        dis.append(t["di"].to_numpy(zero_copy_only=False))
        ws.append(
            t["w"].to_numpy(zero_copy_only=False)
            if "w" in t.column_names
            else np.ones(t.num_rows)
        )
    if sis:
        si = np.concatenate(sis)
        di = np.concatenate(dis)
        w = np.concatenate(ws)
    else:
        si = di = np.empty(0, np.int64)
        w = np.empty(0, np.float64)
    if not directed:
        si, di, w = (
            np.concatenate([si, di]),
            np.concatenate([di, si]),
            np.concatenate([w, w]),
        )
    order = np.lexsort((di, si))
    si, di, w = si[order], di[order], w[order]
    if dedup_min and len(si):
        first = np.empty(len(si), dtype=bool)
        first[0] = True
        first[1:] = (si[1:] != si[:-1]) | (di[1:] != di[:-1])
        grp = np.cumsum(first) - 1
        wmin = np.full(int(grp[-1]) + 1, np.inf)
        np.minimum.at(wmin, grp, w)
        si, di, w = si[first], di[first], wmin
    indptr = np.searchsorted(si, np.arange(n + 1))
    if weighted:
        return indptr, di, w
    return indptr, di


def build_csr_ref(
    graph,
    directed: bool = True,
    weighted: bool = False,
    dedup_parallel_min: bool = False,
) -> "ray.ObjectRef":
    """ObjectRef of ``(indptr, nbrs[, w])`` over dense ids, built in a
    worker task from the edge Dataset's blocks."""
    refs = _block_refs(graph.edges)
    return _build_csr.remote(
        graph.n, directed, weighted, dedup_parallel_min, *refs
    )


@ray.remote
def _build_sym_csr(n: int, *blocks):
    us, vs = [], []
    for t in blocks:
        if not t.num_rows:
            continue
        us.append(t["u"].to_numpy(zero_copy_only=False))
        vs.append(t["v"].to_numpy(zero_copy_only=False))
    if us:
        u = np.concatenate(us)
        v = np.concatenate(vs)
    else:
        u = v = np.empty(0, np.int64)
    a = np.concatenate([u, v])
    b = np.concatenate([v, u])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.searchsorted(a, np.arange(n + 1))
    deg = np.diff(indptr)
    return indptr, b, deg


def build_sym_csr_ref(canon_ds, n: int) -> "ray.ObjectRef":
    """Symmetric CSR (sorted neighbor lists + degrees) from a canonical
    undirected (u, v) edge Dataset (see triangles.canonical_edges_ds)."""
    canon_ds = canon_ds.materialize()
    return _build_sym_csr.remote(n, *_block_refs(canon_ds))


@ray.remote
def _build_sym_csr_raw(n: int, *blocks):
    """Canonicalize (u<v, drop loops, dedup) AND build the symmetric CSR
    in one task, straight from raw ``si``/``di`` edge blocks."""
    keys = []
    for t in blocks:
        if not t.num_rows:
            continue
        si = t["si"].to_numpy(zero_copy_only=False).astype(np.uint64)
        di = t["di"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = np.minimum(si, di)
        v = np.maximum(si, di)
        keep = u != v
        keys.append(np.unique((u[keep] << np.uint64(32)) | v[keep]))
    k = np.unique(np.concatenate(keys)) if keys else np.empty(0, np.uint64)
    u = (k >> np.uint64(32)).astype(np.int64)
    v = (k & np.uint64(0xFFFFFFFF)).astype(np.int64)
    a = np.concatenate([u, v])
    b = np.concatenate([v, u])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.searchsorted(a, np.arange(n + 1))
    deg = np.diff(indptr)
    return indptr, b, deg


# Below this many raw edges the canonical dedup runs inside the CSR
# build task itself (one unique over ~16 B/edge of keys — comfortably
# in a worker heap); above it, the shuffle-based canonical_edges_ds
# path dedups distributed first. Either way the DRIVER never folds the
# edge set.
SYM_CSR_SINGLE_TASK_MAX_M = 64_000_000


def sym_csr_ref(graph) -> "ray.ObjectRef":
    """Size-gated symmetric-CSR build for a ``GraphTables`` graph.

    A broadcast CSR is only viable when the graph fits one worker heap
    anyway, so for those sizes the canonical dedup is a single remote
    task over the raw edge blocks — a hash-repartition exchange here is
    pure fixed overhead (~seconds of task/metadata latency on a
    megabyte of keys). The shuffle path remains for edge sets too large
    to unique in one task."""
    if graph.n >= (1 << 32):  # pragma: no cover - beyond packed keys
        raise OverflowError("sym_csr_ref packs (u,v) into uint64: n < 2^32")
    if graph.m <= SYM_CSR_SINGLE_TASK_MAX_M:
        return _build_sym_csr_raw.remote(graph.n, *_block_refs(graph.edges))
    from ..pipelines.triangles import canonical_edges_ds

    return build_sym_csr_ref(canonical_edges_ds(graph), graph.n)
