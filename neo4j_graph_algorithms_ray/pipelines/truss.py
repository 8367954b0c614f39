"""k-truss subgraph (Cohen 2008; the GDS-family ``gds.truss`` analog
— not in the mknblch tree, included like k-core/coloring as a standard
link-graph cohesion primitive): the maximal subgraph in which every
edge is supported by ≥ k−2 triangles. Computed as a SYNCHRONOUS peel:
each round recomputes every surviving edge's support over the current
subgraph and deletes ALL under-supported edges at once — deterministic
round-for-round, so the SQL oracle unrolls the rounds exactly
(``__ray_entry__._ktruss_sql``) and rounds past the fixpoint are
no-ops.

Per-round dataflow reuses the triangle family's machinery: the
oriented degree-ordered CSR is broadcast once per round (the same
O(m) plasma envelope as ``triangle_stream``, with the family's 10⁸
-edge artifact), the wedge sweep runs distributed over vertex ranges
(``_wedge_partial``), and each task pre-aggregates its triangles into
(packed canonical edge, count) partials — the driver folds O(distinct
supported edges) ≤ m rows per round, never triangle rows. Edge state
(two id arrays) lives on the driver like every dense per-vertex
vector; the >driver-heap upgrade is the family's documented bucketed
exchange.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import GraphTables
from .triangles import _oriented_csr, _wedge_partial, canonical_undirected


@dataclass
class KTrussResult:
    u: np.ndarray  # surviving canonical edges, dense ids, u < v
    v: np.ndarray
    rounds: int
    converged: bool
    metrics: dict = field(default_factory=dict)


def _support_fold(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Per-edge triangle support over the (u < v, deduped) edge set:
    distributed wedge sweep + per-task (packed edge, count) partials,
    driver fold aligned to the edge arrays via one searchsorted."""
    m = len(u)
    if not m:
        return np.zeros(0, dtype=np.int64)
    indptr, nbrs, ekeys, _deg = _oriented_csr(u, v, n)
    csr_ref = ray.put((indptr, nbrs, ekeys))

    def partial(batch: pa.Table, *, csr_ref=csr_ref, n=n) -> pa.Table:
        tri = _wedge_partial(batch, csr_ref=csr_ref, n=n)
        a = tri["a"].to_numpy(zero_copy_only=False)
        b = tri["b"].to_numpy(zero_copy_only=False)
        c = tri["c"].to_numpy(zero_copy_only=False)
        # 3 canonical edges per triangle (wedge rows are degree-ordered,
        # not id-ordered — canonicalize each pair)
        e1 = np.minimum(a, b) * n + np.maximum(a, b)
        e2 = np.minimum(a, c) * n + np.maximum(a, c)
        e3 = np.minimum(b, c) * n + np.maximum(b, c)
        key, cnt = np.unique(np.concatenate([e1, e2, e3]), return_counts=True)
        return pa.table({"key": key, "cnt": cnt.astype(np.int64)})

    verts = rd.from_arrow(pa.table({"a": np.arange(n, dtype=np.int64)}))
    parts = verts.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    packed = u * n + v  # sorted ascending (canonical order)
    support = np.zeros(m, dtype=np.int64)
    for t in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(packed, key)
        np.add.at(support, pos, cnt)  # every triangle edge IS an edge
    return support


def ktruss(
    graph: GraphTables, k: int = 4, max_rounds: int = 100
) -> KTrussResult:
    """Surviving canonical edges of the k-truss (dense ids, u < v,
    ascending). ``k`` ≥ 3; every k-truss edge closes ≥ k−2 triangles
    within the truss."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    n = graph.n
    u, v = canonical_undirected(graph)
    rounds, converged = 0, False
    t0 = time.perf_counter()
    while rounds < max_rounds:
        if not len(u):
            converged = True
            break
        support = _support_fold(u, v, n)
        keep = support >= (k - 2)
        rounds += 1
        if keep.all():
            converged = True
            break
        u, v = u[keep], v[keep]
    return KTrussResult(
        u=u,
        v=v,
        rounds=rounds,
        converged=converged,
        metrics={"total_seconds": time.perf_counter() - t0},
    )


def ktruss_oracle(
    src: np.ndarray, dst: np.ndarray, n: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Single-machine synchronous-peel replay for tests: same rounds,
    same all-at-once deletion, brute-force per-edge support."""
    key = np.unique(
        np.minimum(src, dst) * n + np.maximum(src, dst)
    )
    u, v = key // n, key % n
    u, v = u[u != v], v[u != v]
    while len(u):
        es = {(int(a), int(b)) for a, b in zip(u, v)}
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = np.array(
            [len(adj[int(a)] & adj[int(b)]) for a, b in zip(u, v)],
            dtype=np.int64,
        )
        keep = sup >= k - 2
        if keep.all():
            break
        u, v = u[keep], v[keep]
    return u, v
