"""Link-prediction scalar functions (reference:
``algo.linkprediction.adamicAdar / commonNeighbors / resourceAllocation
/ preferentialAttachment / totalNeighbors``,
``algo/.../linkprediction/*.java`` [later-branch §2.6]).

The reference exposes these as per-pair Cypher scalar functions over
node neighborhoods; here the batch equivalent: a Dataset of candidate
``(u, v)`` pairs is scored with ``map_batches`` against the undirected
adjacency CSR broadcast once via the object store (same O(m) envelope
as the triangle kernel's CSR; the >10^9-edge upgrade path is a
neighbor-join: pairs ⋈ edges on u, ⋈ edges on v, groupby pair —
SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import GraphTables

_SCORES = (
    "common_neighbors",
    "adamic_adar",
    "resource_allocation",
    "preferential_attachment",
    "total_neighbors",
)


def _full_csr(u: np.ndarray, v: np.ndarray, n: int):
    """Symmetric (both directions) CSR with sorted neighbor lists."""
    a = np.concatenate([u, v])
    b = np.concatenate([v, u])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.searchsorted(a, np.arange(n + 1))
    deg = np.diff(indptr)
    return indptr, b, deg


def _score_batch(batch: pa.Table, *, csr_ref, vids_ref) -> pa.Table:
    indptr, nbrs, deg = ray.get(csr_ref)
    vids = ray.get(vids_ref)
    u_in = batch["u"].to_numpy(zero_copy_only=False)
    v_in = batch["v"].to_numpy(zero_copy_only=False)
    u = np.searchsorted(vids, u_in)
    v = np.searchsorted(vids, v_in)
    # searchsorted returns len(vids) for too-large vids and an arbitrary
    # slot for absent-but-in-range ones — validate membership explicitly
    bad_u = (u >= len(vids)) | (vids[np.minimum(u, len(vids) - 1)] != u_in)
    bad_v = (v >= len(vids)) | (vids[np.minimum(v, len(vids) - 1)] != v_in)
    if bad_u.any() or bad_v.any():
        missing = np.unique(np.concatenate([u_in[bad_u], v_in[bad_v]]))[:5]
        raise KeyError(f"pair vids not in graph: {missing.tolist()}")
    cn = np.zeros(len(u), dtype=np.int64)
    aa = np.zeros(len(u), dtype=np.float64)
    ra = np.zeros(len(u), dtype=np.float64)
    for i in range(len(u)):
        nu = nbrs[indptr[u[i]] : indptr[u[i] + 1]]
        nv = nbrs[indptr[v[i]] : indptr[v[i] + 1]]
        common = np.intersect1d(nu, nv, assume_unique=False)
        cn[i] = len(common)
        if len(common):
            dc = deg[common].astype(np.float64)
            with np.errstate(divide="ignore"):
                logs = np.log(dc)
            aa[i] = float(np.sum(np.where(logs > 0, 1.0 / logs, 0.0)))
            ra[i] = float(np.sum(1.0 / dc))
    du = deg[u].astype(np.int64)
    dv = deg[v].astype(np.int64)
    total = du + dv - cn
    with np.errstate(divide="ignore", invalid="ignore"):
        jaccard = np.where(total > 0, cn / total, 0.0)
        overlap = np.where(
            np.minimum(du, dv) > 0, cn / np.minimum(du, dv), 0.0
        )
    return pa.table(
        {
            "u": batch["u"],
            "v": batch["v"],
            "common_neighbors": cn,
            "adamic_adar": aa,
            "resource_allocation": ra,
            "preferential_attachment": du * dv,
            "total_neighbors": total,
            # the reference's set-similarity functions
            # (algo.similarity.jaccard / overlap — SURVEY §2.6) over
            # neighbor sets
            "jaccard": jaccard,
            "overlap": overlap,
        }
    )


def link_prediction_scores(
    graph: GraphTables, pairs: "rd.Dataset | pa.Table | pd.DataFrame"
) -> "rd.Dataset":
    """Score candidate (u, v) pairs (original vids) with all five
    reference link-prediction functions; returns a Dataset with one row
    per input pair."""
    if isinstance(pairs, pd.DataFrame):
        pairs = pa.Table.from_pandas(pairs, preserve_index=False)
    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)
    # worker-task CSR assembly — the driver never folds the O(m) edge
    # set; size-gated between a single-task canonical build and the
    # shuffle-based distributed dedup (state.csr.sym_csr_ref)
    from ..state.csr import sym_csr_ref

    csr_ref = sym_csr_ref(graph)
    return pairs.map_batches(
        _score_batch,
        batch_format="pyarrow",
        batch_size=8192,
        fn_kwargs={"csr_ref": csr_ref, "vids_ref": graph.vids_ref},
    )


def link_prediction_numpy_oracle(
    u: np.ndarray, v: np.ndarray, n: int, pu: int, pv: int
) -> dict:
    """Brute-force per-pair scores from canonical undirected edges."""
    adj = [set() for _ in range(n)]
    for a, b in zip(u, v):
        adj[a].add(int(b))
        adj[b].add(int(a))
    common = adj[pu] & adj[pv]
    deg = [len(s) for s in adj]
    return {
        "common_neighbors": len(common),
        "adamic_adar": sum(
            1.0 / np.log(deg[w]) for w in common if deg[w] > 1
        ),
        "resource_allocation": sum(1.0 / deg[w] for w in common if deg[w] > 0),
        "preferential_attachment": deg[pu] * deg[pv],
        "total_neighbors": len(adj[pu] | adj[pv]),
    }
