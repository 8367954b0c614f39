"""Minimum/maximum spanning tree — distributed Borůvka.

Reference surface: ``algo.spanningTree.minimum`` / ``.maximum`` /
``algo.mst`` and the k-cluster variants ``algo.spanningTree.kmin/kmax``
(``algo/.../impl/MSTPrim.java`` — Prim with an IntPriorityQueue from a
start node, parent-array ``SpanningTree``; ``KSpanningTree.java`` cuts
the k−1 most extreme edges; proc ``algo/.../MSTPrimProc.java`` writes
``MST`` relationships and YIELDs ``effectiveNodeCount``).

Prim is inherently sequential (one frontier, one priority queue), so the
distributed kernel here is **Borůvka** (SURVEY.md §2.5 P6): each round,
every component selects its minimum outgoing edge — a per-shard
pre-aggregated argmin over the stateful shard pool (state.shards) folded
on the driver — the selected edges join the forest and their components
contract (vectorized min-label union). O(log n) rounds, each round one
actor-pool sweep; ties broken deterministically by (weight, u, v) so the
forest is unique even with duplicate weights.

Semantics pins:
- undirected view of the edge table (each stored edge usable either way);
- ``minimum=False`` negates weights (maximum spanning tree);
- ``spanning_tree(start)`` restricts the forest to the start vertex's
  connected component and reports ``effective_node_count`` like the
  reference proc;
- ``k_spanning_tree``: remove the k−1 most extreme forest edges →
  k clusters (reference KSpanningTree semantics).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.graph import GraphTables
from ..state.shards import boruvka_candidate_kernel as _local_candidates


def _contract(comp: np.ndarray, ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Union components along chosen (comp_a, comp_b) edges: vectorized
    min-label propagation + pointer jumping on the component graph."""
    lab = np.arange(len(comp), dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, ca, lab[cb])
        np.minimum.at(l2, cb, lab[ca])
        while True:
            l3 = l2[l2]
            if (l3 == l2).all():
                break
            l2 = l3
        if (l2 == lab).all():
            break
        lab = l2
    return lab[comp]


@dataclass
class MstResult:
    edges: pa.Table  # src, dst, weight (original vids; src < dst)
    total_weight: float
    effective_node_count: int
    rounds: int
    metrics: dict = field(default_factory=dict)


def boruvka_forest(
    graph: GraphTables, minimum: bool = True, engine: str = "auto"
) -> MstResult:
    """Minimum (or maximum) spanning FOREST over the undirected view.

    ``engine="local"`` (or ``"auto"`` below 50k edges — cf. the scc /
    kmeans single-task gates) pulls the edge arrays once and runs the
    SAME Borůvka rounds in-process: each distributed round costs a
    full actor-pool sweep regardless of graph size, so O(log n) rounds
    over a small graph are pure scheduling overhead. Identical forest
    by construction (shared candidate kernel + shared fold)."""
    t0 = time.perf_counter()
    n = graph.n
    use_local = engine == "local" or (engine == "auto" and graph.m < 50_000)
    if use_local:
        sis, dis, ws = [], [], []
        for b in graph.edges.iter_batches(batch_format="pyarrow", batch_size=None):
            sis.append(b["si"].to_numpy(zero_copy_only=False))
            dis.append(b["di"].to_numpy(zero_copy_only=False))
            if "w" in b.column_names:
                ws.append(b["w"].to_numpy(zero_copy_only=False))
        e_si = np.concatenate(sis) if sis else np.empty(0, np.int64)
        e_di = np.concatenate(dis) if dis else np.empty(0, np.int64)
        e_w = np.concatenate(ws) if ws else None
        sg = None
    else:
        sg = graph.sharded()
    sign = 1.0 if minimum else -1.0
    comp = np.arange(n, dtype=np.int64)
    chosen_a: list[np.ndarray] = []
    chosen_b: list[np.ndarray] = []
    chosen_w: list[np.ndarray] = []
    rounds = 0
    while True:
        cand = (
            _local_candidates(e_si, e_di, e_w, comp, sign)
            if use_local
            else sg.boruvka_candidates(comp, sign)
        )
        if cand is None:
            break
        c, w, a, b = cand
        # fold across shards: per component the lexicographically min
        # (w, a, b) candidate
        order = np.lexsort((b, a, w, c))
        c_s, w_s, a_s, b_s = c[order], w[order], a[order], b[order]
        keep = np.ones(len(c_s), dtype=bool)
        keep[1:] = c_s[1:] != c_s[:-1]
        a_k, b_k, w_k = a_s[keep], b_s[keep], w_s[keep]
        # dedup edges chosen by both endpoints
        packed = a_k * np.int64(n) + b_k
        _, first = np.unique(packed, return_index=True)
        a_k, b_k, w_k = a_k[first], b_k[first], w_k[first]
        chosen_a.append(a_k)
        chosen_b.append(b_k)
        chosen_w.append(w_k * sign)
        comp = _contract(comp, comp[a_k], comp[b_k])
        rounds += 1
    vids = graph.vids
    if chosen_a:
        a = np.concatenate(chosen_a)
        b = np.concatenate(chosen_b)
        w = np.concatenate(chosen_w)
        o = np.lexsort((b, a))
        a, b, w = a[o], b[o], w[o]
        edges = pa.table({"src": vids[a], "dst": vids[b], "weight": w})
        total = float(w.sum())
    else:
        edges = pa.table(
            {
                "src": np.empty(0, np.int64),
                "dst": np.empty(0, np.int64),
                "weight": np.empty(0, np.float64),
            }
        )
        total = 0.0
    return MstResult(
        edges=edges,
        total_weight=total,
        effective_node_count=n,
        rounds=rounds,
        metrics={
            "seconds": time.perf_counter() - t0,
            "components": int(len(np.unique(comp))) if n else 0,
            "engine": "local" if use_local else "actor",
        },
        )


def spanning_tree(
    graph: GraphTables, start_vid: int, minimum: bool = True
) -> MstResult:
    """Forest restricted to the start vertex's component (reference
    MSTPrimProc: YIELD effectiveNodeCount, write MST relationships)."""
    res = boruvka_forest(graph, minimum=minimum)
    vids = graph.vids
    src = res.edges["src"].to_numpy(zero_copy_only=False)
    dst = res.edges["dst"].to_numpy(zero_copy_only=False)
    # component of start under the forest (original-id union-find, driver)
    uniq = np.unique(np.concatenate([src, dst, [start_vid]]))
    a = np.searchsorted(uniq, src)
    b = np.searchsorted(uniq, dst)
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, a, lab[b])
        np.minimum.at(l2, b, lab[a])
        while True:
            l3 = l2[l2]
            if (l3 == l2).all():
                break
            l2 = l3
        if (l2 == lab).all():
            break
        lab = l2
    start_root = lab[int(np.searchsorted(uniq, start_vid))]
    keep = lab[a] == start_root
    w = res.edges["weight"].to_numpy(zero_copy_only=False)[keep]
    eff = int((lab == start_root).sum())
    return MstResult(
        edges=pa.table({"src": src[keep], "dst": dst[keep], "weight": w}),
        total_weight=float(w.sum()),
        effective_node_count=eff,
        rounds=res.rounds,
        metrics=res.metrics,
    )


def k_spanning_tree(
    graph: GraphTables, k: int, start_vid: int, minimum: bool = True
) -> pd.DataFrame:
    """Cut the k−1 most extreme edges of the start component's spanning
    tree → k clusters; returns (vid, cluster) with cluster = min member
    vid (reference KSpanningTree semantics)."""
    tree = spanning_tree(graph, start_vid, minimum=minimum)
    src = tree.edges["src"].to_numpy(zero_copy_only=False)
    dst = tree.edges["dst"].to_numpy(zero_copy_only=False)
    w = tree.edges["weight"].to_numpy(zero_copy_only=False)
    # vertex set = the FULL start component (a cut leaf edge leaves its
    # endpoint behind as a singleton cluster)
    uniq = np.unique(np.concatenate([src, dst, [start_vid]]))
    if len(w) and k > 1:
        # remove k-1 max-weight (min variant) / min-weight (max variant)
        order = np.argsort(w, kind="stable")
        cut = order[-(k - 1):] if minimum else order[: k - 1]
        keep = np.ones(len(w), dtype=bool)
        keep[cut] = False
        src, dst = src[keep], dst[keep]
    a = np.searchsorted(uniq, src)
    b = np.searchsorted(uniq, dst)
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, a, lab[b])
        np.minimum.at(l2, b, lab[a])
        while True:
            l3 = l2[l2]
            if (l3 == l2).all():
                break
            l2 = l3
        if (l2 == lab).all():
            break
        lab = l2
    return pd.DataFrame({"vid": uniq, "cluster": uniq[lab]})


def prim_numpy_oracle(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int, start: int = 0
) -> float:
    """Sequential Prim total-weight oracle for the start component
    (tests; the reference's MSTPrim semantics)."""
    import heapq

    adj: list[list[tuple[float, int]]] = [[] for _ in range(n)]
    for s, d, ww in zip(src, dst, w):
        adj[s].append((float(ww), int(d)))
        adj[d].append((float(ww), int(s)))
    seen = np.zeros(n, dtype=bool)
    seen[start] = True
    heap = list(adj[start])
    heapq.heapify(heap)
    total = 0.0
    while heap:
        ww, v = heapq.heappop(heap)
        if seen[v]:
            continue
        seen[v] = True
        total += ww
        for e in adj[v]:
            if not seen[e[1]]:
                heapq.heappush(heap, e)
    return total
