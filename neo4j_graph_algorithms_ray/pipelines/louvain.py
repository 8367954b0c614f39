"""Louvain modularity community detection.

Reference surface: ``algo.louvain(label, rel, {weightProperty, write,
writeProperty:'community'}) YIELD nodes, communityCount, iterations``
(kernel ``algo/.../impl/louvain/Louvain.java`` — two phases: local
moving of vertices between neighbor communities by modularity gain,
then coarsening the graph by contracting communities; repeat until
modularity stops improving).

Execution here (SURVEY.md §2.3 C6): the FIRST (large) level runs its
local-moving rounds against the stateful shard pool — per round one
``vote_triples`` sweep yields Σ w(i→c) for every vertex/neighbor
community, and the modularity gains are evaluated vectorized on the
driver (O(#triples)); SYNCHRONOUS moves with min-community tie-break
(deterministic, same pin as LPA — SURVEY §5.3), a vertex moves only on
strictly positive gain. Coarsened levels are orders of magnitude
smaller (≤ #communities vertices) and run the same rounds in-process on
numpy CSR — the reference, too, collapses to a small graph after level
one. Modularity uses the standard undirected definition
Q = Σ_c [ Σ_in(c)/2m − (Σ_tot(c)/2m)² ].
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..state.graph import GraphTables


@dataclass
class LouvainResult:
    communities: np.ndarray  # original-vid community id per dense vertex
    community_count: int
    levels: int
    modularity: float
    modularities: list
    metrics: dict = field(default_factory=dict)


def _gain_moves(
    tgt: np.ndarray,
    cand: np.ndarray,
    w_ic: np.ndarray,
    comm: np.ndarray,
    k: np.ndarray,
    tot: np.ndarray,
    m2: float,
) -> np.ndarray:
    """Synchronous best-move per vertex: argmax over neighbor communities
    of ΔQ ∝ w(i,c) − Σ_tot'(c)·k_i/2m, tie → min community id.
    Σ_tot'(c) excludes i's own degree when c is i's current community."""
    tot_c = tot[cand].astype(np.float64)
    own = cand == comm[tgt]
    tot_c[own] -= k[tgt[own]]
    gain = w_ic - tot_c * k[tgt] / m2
    # stay-gain baseline: w(i, c_i) − (tot_ci − k_i)·k_i/2m (0 if i has
    # no edge into its own community — singleton)
    order = np.lexsort((cand, -gain, tgt))
    t_o, c_o, g_o = tgt[order], cand[order], gain[order]
    first = np.ones(len(t_o), dtype=bool)
    first[1:] = t_o[1:] != t_o[:-1]
    best_t, best_c, best_g = t_o[first], c_o[first], g_o[first]
    # stay gain per vertex (0 for singletons with no internal edge)
    stay_by_vertex = np.zeros(len(comm))
    own_rows = np.flatnonzero(own)
    stay_by_vertex[tgt[own_rows]] = (
        w_ic[own_rows]
        - (tot[cand[own_rows]] - k[tgt[own_rows]]) * k[tgt[own_rows]] / m2
    )
    new_comm = comm.copy()
    move = best_g > stay_by_vertex[best_t] + 1e-12
    new_comm[best_t[move]] = best_c[move]
    return new_comm


def _modularity(
    si: np.ndarray, di: np.ndarray, w: np.ndarray, comm: np.ndarray, n: int
) -> float:
    """Q over undirected edges given once per pair (si<di or any single
    orientation); self-loops counted once with full weight."""
    m = w.sum() + 0.0
    if m == 0:
        return 0.0
    k = np.zeros(n)
    np.add.at(k, si, w)
    np.add.at(k, di, w)
    inside = comm[si] == comm[di]
    s_in = np.zeros(n)
    np.add.at(s_in, comm[si[inside]], w[inside])
    tot = np.zeros(n)
    np.add.at(tot, comm, k)
    return float((s_in / m - (tot / (2 * m)) ** 2).sum())


def _local_numpy(si, di, w, n, comm, max_rounds=20):
    """In-process local moving on a small (coarse) graph."""
    k = np.zeros(n)
    np.add.at(k, si, w)
    np.add.at(k, di, w)
    m2 = k.sum()
    if m2 == 0:
        return comm
    for _ in range(max_rounds):
        tot = np.zeros(n)
        np.add.at(tot, comm, k)
        # triples (i, comm(j), w) both directions, excluding self-loops
        nl = si != di
        tgt = np.concatenate([si[nl], di[nl]])
        cand = np.concatenate([comm[di[nl]], comm[si[nl]]])
        ww = np.concatenate([w[nl], w[nl]])
        if not len(tgt):
            return comm
        order = np.lexsort((cand, tgt))
        t_s, c_s, w_s = tgt[order], cand[order], ww[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(first)
        new = _gain_moves(
            t_s[starts], c_s[starts], np.add.reduceat(w_s, starts),
            comm, k, tot, m2,
        )
        if (new == comm).all():
            break
        comm = new
    return comm


def louvain(
    graph: GraphTables,
    max_levels: int = 10,
    max_rounds: int = 20,
) -> LouvainResult:
    """Undirected weighted Louvain; community id = min member vid."""
    t0 = time.perf_counter()
    n = graph.n
    sg = graph.sharded()
    weighted = graph.weighted
    k = sg.degree("out", weighted=weighted) + sg.degree("in", weighted=weighted)
    m2 = float(k.sum())
    comm = np.arange(n, dtype=np.int64)
    mods: list[float] = []
    # ---- level 1: shard-pool local moving on the full graph
    if m2 > 0:
        for _ in range(max_rounds):
            tot = np.zeros(n)
            np.add.at(tot, comm, k)
            tgt, cand, w_ic = sg.vote_triples(comm, weighted=weighted, directed=False)
            if not len(tgt):
                break
            new = _gain_moves(tgt, cand, w_ic, comm, k, tot, m2)
            if (new == comm).all():
                break
            comm = new
    # ---- modularity of level-1 partition, computed shard-side:
    # Q = Σ_c [ s_in(c)/m − (tot(c)/2m)² ] with m = total edge weight
    def q_of(mapping: np.ndarray) -> float:
        m = m2 / 2.0
        if m == 0:
            return 0.0
        s_in = sg.intra_weight(mapping)
        tot = np.zeros(n)
        np.add.at(tot, mapping, k)
        return float((s_in / m - (tot / (2 * m)) ** 2).sum())

    mods.append(q_of(comm))
    levels = 1
    mapping = comm  # dense vertex -> current community (dense id space)
    # ---- coarse levels: shard-side contraction once, then numpy local
    # moving on the (much smaller) community graphs
    while levels < max_levels:
        cu, inv = np.unique(mapping, return_inverse=True)
        nc = len(cu)
        # contract by community (shard-side exchange bounded by
        # distinct community pairs), then re-densify community ids
        clo, chi, cw = sg.contract_edges(mapping)
        c_si = np.searchsorted(cu, clo)
        c_di = np.searchsorted(cu, chi)
        sub = _local_numpy(c_si, c_di, cw, nc, np.arange(nc, dtype=np.int64),
                           max_rounds=max_rounds)
        new_mapping = sub[inv]
        q = q_of(new_mapping)
        levels += 1
        if mods and q <= mods[-1] + 1e-12:
            break
        mods.append(q)
        mapping = new_mapping
    # canonical labels: min member vid
    vids = graph.vids
    cu, inv = np.unique(mapping, return_inverse=True)
    min_member = np.full(len(cu), np.iinfo(np.int64).max)
    np.minimum.at(min_member, inv, vids)
    communities = min_member[inv]
    return LouvainResult(
        communities=communities,
        community_count=int(len(cu)),
        levels=levels,
        modularity=mods[-1] if mods else 0.0,
        modularities=mods,
        metrics={"seconds": time.perf_counter() - t0},
    )


