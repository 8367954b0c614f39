"""InfoMap — map-equation community detection (reference:
``algo.infoMap``, ``algo/.../impl/infomap/InfoMap.java`` — the mknblch
fork's specialty, itself a simplified in-JVM port of Rosvall–Bergstrom's
map equation seeded by a PageRank vector).

Two-level map equation over an undirected view with symmetric flows:

    p_v   : PageRank visit probabilities, normalized to Σ=1
    A_v   : p_v / weightedDegree(v)
    F_ij  : w_ij · (A_i + A_j) / 2      (symmetric edge flow)
    q_c   : Σ F_ij crossing community c's boundary (exit flow)
    L(M)  = plogp(Σ_c q_c) − 2·Σ_c plogp(q_c) − Σ_v plogp(p_v)
            + Σ_c plogp(q_c + Σ_{v∈c} p_v)        [plogp(x) = x·log2 x]

Search mirrors the Louvain structure: SYNCHRONOUS local moving
(deterministic — SURVEY §5.3 pin: strict-improvement moves, ties → min
community id, a round that fails to reduce the recomputed codelength is
reverted), with the level-1 flow triples produced by one stateful
shard-pool sweep per round and gains evaluated vectorized on the
driver; then MULTI-LEVEL refinement — modules contract to a coarse flow
graph (driver-side, bounded by module count) and the same move loop
runs there, repeating while the full-graph codelength improves.
Simplifications vs the published algorithm (no teleportation term in
the flows) follow the reference implementation's own treatment.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..state.graph import GraphTables
from .pagerank import PageRankConfig, pagerank


def _plogp(x):
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = x[pos] * np.log2(x[pos])
    return out if out.ndim else float(out)


def _codelength(q: np.ndarray, sump: np.ndarray, p: np.ndarray) -> float:
    return float(
        _plogp(q.sum()) - 2.0 * _plogp(q).sum() - _plogp(p).sum()
        + _plogp(q + sump).sum()
    )


def _agg_triples(tgt, cand, f):
    """Fold duplicate (tgt, cand) rows."""
    if not len(tgt):
        return tgt, cand, f
    order = np.lexsort((cand, tgt))
    t_s, c_s, f_s = tgt[order], cand[order], f[order]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = (t_s[1:] != t_s[:-1]) | (c_s[1:] != c_s[:-1])
    starts = np.flatnonzero(first)
    return t_s[starts], c_s[starts], np.add.reduceat(f_s, starts)


def _move_loop(triples_fn, p: np.ndarray, s: np.ndarray, n: int, max_rounds: int):
    """Synchronous strict-improvement map-equation local moving.

    ``triples_fn(comm) -> (tgt, cand, f)``: per vertex, flow to each
    neighbor community under ``comm``. Returns (comm, codelength,
    rounds)."""
    comm = np.arange(n, dtype=np.int64)

    def stats(mapping):
        tgt, cand, f = triples_fn(mapping)
        own = cand == mapping[tgt]
        d_own = np.zeros(n)
        np.add.at(d_own, tgt[own], f[own])
        q = np.zeros(n)
        np.add.at(q, mapping, s - d_own)
        sump = np.zeros(n)
        np.add.at(sump, mapping, p)
        return tgt, cand, f, q, sump, _codelength(q, sump, p)

    tgt, cand, f, q, sump, L = stats(comm)
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        a = comm[tgt]
        own = cand == a
        d_ia = np.zeros(n)
        np.add.at(d_ia, tgt[own], f[own])
        qt = q.sum()
        si, pi = s[tgt], p[tgt]
        dia, dib = d_ia[tgt], f
        qa, qb = q[a], q[cand]
        spa, spb = sump[a], sump[cand]
        qa_n = qa + 2.0 * dia - si
        qb_n = qb + si - 2.0 * dib
        qt_n = qt + 2.0 * dia - 2.0 * dib
        dL = (
            (_plogp(qt_n) - _plogp(qt))
            - 2.0 * (_plogp(qa_n) + _plogp(qb_n) - _plogp(qa) - _plogp(qb))
            + (
                _plogp(qa_n + spa - pi)
                + _plogp(qb_n + spb + pi)
                - _plogp(qa + spa)
                - _plogp(qb + spb)
            )
        )
        dL = np.where(own, 0.0, dL)
        order = np.lexsort((cand, dL, tgt))
        t_o, c_o, g_o = tgt[order], cand[order], dL[order]
        first = np.ones(len(t_o), dtype=bool)
        first[1:] = t_o[1:] != t_o[:-1]
        bt, bc, bg = t_o[first], c_o[first], g_o[first]
        move = bg < -1e-12
        if not move.any():
            break
        # synchronous application: per-vertex dL estimates ignore
        # interactions between simultaneous moves, so the full
        # recompute can reject the batch. Instead of aborting the
        # loop, retry geometrically smaller prefixes of the
        # best-gain-first move list (deterministic, ≤log2 extra
        # sweeps) — a single non-interacting move always exists when
        # any strict improvement does.
        mt, mc = bt[move], bc[move]
        g_rank = np.argsort(bg[move], kind="stable")  # most negative first
        mt, mc = mt[g_rank], mc[g_rank]
        applied = False
        k = len(mt)
        while k >= 1:
            new_comm = comm.copy()
            new_comm[mt[:k]] = mc[:k]
            res = stats(new_comm)
            if res[5] < L - 1e-12:
                comm = new_comm
                tgt, cand, f, q, sump, L = res
                applied = True
                break
            k //= 2
        if not applied:
            break
    return comm, L, rounds


@dataclass
class InfoMapResult:
    communities: np.ndarray  # original-vid module id (min member vid)
    community_count: int
    codelength: float
    iterations: int
    metrics: dict = field(default_factory=dict)


def infomap(
    graph: GraphTables,
    max_rounds: int = 30,
    max_levels: int = 10,
    pr_tolerance: float = 1e-9,
) -> InfoMapResult:
    t0 = time.perf_counter()
    n = graph.n
    sg = graph.sharded()
    weighted = graph.weighted
    pr = pagerank(
        graph, PageRankConfig(tolerance=pr_tolerance, max_iterations=500)
    ).ranks
    p = pr / pr.sum() if n and pr.sum() > 0 else np.full(n, 1.0 / max(n, 1))
    wdeg = sg.degree("out", weighted=weighted) + sg.degree("in", weighted=weighted)
    with np.errstate(divide="ignore", invalid="ignore"):
        A = np.where(wdeg > 0, p / wdeg, 0.0)

    # level 1: shard-pool triples
    tgt0, _, f0 = sg.flow_votes(np.arange(n, dtype=np.int64), A)
    s = np.zeros(n)
    np.add.at(s, tgt0, f0)
    comm, L, rounds = _move_loop(lambda m: sg.flow_votes(m, A), p, s, n, max_rounds)

    # multi-level: contract modules → coarse flow graph → move loop
    levels = 1
    while levels < max_levels:
        levels += 1
        cu, inv = np.unique(comm, return_inverse=True)
        nc = len(cu)
        if nc <= 1:
            break
        # cross-module flows from one triples sweep under `comm`
        tgt, cand, f = sg.flow_votes(comm, A)
        # inv maps VERTEX index -> coarse module index; tgt is a vertex,
        # so index inv by tgt directly (inv[comm[tgt]] would resolve the
        # label-holder vertex's module, which is wrong once the holder
        # itself has moved)
        ca = inv[tgt]
        cb = np.searchsorted(cu, cand)
        cross = ca != cb
        ca, cb, cf = _agg_triples(ca[cross], cb[cross], f[cross])
        p_c = np.zeros(nc)
        np.add.at(p_c, inv, p)
        s_c = np.zeros(nc)
        np.add.at(s_c, ca, cf)

        def coarse_triples(mapping, _ca=ca, _cb=cb, _cf=cf):
            return _agg_triples(_ca, mapping[_cb], _cf)

        sub, subL, _ = _move_loop(coarse_triples, p_c, s_c, nc, max_rounds)
        if (sub == np.arange(nc)).all():
            break
        new_comm = comm.copy()
        # module a joins module sub[a]: map vertices through cu
        new_comm = cu[sub[inv]]
        # accept only if the FULL-graph codelength improves
        tgt2, cand2, f2 = sg.flow_votes(new_comm, A)
        own2 = cand2 == new_comm[tgt2]
        d_own2 = np.zeros(n)
        np.add.at(d_own2, tgt2[own2], f2[own2])
        q2 = np.zeros(n)
        np.add.at(q2, new_comm, s - d_own2)
        sump2 = np.zeros(n)
        np.add.at(sump2, new_comm, p)
        L2 = _codelength(q2, sump2, p)
        if L2 >= L - 1e-12:
            break
        comm, L = new_comm, L2
    vids = graph.vids
    cu, inv = np.unique(comm, return_inverse=True)
    min_member = np.full(len(cu), np.iinfo(np.int64).max)
    np.minimum.at(min_member, inv, vids)
    return InfoMapResult(
        communities=min_member[inv],
        community_count=int(len(cu)),
        codelength=L,
        iterations=rounds + levels - 1,
        # p is part of the result contract: an external checker needs the
        # visit probabilities to recompute the map-equation codelength of
        # the emitted partition (the witness oracle in __ray_entry__)
        metrics={"seconds": time.perf_counter() - t0, "p": p},
    )
