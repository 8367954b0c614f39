"""Sharded actor-pool execution for iterative kernels.

The north star names this component directly: "materializes
per-partition CSR adjacency blocks inside stateful actor-pool workers".
The reference keeps the projected graph in-heap and runs many iterations
over it (``algo/.../impl/PageRank.java`` ``ComputeStep`` threads over a
shared ``AdjacencyMatrix``); the Ray analog here is a pool of long-lived
actors, each holding the CSR-grouped numpy views of a slice of the
materialized edge Dataset's blocks, built ONCE (``__init__``-time, like
``map_batches(Cls)`` actor setup) and reused every round.

Why this exists next to the ``map_batches`` dataflow path
(``state.dense.scatter_combine``): a fresh Ray Data streaming execution
costs ~0.2-0.3 s of fixed driver-side work (plan optimization, executor
spin-up/teardown) PER ITERATION — pure serial time under Amdahl, which
caps N→4N scaling efficiency far below the 0.8 target unless each
iteration carries tens of seconds of parallel compute. A round against
the shard pool is: ``ray.put`` the per-vertex vector once, one async
actor call per shard (the vector ObjectRef is auto-dereferenced —
zero-copy plasma read per actor), each shard reduces its edges to a
pre-aggregated partial, driver folds the partials. Serial cost ~10 ms.

Both paths implement identical semantics and are cross-checked in tests
(cross-representation agreement, SURVEY.md §5.2, mirroring the
reference's parameterized Heavy/Light/View test matrix). Kernels choose
via ``engine="auto"``: actor pool for materialized graphs above a size
floor, dataflow otherwise.

Multi-node note: shard actors are placed by Ray across the cluster; each
holds only its slice (~|E|/P edges). The driver-held dense vector is the
same O(n) envelope the dense combine already assumes (SURVEY §1.3); the
upgrade path at >10^9 vertices is range-sharded vectors owned by the
actors themselves with the same round protocol.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import ray


def _group_structure(idx: np.ndarray):
    """Sort-based grouping: (order, uniq, starts) for reduceat folds."""
    order = np.argsort(idx, kind="stable")
    sorted_idx = idx[order]
    if len(sorted_idx):
        first = np.ones(len(sorted_idx), dtype=bool)
        first[1:] = sorted_idx[1:] != sorted_idx[:-1]
        starts = np.flatnonzero(first)
        uniq = sorted_idx[starts]
    else:
        starts = np.empty(0, dtype=np.int64)
        uniq = np.empty(0, dtype=np.int64)
    return order, uniq, starts


def boruvka_candidate_kernel(si, di, w, comp: "np.ndarray", sign: float):
    """Per component touched by this edge set: the lexicographically
    min (sign·w, u, v) edge leaving the component; (comp, w, u, v)
    pre-aggregated, or None if no cross edges. Module-level so the
    shard actors AND mst's local small-graph gate share ONE tie-break
    definition — the cross-engine bit-identical-forest guarantee
    depends on it."""
    cs, cd = comp[si], comp[di]
    m = cs != cd
    if not m.any():
        return None
    u = si[m].astype(np.int64)
    v = di[m].astype(np.int64)
    ww0 = (w[m] if w is not None else np.ones(int(m.sum()))) * sign
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    c = np.concatenate([cs[m], cd[m]])
    ww = np.concatenate([ww0, ww0])
    aa = np.concatenate([a, a])
    bb = np.concatenate([b, b])
    order = np.lexsort((bb, aa, ww, c))
    c_s, w_s, a_s, b_s = c[order], ww[order], aa[order], bb[order]
    keep = np.ones(len(c_s), dtype=bool)
    keep[1:] = c_s[1:] != c_s[:-1]
    return c_s[keep], w_s[keep], a_s[keep], b_s[keep]


class _EdgeShard:
    """One shard: CSR-grouped numpy views of a set of edge blocks.

    All per-round methods take dense per-vertex numpy vectors (passed as
    ObjectRefs, auto-dereferenced zero-copy) and return PRE-AGGREGATED
    partials — one row per touched vertex, never per edge.
    """

    def __init__(self, spans: list, weighted: bool, threads: int = 1):
        """``spans``: list of ``(block_ref, offset, length)`` — this shard
        owns contiguous row ranges of specific blocks, so shard count is
        independent of the Dataset's physical block count (a shard never
        fetches blocks it doesn't own; Arrow ``slice`` is zero-copy).
        ``threads``: intra-actor thread fan-out for the scatter hot loop."""
        self.threads = max(1, int(threads))
        tables = []
        for ref, off, ln in spans:
            t = ray.get(ref)
            if ln:
                tables.append(t.slice(off, ln))
        tables = [t for t in tables if t.num_rows]
        if tables:
            self.si = np.concatenate(
                [t["si"].to_numpy(zero_copy_only=False) for t in tables]
            )
            self.di = np.concatenate(
                [t["di"].to_numpy(zero_copy_only=False) for t in tables]
            )
            self.w = (
                np.concatenate([t["w"].to_numpy(zero_copy_only=False) for t in tables])
                if weighted
                else None
            )
        else:
            self.si = np.empty(0, dtype=np.int64)
            self.di = np.empty(0, dtype=np.int64)
            self.w = np.empty(0, dtype=np.float64) if weighted else None
        # the whole build (and the per-round hot loop) is
        # memory-bandwidth-bound: narrow the per-edge streams to int32
        # BEFORE the grouping sort where ids fit (they do whenever
        # n < 2^31 — the >2^31 case keeps int64, the reference's
        # Heavy-vs-Huge split in one line)
        if len(self.si) and max(self.si.max(), self.di.max()) < 2**31:
            # n < 2^16 (small vertex universes over huge edge streams —
            # e.g. repo-link graphs) narrows further to uint16: the
            # per-iteration DRAM read is the index streams themselves,
            # so 2 B/id halves the scatter's memory traffic vs int32.
            # Chunked kernels convert each cache-sized slice to intp
            # transiently; the full-stream storage is what DRAM sees.
            dt = (
                np.uint16
                if max(self.si.max(), self.di.max()) < 2**16
                else np.int32
            )
            self.si = self.si.astype(dt)
            self.di = self.di.astype(dt)
        # Everything derived from the edge streams is LAZY: an actor that
        # only ever runs small-n scatters (chunked bincount, below) never
        # pays the argsort/gather build — 16 actors argsorting 8M-edge
        # shards simultaneously serialize on this box's one DRAM
        # controller, which made the pool build the dominant load cost.
        self._d_group = None  # lazy (order, uniq, starts) over di
        self._d_layout = None  # lazy destination-sorted (si_d, w_d, chunks)
        self._d_inv = None  # lazy: only the sparse (n > DENSE_MAX_N) path
        self._s_group = None  # lazy src grouping (reverse direction)
        self._star = None  # lazy local-CC star edges (WCC)
        self._thr_cache: dict = {}  # threshold -> filtered (si, di)

    # vertices-fit-in-cache cutover: below this dense_n the scatter uses
    # per-chunk bincount into an n-sized accumulator (no sorted layout to
    # build); above it the destination-sorted chunked-reduceat layout
    # wins (~2x less DRAM traffic once the accumulator spills the cache)
    SMALL_N = 1 << 20

    # ------------------------------------------------------------------
    def ready(self) -> int:
        return int(len(self.si))

    def _src_group(self):
        if self._s_group is None:
            self._s_group = _group_structure(self.si)
        return self._s_group

    def _dst_group(self):
        if self._d_group is None:
            self._d_group = _group_structure(self.di)
        return self._d_group

    def _dst_layout(self):
        """Destination-sorted CSR layout for the chunked-reduceat
        scatter: one sequential int32 stream per round, the contrib
        buffer stays cache-resident per chunk, segment sums write
        sequential ranges. 256k-edge chunks: the 2 MB contrib buffer
        stays cache-resident even with one worker per core sharing the
        L3 (8 MB chunks measured ~33% slower at 8+ concurrent
        workers)."""
        if self._d_layout is None:
            d_order, _, d_starts = self._dst_group()
            si_d = self.si[d_order]
            w_d = self.w[d_order] if self.w is not None else None
            C = 1 << 18
            m = len(si_d)
            chunks = []
            gs = d_starts
            for lo in range(0, m, C):
                hi = min(lo + C, m)
                i0 = np.searchsorted(gs, lo, side="left")
                i1 = np.searchsorted(gs, hi, side="left")
                starts = (gs[i0:i1] - lo).astype(np.int64)
                if not len(starts) or starts[0] != 0:
                    starts = np.concatenate([np.zeros(1, np.int64), starts])
                uniq = self.di[d_order[lo + starts]].astype(np.int64)
                chunks.append((lo, hi, starts, uniq))
            self._d_layout = (si_d, w_d, chunks)
        return self._d_layout

    def _dst_inv(self):
        if self._d_inv is None:
            d_uniq = self._dst_group()[1]
            inv = np.searchsorted(d_uniq, self.di)
            if inv.size and len(d_uniq) < 2**31:
                inv = inv.astype(np.int32)
            self._d_inv = inv
        return self._d_inv

    def _scatter_bincount(
        self, vec: np.ndarray, weighted: bool, dense_n: int, reverse: bool = False
    ):
        """Small-n scatter: fixed 256k-edge chunks, per-chunk gather +
        weighted bincount into a cache-resident dense_n accumulator —
        no sorted layout, nothing built at init. ``reverse=True`` runs
        the transposed propagation (gather at dst, scatter to src —
        the HITS hub update) over the same streams."""
        C = 1 << 18
        m = len(self.si)
        ranges = [(lo, min(lo + C, m)) for lo in range(0, m, C)]
        g_idx, s_idx = (self.di, self.si) if reverse else (self.si, self.di)

        def run(rs):
            out = np.zeros(dense_n, dtype=np.float64)
            for lo, hi in rs:
                contrib = vec[g_idx[lo:hi]]
                if weighted and self.w is not None:
                    contrib = contrib * self.w[lo:hi]
                out += np.bincount(s_idx[lo:hi], weights=contrib, minlength=dense_n)
            return out

        T = self.threads
        if T > 1 and len(ranges) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(T) as ex:
                outs = list(ex.map(run, [ranges[i::T] for i in range(T)]))
            return np.sum(outs, axis=0)
        return run(ranges)

    # ------------------------------------------------------------------
    # degrees (out/in, optionally weighted)
    # ------------------------------------------------------------------
    def degree_partial(self, direction: str, weighted: bool, dense_n: Optional[int]):
        idx = self.si if direction == "out" else self.di
        w = self.w if (weighted and self.w is not None) else None
        if dense_n is not None:
            # one bincount pass — no sort, no grouping build; random
            # writes land in a dense_n-sized accumulator (cache-resident
            # for any n the dense path admits)
            return np.bincount(idx, weights=w, minlength=dense_n).astype(
                np.float64, copy=False
            )
        val = w if w is not None else np.ones(len(idx), dtype=np.float64)
        if direction == "out":
            order, uniq, starts = self._src_group()
        else:
            order, uniq, starts = self._dst_group()
        if not len(uniq):
            sums = np.empty(0, dtype=np.float64)
        else:
            sums = np.add.reduceat(val[order], starts)
        return uniq, sums

    # ------------------------------------------------------------------
    # PageRank round: Σ_{u→v} vec[u]·mul[u] (·w) per destination v
    # ------------------------------------------------------------------
    def scatter_sum(
        self,
        vec: np.ndarray,
        weighted: bool,
        dense_n: Optional[int] = None,
        reverse: bool = False,
    ):
        """``vec`` arrives pre-multiplied (driver computes rank·invdeg —
        O(n) there vs O(m) gathers here), so the hot loop is ONE gather
        + one bincount over int32 streams. ``reverse=True`` propagates
        along the TRANSPOSED edges (dst → src — the HITS hub update);
        the reverse path always uses the chunked-bincount kernel (no
        src-sorted layout is built — reverse rounds are rare enough
        that the extra accumulator DRAM traffic above SMALL_N is
        cheaper than a second grouping sort per shard)."""
        if reverse:
            if dense_n is not None:
                return self._scatter_bincount(vec, weighted, dense_n, reverse=True)
            contrib = vec[self.di]
            if weighted and self.w is not None:
                contrib = contrib * self.w
            s_order, s_uniq, s_starts = self._src_group()
            if not len(s_uniq):
                return s_uniq, np.empty(0, dtype=np.float64)
            return s_uniq, np.add.reduceat(contrib[s_order], s_starts)
        if dense_n is not None:
            if dense_n <= self.SMALL_N:
                return self._scatter_bincount(vec, weighted, dense_n)
            si_d, w_d, all_chunks = self._dst_layout()

            def run(chunks):
                out = np.zeros(dense_n, dtype=np.float64)
                for lo, hi, starts, uniq in chunks:
                    contrib = vec[si_d[lo:hi]]
                    if weighted and w_d is not None:
                        contrib = contrib * w_d[lo:hi]
                    out[uniq] += np.add.reduceat(contrib, starts)
                return out

            T = self.threads
            if T > 1 and len(all_chunks) > 1:
                # numpy gather/reduceat release the GIL — intra-actor
                # threads let one actor drive several cores, cutting the
                # per-round RPC fan-out (fewer actors, same parallelism)
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(T) as ex:
                    outs = list(ex.map(run, [all_chunks[i::T] for i in range(T)]))
                return np.sum(outs, axis=0)
            return run(all_chunks)
        contrib = vec[self.si]
        if weighted and self.w is not None:
            contrib = contrib * self.w
        d_uniq = self._dst_group()[1]
        sums = np.bincount(self._dst_inv(), weights=contrib, minlength=len(d_uniq))
        return d_uniq, sums

    def scatter_split(self, cuts, weighted: bool, *slices):
        """Range-engine round: the premultiplied vector arrives as
        per-range SLICES (plasma objects produced by the range owners —
        the driver only routed their ObjectRefs), and the pre-aggregated
        dense scatter is returned SPLIT at ``cuts`` — invoke with
        ``.options(num_returns=len(cuts)-1)`` so every piece is its own
        plasma object that flows straight to its owning range actor."""
        vec = np.concatenate(slices) if len(slices) > 1 else slices[0]
        dense_n = int(cuts[-1])
        if dense_n <= self.SMALL_N:
            dense = self._scatter_bincount(vec, weighted, dense_n)
        else:
            si_d, w_d, all_chunks = self._dst_layout()

            def run(chunks):
                out = np.zeros(dense_n, dtype=np.float64)
                for lo, hi, starts, uniq in chunks:
                    contrib = vec[si_d[lo:hi]]
                    if weighted and w_d is not None:
                        contrib = contrib * w_d[lo:hi]
                    out[uniq] += np.add.reduceat(contrib, starts)
                return out

            T = self.threads
            if T > 1 and len(all_chunks) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(T) as ex:
                    outs = list(ex.map(run, [all_chunks[i::T] for i in range(T)]))
                dense = np.sum(outs, axis=0)
            else:
                dense = run(all_chunks)
        pieces = [dense[cuts[r] : cuts[r + 1]] for r in range(len(cuts) - 1)]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)

    def active_targets_partial(self, changed: np.ndarray, dense_n: int):
        """Boolean mask of vertices whose h-index can have moved this
        round: their own value changed, or any neighbor's value did
        (h(v) is a function of exactly {val[u]: u ∈ N(v)} ∪ {val[v]},
        so everything else is provably a no-op). OR-folded across
        shards by the driver."""
        act = np.zeros(dense_n, dtype=bool)
        for a, b in ((self.si, self.di), (self.di, self.si)):
            sel = changed[a]
            act[b[sel]] = True
        # sparse return once the frontier collapses: int32 indices cost
        # 4·k bytes vs the n-byte mask — at 10^8 vertices the late-round
        # partials drop from 100 MB/shard to ~nothing
        idx = np.flatnonzero(act)
        if len(idx) * 4 < dense_n:
            return idx.astype(np.int32)
        return act

    def hindex_partial(self, vals: np.ndarray, active: Optional[np.ndarray] = None):
        """One k-core h-operator round, shard partial: per-target
        histogram of CLIPPED neighbor values, both edge directions in
        one pass (undirected coreness — callers must not hold both
        orientations of the same pair, or the neighbor is counted
        twice; the bipartite projections satisfy this by construction).
        Clipping neighbor values at the target's own current value is
        lossless (the h-operator sequence is non-increasing from a
        degree init — Lü et al. 2016), and bounds the partial at
        Σ_v |{distinct clipped neighbor values}| rows — far below m
        once values collapse toward coreness. ``active`` (optional
        boolean mask) restricts emission to targets whose inputs
        changed since the last round — on sparse graphs the active
        frontier collapses after a few rounds, and with it the fold.
        Returns (key, cnt) with key = tgt<<32 | clipped_val,
        fold-summable across shards."""
        parts = []
        for a, b in ((self.si, self.di), (self.di, self.si)):
            if active is not None:
                keep = active[b]
                a, b = a[keep], b[keep]
            c = np.minimum(vals[a], vals[b])
            parts.append((b.astype(np.int64) << np.int64(32)) | c)
        key = np.concatenate(parts) if len(parts) > 1 else parts[0]
        uk, cnt = np.unique(key, return_counts=True)
        return uk, cnt

    def hindex_partial_split(self, vals: np.ndarray, active, cuts: np.ndarray):
        """``hindex_partial`` sliced by target range for the
        range-split fold: the partial is key-sorted (np.unique), and
        the target id is the key's high 32 bits, so each range's slice
        is one searchsorted on ``cuts<<32``. Returned as
        ``num_returns=len(cuts)-1`` plasma objects that flow straight
        to their fold tasks."""
        uk, cnt = self.hindex_partial(vals, active)
        idx = np.searchsorted(uk, cuts.astype(np.int64) << np.int64(32))
        pieces = [
            (uk[idx[r] : idx[r + 1]], cnt[idx[r] : idx[r + 1]])
            for r in range(len(cuts) - 1)
        ]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)

    def _regmax_grouped(self, M: np.ndarray, group, gather_idx):
        """Per-group elementwise max of register rows: for each distinct
        scatter target (``group`` = (order, uniq, starts) over the
        scatter stream), the columnwise max of ``M[gather_idx]`` rows in
        its segment. Chunked so the gathered (256k, regs) uint8 contrib
        stays cache-sized; segments spanning a chunk boundary re-merge
        through the target slot (max is idempotent). Returns sorted
        (uniq int64, vals uint8 (len, regs))."""
        order, uniq, starts = group
        nu, regs = len(uniq), M.shape[1]
        m = len(order)
        if not nu:
            return uniq.astype(np.int64), np.zeros((0, regs), dtype=np.uint8)
        C = 1 << 18
        spans = [(lo, min(lo + C, m)) for lo in range(0, m, C)]

        def run(myspans):
            out = np.zeros((nu, regs), dtype=np.uint8)
            for lo, hi in myspans:
                i0 = int(np.searchsorted(starts, lo, side="right")) - 1
                i1 = int(np.searchsorted(starts, hi, side="left"))
                rel = np.maximum(starts[i0:i1], lo) - lo
                contrib = M[gather_idx[order[lo:hi]].astype(np.intp)]
                seg = np.maximum.reduceat(contrib, rel, axis=0)
                np.maximum(out[i0:i1], seg, out=out[i0:i1])
            return out

        T = self.threads
        if T > 1 and len(spans) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(T) as ex:
                outs = list(ex.map(run, [spans[i::T] for i in range(T)]))
            vals = outs[0]
            for o in outs[1:]:
                np.maximum(vals, o, out=vals)
        else:
            vals = run(spans)
        return uniq.astype(np.int64), vals

    def regmax_partial_split(self, cuts: np.ndarray, directed: bool, *slices):
        """One HyperANF round, shard partial: per-destination columnwise
        max of the source rows of the (n, regs) uint8 register matrix
        (both directions when undirected), returned as sparse
        (uniq, vals) pairs SPLIT at ``cuts`` — invoke with
        ``num_returns=len(cuts)-1`` so each piece flows straight to its
        range fold task. The register matrix arrives as per-range
        slices (plasma objects owned by the previous round's folds)."""
        M = np.vstack(slices) if len(slices) > 1 else slices[0]
        u1, v1 = self._regmax_grouped(M, self._dst_group(), self.si)
        if directed:
            uniq, vals = u1, v1
        else:
            u2, v2 = self._regmax_grouped(M, self._src_group(), self.di)
            if not len(u1):
                uniq, vals = u2, v2
            elif not len(u2):
                uniq, vals = u1, v1
            else:
                # merge two sorted sparse partials by target id
                cat = np.concatenate([u1, u2])
                cv = np.vstack([v1, v2])
                order = np.argsort(cat, kind="stable")
                cat, cv = cat[order], cv[order]
                first = np.ones(len(cat), dtype=bool)
                first[1:] = cat[1:] != cat[:-1]
                fs = np.flatnonzero(first)
                uniq = cat[fs]
                vals = np.maximum.reduceat(cv, fs, axis=0)
        if len(uniq):
            # registers are monotone (fold = max with the old slice),
            # so rows that improve nothing are no-ops — drop them
            # before the exchange. Late rounds collapse to the still-
            # growing frontier, like k-core's changed-mask filter.
            imp = (vals > M[uniq]).any(axis=1)
            uniq, vals = uniq[imp], vals[imp]
        idx = np.searchsorted(uniq, cuts.astype(np.int64))
        pieces = [
            (uniq[idx[r] : idx[r + 1]], vals[idx[r] : idx[r + 1]])
            for r in range(len(cuts) - 1)
        ]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)

    def _thr_edges(self, thr):
        """Edge streams filtered to weight > thr, memoized per threshold
        (a fixpoint runs many rounds over the same filtered view — the
        reference unionFind's ``threshold`` option, applied shard-side
        so the filter never re-shuffles anything)."""
        if thr is None:
            return self.si, self.di
        key = float(thr)
        if key not in self._thr_cache:
            if self.w is None:
                raise ValueError("threshold requires a weighted graph")
            m = self.w > key
            self._thr_cache[key] = (self.si[m], self.di[m])
        return self._thr_cache[key]

    def min_split(self, cuts, thr, *slices):
        """Range-engine WCC round: label vector arrives as slices,
        per-destination min-label candidates return split at ``cuts``
        (missing vertices carry the int64 max sentinel). ``thr``
        restricts propagation to edges with weight > thr (None = all)."""
        labels = np.concatenate(slices) if len(slices) > 1 else slices[0]
        dense_n = int(cuts[-1])
        out = np.full(dense_n, np.iinfo(np.int64).max, dtype=np.int64)
        si, di = self._thr_edges(thr)
        # undirected min propagation: both directions in one pass
        # (int32 index streams are valid fancy indices — no astype copies)
        for a, b in ((si, di), (di, si)):
            np.minimum.at(out, b, labels[a])
        pieces = [out[cuts[r] : cuts[r + 1]] for r in range(len(cuts) - 1)]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)

    def lpa_votes_split(self, cuts, weighted: bool, directed: bool, *slices):
        """Range-engine LPA round: label slices in, the shard's folded
        (tgt, lab, w) vote triples out, SPLIT at ``cuts`` by target
        range (triples are tgt-sorted, so the split is a searchsorted).
        Each piece flows straight to its owning range actor."""
        labels = np.concatenate(slices) if len(slices) > 1 else slices[0]
        tgt, lab, w = self.lpa_votes(labels, weighted, directed)
        bounds = np.searchsorted(tgt, cuts)
        pieces = [
            (
                tgt[bounds[r] : bounds[r + 1]],
                lab[bounds[r] : bounds[r + 1]],
                w[bounds[r] : bounds[r + 1]],
            )
            for r in range(len(cuts) - 1)
        ]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)

    # ------------------------------------------------------------------
    # WCC: per-shard local CC once → star edges; min round over them
    # ------------------------------------------------------------------
    def build_star(self):
        """Contract this shard's edges to (vertex → local min member)
        star edges — the per-task DSS of the reference's
        ParallelUnionFind variants, vectorized."""
        if self._star is None:
            a, b = self.si, self.di
            uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            ai, bi = inv[: len(a)], inv[len(a):]
            lab = np.arange(len(uniq), dtype=np.int64)
            while True:
                l2 = lab.copy()
                np.minimum.at(l2, ai, lab[bi])
                np.minimum.at(l2, bi, lab[ai])
                while True:
                    l3 = l2[l2]
                    if (l3 == l2).all():
                        break
                    l2 = l3
                if (l2 == lab).all():
                    break
                lab = l2
            keep = np.arange(len(uniq)) != lab
            self._star = (uniq[keep], uniq[lab[keep]])
        return int(len(self._star[0]))

    def min_round(self, labels: np.ndarray, use_star: bool, dense_n: Optional[int] = None):
        """One undirected min-label round: for each touched vertex, the
        min label among its neighbors in this shard."""
        if use_star:
            self.build_star()
            a, b = self._star
        else:
            a, b = self.si, self.di
        both_idx = np.concatenate([a, b])
        both_val = np.concatenate([labels[b], labels[a]])
        order, uniq, starts = _group_structure(both_idx)
        if not len(uniq):
            mins = np.empty(0, dtype=np.int64)
        else:
            mins = np.minimum.reduceat(both_val[order], starts)
        if dense_n is not None:
            out = np.full(dense_n, np.iinfo(np.int64).max, dtype=np.int64)
            out[uniq] = mins
            return out
        return uniq, mins

    # ------------------------------------------------------------------
    # SCC rounds (directed, masked)
    # ------------------------------------------------------------------
    def fwd_min(self, color: np.ndarray, active: np.ndarray):
        m = active[self.si] & active[self.di]
        if not m.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        di, val = self.di[m], color[self.si[m]]
        order, uniq, starts = _group_structure(di)
        return uniq, np.minimum.reduceat(val[order], starts)

    def bwd_reach(self, reached: np.ndarray, color: np.ndarray):
        m = (
            reached[self.di]
            & ~reached[self.si]
            & (color[self.si] == color[self.di])
            & (color[self.si] < len(color))
        )
        if not m.any():
            return np.empty(0, np.int64)
        return np.unique(self.si[m])

    # ------------------------------------------------------------------
    # Delta-stepping relax: tentative-distance improvements from a
    # frontier, optionally restricted to light (w ≤ cap) or heavy
    # (w > cap) edges (Meyer–Sanders bucketing)
    # ------------------------------------------------------------------
    def relax(
        self,
        dist: np.ndarray,
        frontier: np.ndarray,
        w_cap: Optional[float] = None,
        heavy: bool = False,
        undirected: bool = False,
    ):
        w = self.w if self.w is not None else np.ones(len(self.si))
        wm = np.ones(len(w), dtype=bool)
        if w_cap is not None:
            wm = (w > w_cap) if heavy else (w <= w_cap)
        pairs = [(self.si, self.di)]
        if undirected:
            pairs.append((self.di, self.si))
        outs_i, outs_v = [], []
        for a, b in pairs:
            m = wm & frontier[a]
            if not m.any():
                continue
            cand = dist[a[m]] + w[m]
            order, uniq, starts = _group_structure(b[m].astype(np.int64))
            outs_i.append(uniq)
            outs_v.append(np.minimum.reduceat(cand[order], starts))
        if not outs_i:
            z = np.empty(0, np.int64)
            return z, np.empty(0, np.float64)
        return np.concatenate(outs_i), np.concatenate(outs_v)

    # ------------------------------------------------------------------
    # Louvain support: community contraction + intra-community weight
    # ------------------------------------------------------------------
    def contract_edges(self, comm: np.ndarray):
        """Contract this shard's edges by community: pre-aggregated
        (packed(lo,hi), weight) with lo/hi = canonical community pair
        (self-loops kept — internal weight)."""
        if len(comm) and int(comm.max()) >= (1 << 32):
            # the (lo<<32)|hi packing is only valid for labels < 2^32;
            # beyond that the caller must switch to a two-column int64 key
            raise OverflowError(
                "contract_edges: community labels exceed 2^32 — packed "
                "uint64 keys would collide"
            )
        cs = comm[self.si].astype(np.uint64)
        cd = comm[self.di].astype(np.uint64)
        lo = np.minimum(cs, cd)
        hi = np.maximum(cs, cd)
        packed = (lo << np.uint64(32)) | hi
        w = self.w if self.w is not None else np.ones(len(packed))
        uniq, inv = np.unique(packed, return_inverse=True)
        return uniq, np.bincount(inv, weights=w, minlength=len(uniq))

    def intra_weight(self, comm: np.ndarray):
        """(community, Σ weight of edges inside it) for this shard."""
        m = comm[self.si] == comm[self.di]
        if not m.any():
            z = np.empty(0, np.int64)
            return z, np.empty(0, np.float64)
        c = comm[self.si[m]]
        w = self.w[m] if self.w is not None else np.ones(int(m.sum()))
        order, uniq, starts = _group_structure(c)
        return uniq, np.add.reduceat(w[order], starts)

    # ------------------------------------------------------------------
    # Borůvka round: per-component min outgoing edge candidates
    # ------------------------------------------------------------------
    def boruvka_candidates(self, comp: np.ndarray, sign: float):
        """Shared kernel over this shard's edges (see
        boruvka_candidate_kernel)."""
        return boruvka_candidate_kernel(self.si, self.di, self.w, comp, sign)

    # ------------------------------------------------------------------
    # InfoMap support: symmetric flow votes — per (vertex, neighbor
    # community), Σ F_ij with F_ij = w_ij·(A_i + A_j)/2 (A = visit
    # probability / weighted out-degree)
    # ------------------------------------------------------------------
    def flow_votes(self, comm: np.ndarray, A: np.ndarray):
        w = self.w if self.w is not None else np.ones(len(self.si))
        f = w * (A[self.si] + A[self.di]) * 0.5
        tgt = np.concatenate([self.si.astype(np.int64), self.di.astype(np.int64)])
        cand = np.concatenate([comm[self.di], comm[self.si]])
        ff = np.concatenate([f, f])
        order = np.lexsort((cand, tgt))
        t_s, c_s, f_s = tgt[order], cand[order], ff[order]
        if not len(t_s):
            z = np.empty(0, np.int64)
            return z, z, np.empty(0, np.float64)
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(first)
        return t_s[starts], c_s[starts], np.add.reduceat(f_s, starts)

    # ------------------------------------------------------------------
    # LPA round: per (dst, src_label) weight sum, undirected
    # ------------------------------------------------------------------
    def lpa_votes(self, labels: np.ndarray, weighted: bool, directed: bool):
        if directed:
            tgt, lab = self.di, labels[self.si]
            w = (
                self.w
                if (weighted and self.w is not None)
                else np.ones(len(tgt), dtype=np.float64)
            )
        else:
            w1 = (
                self.w
                if (weighted and self.w is not None)
                else np.ones(len(self.si), dtype=np.float64)
            )
            tgt = np.concatenate([self.di, self.si])
            lab = np.concatenate([labels[self.si], labels[self.di]])
            w = np.concatenate([w1, w1])
        # group by (tgt, lab) pair
        order = np.lexsort((lab, tgt))
        t_s, l_s, w_s = tgt[order], lab[order], w[order]
        if not len(t_s):
            z = np.empty(0, dtype=np.int64)
            return z, z, np.empty(0, dtype=np.float64)
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(first)
        return t_s[starts], l_s[starts], np.add.reduceat(w_s, starts)

    # ------------------------------------------------------------------
    # greedy-coloring round: two decomposable partials per target
    # ------------------------------------------------------------------
    def coloring_partials(
        self, colors: np.ndarray, prio: np.ndarray, W: int, dense_n: int
    ):
        """One Jones-Plassmann round, shard partial (undirected — both
        orientations swept): per target, (a) the max priority among
        UNCOLORED neighbors (max-fold, -1 when none) and (b) the OR of
        colored neighbors' color bitmasks ((dense_n, W) uint64,
        or-fold). Colors are < 64·W by the caller's degree-derived
        sizing."""
        maxp = np.full(dense_n, -1, dtype=np.int64)
        mask = np.zeros((dense_n, W), dtype=np.uint64)
        for a, b in ((self.si, self.di), (self.di, self.si)):
            nc = colors[a]
            unc = nc < 0
            if unc.any():
                np.maximum.at(maxp, b[unc], prio[a[unc]])
            col_t = b[~unc]
            col_c = nc[~unc]
            if len(col_t):
                np.bitwise_or.at(
                    mask,
                    (col_t, col_c >> 6),
                    np.uint64(1) << (col_c & 63).astype(np.uint64),
                )
        return maxp, mask

    def coloring_partials_split(
        self, colors: np.ndarray, prio: np.ndarray, W: int, cuts: np.ndarray
    ):
        """``coloring_partials`` split at range cuts — invoke with
        ``num_returns=len(cuts)-1`` so each (maxp, mask) slice flows
        straight to its range fold task (the k-core range-split
        pattern: the driver never ingests the S×n×(1+W) partials)."""
        maxp, mask = self.coloring_partials(colors, prio, W, int(cuts[-1]))
        pieces = [
            (maxp[cuts[r] : cuts[r + 1]], mask[cuts[r] : cuts[r + 1]])
            for r in range(len(cuts) - 1)
        ]
        return pieces[0] if len(pieces) == 1 else tuple(pieces)


def _fold_hindex(
    key_parts: list, cnt_parts: list, base_vals: np.ndarray, lo: int
) -> np.ndarray:
    """Fold per-shard (key, cnt) histogram partials (key =
    tgt<<32 | clipped_val) and reduce each target's descending
    distinct-value cumulative counts to its h-index. ``base_vals`` is
    the slice of current values covering targets [lo, lo+len); targets
    with no rows keep their value. Pure numpy, shared by the driver
    fold and the range-split fold tasks."""
    out = base_vals.copy()
    key = np.concatenate(key_parts) if key_parts else np.empty(0, np.int64)
    if not len(key):
        return out
    cnt = np.concatenate(cnt_parts)
    order = np.argsort(key, kind="stable")
    key, cnt = key[order], cnt[order]
    new_k = np.empty(len(key), dtype=bool)
    new_k[0] = True
    new_k[1:] = key[1:] != key[:-1]
    starts_k = np.flatnonzero(new_k)
    tot = np.add.reduceat(cnt, starts_k)
    key = key[starts_k]
    tgt = (key >> np.int64(32)).astype(np.int64)
    val = (key & np.int64(0xFFFFFFFF)).astype(np.int64)
    # per target: distinct values DESC, cumulative ge-counts,
    # h = max(min(value, ge_count))
    order = np.lexsort((-val, tgt))
    tgt, val, tot = tgt[order], val[order], tot[order]
    gstart = np.flatnonzero(np.concatenate(([True], tgt[1:] != tgt[:-1])))
    cs = np.cumsum(tot)
    base = np.repeat(
        cs[gstart] - tot[gstart], np.diff(np.append(gstart, len(tgt)))
    )
    ge = cs - base
    cand = np.minimum(val, ge)
    h = np.maximum.reduceat(cand, gstart)
    out[tgt[gstart] - lo] = h
    return out


@ray.remote
def _hindex_fold_range(lo: int, hi: int, vals_ref, *parts):
    """Range fold task for the >10M-edge k-core path: receives each
    shard's [lo, hi) slice of its sorted histogram partial, folds and
    returns the updated value slice — the driver only ever ingests the
    R concatenated h-slices (O(n) total), never the histograms."""
    vals = vals_ref if isinstance(vals_ref, np.ndarray) else ray.get(vals_ref)
    return _fold_hindex(
        [p[0] for p in parts], [p[1] for p in parts], vals[lo:hi], lo
    )


class ShardedGraph:
    """Actor pool holding the edge table, one shard per actor."""

    def __init__(self, actors: list, num_edges: int, n: int):
        self.actors = actors
        self.m = num_edges
        self.n = n
        self._degree_cache: dict = {}  # (direction, weighted) → np.ndarray

    # Above this vertex count, per-shard partials return sparse
    # (uniq, values) pairs instead of dense length-n vectors — bounds
    # per-round transfer at S × min(n, |shard edges|) rows either way.
    DENSE_MAX_N = 4_000_000

    @staticmethod
    def from_graph(
        graph,
        num_shards: Optional[int] = None,
        threads: Optional[int] = None,
    ) -> "ShardedGraph":
        # (ref, num_rows) per block, then contiguous row spans per shard —
        # shard count is independent of physical block count/sizing.
        blocks: list = []
        for bundle in graph.edges.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                blocks.append((ref, int(meta.num_rows or 0)))
        total = sum(nr for _, nr in blocks)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if num_shards is None:
            # ~1M edges per shard floor: below that, actor cold-start +
            # per-round RPC overhead outweigh the extra parallelism.
            # Big graphs use HALF as many actors × 2 threads each —
            # same core coverage, half the per-round RPC fan-out.
            num_shards = max(1, min(cpus, max(1, total // 1_000_000)))
            if threads is None and num_shards == cpus and cpus >= 8:
                num_shards = cpus // 2
                threads = 2
        if threads is None:
            threads = 1
        num_shards = max(1, num_shards)
        cuts = np.linspace(0, total, num_shards + 1).astype(np.int64)
        spans: list[list] = [[] for _ in range(num_shards)]
        pos = 0
        for ref, nr in blocks:
            for s in range(num_shards):
                lo, hi = max(pos, cuts[s]), min(pos + nr, cuts[s + 1])
                if hi > lo:
                    spans[s].append((ref, int(lo - pos), int(hi - lo)))
            pos += nr
        Shard = ray.remote(_EdgeShard)
        actors = [
            Shard.remote(spans[i], graph.weighted, threads)
            for i in range(num_shards)
        ]
        loaded = sum(ray.get([a.ready.remote() for a in actors]))
        return ShardedGraph(actors, loaded, graph.n)

    # ------------------------------------------------------------------
    # driver-side folds over the per-shard partials
    # ------------------------------------------------------------------
    @property
    def _dense_n(self) -> Optional[int]:
        return self.n if self.n <= self.DENSE_MAX_N else None

    def _fold_sum(self, futs) -> np.ndarray:
        if self._dense_n is not None:
            return np.sum(ray.get(futs), axis=0)
        out = np.zeros(self.n, dtype=np.float64)
        for uniq, sums in ray.get(futs):
            np.add.at(out, uniq, sums)
        return out

    def degree(self, direction: str, weighted: bool = False) -> np.ndarray:
        """Memoized on the pool (the graph is immutable): every kernel
        that starts with a degree pass reuses the first computation."""
        key = (direction, weighted)
        if key not in self._degree_cache:
            futs = [
                a.degree_partial.remote(direction, weighted, self._dense_n)
                for a in self.actors
            ]
            self._degree_cache[key] = self._fold_sum(futs)
        return self._degree_cache[key]

    def scatter_sum(
        self,
        vec: np.ndarray,
        mul: Optional[np.ndarray] = None,
        weighted: bool = False,
        reverse: bool = False,
    ) -> np.ndarray:
        """Σ over in-edges of (vec·mul)[src] (·w). The multiplier is
        folded into the broadcast vector on the driver — O(n) — so each
        shard performs a single O(m/P) gather. ``reverse=True`` sums
        over OUT-edges instead (dst-gathered, src-scattered — the
        transposed propagation HITS' hub update needs)."""
        if mul is not None:
            vec = vec * mul
        vec_ref = ray.put(vec)
        futs = [
            a.scatter_sum.remote(vec_ref, weighted, self._dense_n, reverse)
            for a in self.actors
        ]
        return self._fold_sum(futs)

    def hindex_round(
        self, vals: np.ndarray, changed: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """One k-core h-operator round over the pool: shards return
        per-target clipped-value histograms (``hindex_partial``), the
        driver folds them by key and reduces each target's descending
        distinct-value cumulative counts to its h-index — O(fold rows)
        numpy, no Python loop. Targets with no edges keep their value
        (coreness 0 from a degree-0 init).

        ``changed`` (mask of vertices whose value moved LAST round)
        turns on frontier filtering: one cheap OR-fold pass marks the
        targets whose inputs can have moved, and only those emit
        histograms — all others provably keep their value. On sparse
        graphs the frontier collapses after 2-3 rounds, shrinking the
        per-round fold from Σ_v min(deg, core) rows to the active
        neighborhood; on dense near-clique graphs (the degenerate
        case) most vertices stay active most rounds and the filter
        only costs the O(m/P) marking pass."""
        if changed is not None:
            if not changed.any():
                # post-fixpoint round (fixed_rounds past convergence):
                # no input moved, so no h can move — skip the O(m)
                # marking fan-out entirely
                return vals.copy()
            c_ref = ray.put(changed)
            acts = ray.get(
                [
                    a.active_targets_partial.remote(c_ref, len(vals))
                    for a in self.actors
                ]
            )
            active = changed.copy()
            for m in acts:
                if m.dtype == np.bool_:
                    active |= m
                else:  # sparse index form
                    active[m] = True
            if not active.any():
                return vals.copy()
            a_ref = ray.put(active)
        else:
            active, a_ref = None, None
        v_ref = ray.put(vals)
        # Above this edge count the per-round fold (Σ_v distinct
        # clipped values — up to tens of GB·rounds on dense graphs)
        # would serialize through the driver; range-split it across
        # fold TASKS instead (each shard's sorted partial is sliced by
        # target range with searchsorted and flows straight to its
        # fold task; the driver ingests only the R h-slices, O(n)).
        if self.m >= 10_000_000 and len(self.actors) > 1:
            R = max(2, len(self.actors))
            cuts = np.linspace(0, self.n, R + 1).astype(np.int64)
            c_ref = ray.put(cuts)
            futs = [
                a.hindex_partial_split.options(num_returns=R).remote(
                    v_ref, a_ref, c_ref
                )
                for a in self.actors
            ]
            fold_futs = [
                _hindex_fold_range.remote(
                    int(cuts[r]), int(cuts[r + 1]), v_ref,
                    *[futs[s][r] for s in range(len(self.actors))]
                )
                for r in range(R)
            ]
            return np.concatenate(ray.get(fold_futs))
        futs = [a.hindex_partial.remote(v_ref, a_ref) for a in self.actors]
        parts = ray.get(futs)
        return _fold_hindex(
            [p[0] for p in parts], [p[1] for p in parts], vals, 0
        )

    def coloring_round(
        self, colors: np.ndarray, prio: np.ndarray, W: int
    ) -> tuple:
        """One greedy-coloring round over the pool: max-fold of the
        uncolored-neighbor priorities and or-fold of the neighbor
        color bitmasks (both decomposable; O(n·(1+W)) driver ingest —
        dense-path only, the caller gates on DENSE_MAX_N)."""
        c_ref, p_ref = ray.put(colors), ray.put(prio)
        futs = [
            a.coloring_partials.remote(c_ref, p_ref, W, self.n)
            for a in self.actors
        ]
        parts = ray.get(futs)
        maxp = np.maximum.reduce([p[0] for p in parts])
        mask = np.bitwise_or.reduce([p[1] for p in parts])
        return maxp, mask

    def min_round(self, labels: np.ndarray, use_star: bool = True) -> np.ndarray:
        lab_ref = ray.put(labels)
        futs = [
            a.min_round.remote(lab_ref, use_star, self._dense_n) for a in self.actors
        ]
        if self._dense_n is not None:
            return np.minimum(labels, np.minimum.reduce(ray.get(futs)))
        out = labels.copy()
        for uniq, mins in ray.get(futs):
            np.minimum.at(out, uniq, mins)
        return out

    def fwd_min(self, color: np.ndarray, active: np.ndarray) -> np.ndarray:
        c_ref, a_ref = ray.put(color), ray.put(active)
        futs = [a.fwd_min.remote(c_ref, a_ref) for a in self.actors]
        out = color.copy()
        for uniq, mins in ray.get(futs):
            np.minimum.at(out, uniq, mins)
        return out

    def bwd_reach(self, reached: np.ndarray, color: np.ndarray) -> np.ndarray:
        r_ref, c_ref = ray.put(reached), ray.put(color)
        futs = [a.bwd_reach.remote(r_ref, c_ref) for a in self.actors]
        new = reached.copy()
        for uniq in ray.get(futs):
            new[uniq] = True
        return new

    def relax(
        self,
        dist: np.ndarray,
        frontier: np.ndarray,
        w_cap: Optional[float] = None,
        heavy: bool = False,
        undirected: bool = False,
    ) -> np.ndarray:
        """One relaxation sweep: min-fold of per-shard candidate
        distances into a copy of ``dist``."""
        d_ref, f_ref = ray.put(dist), ray.put(frontier)
        futs = [
            a.relax.remote(d_ref, f_ref, w_cap, heavy, undirected)
            for a in self.actors
        ]
        out = dist.copy()
        for uniq, mins in ray.get(futs):
            np.minimum.at(out, uniq, mins)
        return out

    def contract_edges(self, comm: np.ndarray):
        """Community-contracted edge arrays (c_lo, c_hi, weight) folded
        across shards — the Louvain coarsening step as a pre-aggregated
        exchange (rows bounded by distinct community pairs, not edges)."""
        comm_ref = ray.put(comm)
        futs = [a.contract_edges.remote(comm_ref) for a in self.actors]
        parts = ray.get(futs)
        packed = np.concatenate([p[0] for p in parts])
        w = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(packed, return_inverse=True)
        ws = np.bincount(inv, weights=w, minlength=len(uniq))
        return (
            (uniq >> np.uint64(32)).astype(np.int64),
            (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            ws,
        )

    def intra_weight(self, comm: np.ndarray) -> np.ndarray:
        """Dense per-community Σ internal edge weight."""
        comm_ref = ray.put(comm)
        futs = [a.intra_weight.remote(comm_ref) for a in self.actors]
        out = np.zeros(self.n, dtype=np.float64)
        for uniq, sums in ray.get(futs):
            np.add.at(out, uniq, sums)
        return out

    def boruvka_candidates(self, comp: np.ndarray, sign: float = 1.0):
        """Fold per-shard min-outgoing-edge candidates; None when the
        forest is complete (no cross-component edges anywhere)."""
        comp_ref = ray.put(comp)
        futs = [a.boruvka_candidates.remote(comp_ref, sign) for a in self.actors]
        parts = [p for p in ray.get(futs) if p is not None]
        if not parts:
            return None
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
            np.concatenate([p[3] for p in parts]),
        )

    def flow_votes(self, comm: np.ndarray, A: np.ndarray):
        """Folded symmetric-flow triples (vertex, neighbor community,
        Σ flow) across shards (InfoMap local moving)."""
        c_ref, a_ref = ray.put(comm), ray.put(A)
        futs = [a.flow_votes.remote(c_ref, a_ref) for a in self.actors]
        parts = ray.get(futs)
        tgt = np.concatenate([p[0] for p in parts])
        cand = np.concatenate([p[1] for p in parts])
        f = np.concatenate([p[2] for p in parts])
        if not len(tgt):
            return tgt, cand, f
        order = np.lexsort((cand, tgt))
        t_s, c_s, f_s = tgt[order], cand[order], f[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(first)
        return t_s[starts], c_s[starts], np.add.reduceat(f_s, starts)

    def vote_triples(
        self, labels: np.ndarray, weighted: bool = False, directed: bool = False
    ):
        """Raw folded (vertex, label, weight) vote triples across shards
        (used by Louvain's gain evaluation; lpa_round is argmax of this)."""
        lab_ref = ray.put(labels)
        futs = [a.lpa_votes.remote(lab_ref, weighted, directed) for a in self.actors]
        parts = ray.get(futs)
        tgt = np.concatenate([p[0] for p in parts]).astype(np.int64)
        lab = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        if not len(tgt):
            return tgt, lab, w
        order = np.lexsort((lab, tgt))
        t_s, l_s, w_s = tgt[order], lab[order], w[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(first)
        return t_s[starts], l_s[starts], np.add.reduceat(w_s, starts)

    def lpa_round(
        self, labels: np.ndarray, weighted: bool = False, directed: bool = False
    ) -> np.ndarray:
        """One synchronous LPA round: argmax vote (tie → min label)."""
        lab_ref = ray.put(labels)
        futs = [a.lpa_votes.remote(lab_ref, weighted, directed) for a in self.actors]
        parts = ray.get(futs)
        tgt = np.concatenate([p[0] for p in parts])
        lab = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        if not len(tgt):
            return labels.copy()
        # fold duplicate (tgt, lab) across shards, then argmax per tgt
        order = np.lexsort((lab, tgt))
        t_s, l_s, w_s = tgt[order], lab[order], w[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(first)
        t_g, l_g = t_s[starts], l_s[starts]
        w_g = np.add.reduceat(w_s, starts)
        # argmax weight per tgt, tie-break min label: sort by
        # (tgt, -weight, label) and take the first row per tgt
        order2 = np.lexsort((l_g, -w_g, t_g))
        t_o, l_o = t_g[order2], l_g[order2]
        keep = np.ones(len(t_o), dtype=bool)
        keep[1:] = t_o[1:] != t_o[:-1]
        out = labels.copy()
        out[t_o[keep]] = l_o[keep]
        return out


# ----------------------------------------------------------------------
# Range-sharded per-vertex vectors — the multi-node ceiling upgrade
# ----------------------------------------------------------------------
class _RangeOwner:
    """Owns one contiguous vertex range [lo, hi) of the per-vertex state
    vector. Per round it emits its (premultiplied) slice into plasma and
    folds the per-shard partial PIECES addressed to it — partials flow
    edge-shard → range-owner through the object store without ever
    landing on the driver; the driver only routes ObjectRefs (O(S·R)
    refs/round) and folds scalar convergence metrics (O(R))."""

    def __init__(self, lo: int, hi: int):
        self.lo = int(lo)
        self.hi = int(hi)
        self.vec: Optional[np.ndarray] = None
        self.mul: Optional[np.ndarray] = None

    def init_vec(self, value: float) -> bool:
        self.vec = np.full(self.hi - self.lo, value, dtype=np.float64)
        return True

    def set_vec(self, arr: np.ndarray) -> bool:
        self.vec = np.asarray(arr).copy()
        return True

    def set_mul(self, mul_slice: np.ndarray) -> bool:
        self.mul = np.asarray(mul_slice)
        return True

    def premult(self) -> np.ndarray:
        return self.vec * self.mul if self.mul is not None else self.vec.copy()

    def pagerank_update(self, alpha: float, d: float, *pieces) -> float:
        acc = (
            np.sum(np.stack(pieces), axis=0)
            if len(pieces) > 1
            else np.asarray(pieces[0], dtype=np.float64)
        )
        new = alpha + d * acc
        delta = float(np.abs(new - self.vec).sum())
        self.vec = new
        return delta

    def lpa_update(self, *pieces) -> int:
        """One synchronous LPA round for this range: fold the per-shard
        (tgt, lab, w) vote triples addressed here, argmax summed weight
        per vertex (tie → min label), adopt; vertices with no votes keep
        their label. Returns the changed count (the only thing the
        driver sees)."""
        parts = [p for p in pieces if len(p[0])]
        if not parts:
            return 0
        tgt = np.concatenate([p[0] for p in parts]) - self.lo
        lab = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        order = np.lexsort((lab, tgt))
        t_s, l_s, w_s = tgt[order], lab[order], w[order]
        first = np.ones(len(t_s), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(first)
        t_g, l_g = t_s[starts], l_s[starts]
        w_g = np.add.reduceat(w_s, starts)
        order2 = np.lexsort((l_g, -w_g, t_g))
        t_o, l_o = t_g[order2], l_g[order2]
        keep = np.ones(len(t_o), dtype=bool)
        keep[1:] = t_o[1:] != t_o[:-1]
        new = self.vec.copy()
        new[t_o[keep]] = l_o[keep]
        changed = int((new != self.vec).sum())
        self.vec = new
        return changed

    def min_update(self, *pieces) -> int:
        cand = np.minimum.reduce(np.stack(pieces)) if len(pieces) > 1 else pieces[0]
        new = np.minimum(self.vec, cand)
        changed = int((new != self.vec).sum())
        self.vec = new
        return changed

    def get_vec(self) -> np.ndarray:
        return self.vec


class RangeEngine:
    """Round protocol over range owners + edge shards (see _RangeOwner).
    Vertex state never concentrates: each owner holds O(n/R), each edge
    shard materializes the O(n) premultiplied vector transiently from
    the owners' plasma slices (the same working-set envelope the shard
    already needs for its gathers)."""

    def __init__(self, sharded: "ShardedGraph", num_ranges: Optional[int] = None):
        self.sg = sharded
        R = num_ranges or max(1, min(len(sharded.actors), max(1, sharded.n // 4096)))
        self.cuts = np.linspace(0, sharded.n, R + 1).astype(np.int64)
        Owner = ray.remote(_RangeOwner)
        self.owners = [
            Owner.remote(self.cuts[r], self.cuts[r + 1]) for r in range(R)
        ]

    @property
    def num_ranges(self) -> int:
        return len(self.owners)

    def set_vector(self, value: Optional[float] = None, arr: Optional[np.ndarray] = None):
        if arr is not None:
            futs = [
                o.set_vec.remote(arr[self.cuts[r] : self.cuts[r + 1]])
                for r, o in enumerate(self.owners)
            ]
        else:
            futs = [o.init_vec.remote(value) for o in self.owners]
        ray.get(futs)

    def set_multiplier(self, mul: np.ndarray):
        ray.get(
            [
                o.set_mul.remote(mul[self.cuts[r] : self.cuts[r + 1]])
                for r, o in enumerate(self.owners)
            ]
        )

    def _round_refs(self, method: str, weighted: bool, thr=None):
        """One scatter round: returns piece_refs[s][r] without fetching."""
        R = self.num_ranges
        slice_refs = [o.premult.remote() for o in self.owners]
        piece_refs = []
        for a in self.sg.actors:
            if method == "scatter":
                fut = a.scatter_split.options(num_returns=R).remote(
                    self.cuts, weighted, *slice_refs
                )
            else:
                fut = a.min_split.options(num_returns=R).remote(
                    self.cuts, thr, *slice_refs
                )
            piece_refs.append(fut if R > 1 else [fut])
        return piece_refs

    def pagerank_round(self, alpha: float, d: float, weighted: bool) -> float:
        piece_refs = self._round_refs("scatter", weighted)
        delta_futs = [
            o.pagerank_update.remote(
                alpha, d, *[piece_refs[s][r] for s in range(len(piece_refs))]
            )
            for r, o in enumerate(self.owners)
        ]
        return float(sum(ray.get(delta_futs)))

    def lpa_round(self, weighted: bool = False, directed: bool = False) -> int:
        """One synchronous LPA round across owners: label slices flow
        owner→shard, folded vote-triple pieces shard→owner, the driver
        folds R changed-counts."""
        R = self.num_ranges
        slice_refs = [o.get_vec.remote() for o in self.owners]
        piece_refs = []
        for a in self.sg.actors:
            fut = a.lpa_votes_split.options(num_returns=R).remote(
                self.cuts, weighted, directed, *slice_refs
            )
            piece_refs.append(fut if R > 1 else [fut])
        futs = [
            o.lpa_update.remote(*[piece_refs[s][r] for s in range(len(piece_refs))])
            for r, o in enumerate(self.owners)
        ]
        return int(sum(ray.get(futs)))

    def min_round(self, thr=None) -> int:
        piece_refs = self._round_refs("min", weighted=False, thr=thr)
        futs = [
            o.min_update.remote(*[piece_refs[s][r] for s in range(len(piece_refs))])
            for r, o in enumerate(self.owners)
        ]
        return int(sum(ray.get(futs)))

    def collect(self) -> np.ndarray:
        """Gather the full vector (O(n)) — final result / checkpoints only."""
        parts = ray.get([o.get_vec.remote() for o in self.owners])
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.float64)
