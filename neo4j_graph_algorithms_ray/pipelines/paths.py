"""Path / traversal kernels — BFS, SSSP, MSBFS, closeness variants.

- ``bfs_depths`` — unweighted single-source depths as dense frontier
  rounds (the dataflow of the reference's traversal utilities).
- ``sssp`` — weighted single-source shortest paths as distributed
  Bellman-Ford rounds: ``dist' = min(dist, min_{u→v}(dist[u]+w))`` to
  fixpoint. This is the frontier-relaxation semantics of the
  reference's delta-stepping (``algo/.../impl/ShortestPathDeltaStepping.java``)
  without the bucket ordering (buckets only change scheduling, not the
  fixpoint); Dijkstra (``algo/.../impl/ShortestPathDijkstra.java``)
  agrees on non-negative weights and serves as the test oracle.
- ``msbfs`` — multi-source BFS, 64 sources per round batch encoded as a
  uint64 visit bitmask per vertex (reference
  ``core/.../utils/msbfs/MultiSourceBFS.java``, Then et al. VLDB 2015):
  per round ``mask'[v] = OR_{u→v} frontier[u] & ~seen[v]``, the OR
  running as map-side pre-aggregated partials over edge blocks.
- ``closeness`` / ``harmonic`` / ``dangalchev`` centralities
  (reference ``algo/.../impl/closeness/MSClosenessCentrality.java``,
  ``HarmonicCentrality.java``, ``DangalchevClosenessCentrality.java``)
  accumulate per-depth farness terms from MSBFS waves:
  closeness(v) = (n−1)/Σ depth, harmonic(v) = Σ 1/depth / (n−1),
  dangalchev(v) = Σ 1/2^depth; all over INCOMING wave counts, i.e. how
  many sources reached v at each depth. Full all-sources centrality is
  O(n·m/64) — run it on projected subgraphs, or pass ``sources`` for
  the sampled variant.
- ``betweenness`` — Brandes 2001 (reference
  ``algo/.../impl/betweenness/BetweennessCentrality.java`` and the
  RA-Brandes sampled variant ``RABrandesBetweennessCentrality.java``):
  per-source BFS + backward dependency accumulation runs INSIDE each
  task over a broadcast CSR (O(m) object-store share, the same envelope
  as the dense vectors); sources fan out via ``map_batches`` and the
  per-vertex partial dependency vectors combine by dense sum.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.dense import group_min, group_sum, scatter_combine
from ..state.graph import GraphTables


# ----------------------------------------------------------------------
# single-source BFS / Bellman-Ford SSSP
# ----------------------------------------------------------------------
def bfs_depths(graph: GraphTables, source_vid: int, directed: bool = True) -> np.ndarray:
    """Dense int64 depth per vertex from ``source_vid`` (−1 unreachable)."""
    n = graph.n
    s = int(np.searchsorted(graph.vids, source_vid))
    if s >= n or graph.vids[s] != source_vid:
        raise KeyError(f"source vid {source_vid} not in graph")
    edges = graph.edges if directed else graph.edges_both()
    depth = np.full(n, -1, dtype=np.int64)
    depth[s] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[s] = True
    d = 0
    while frontier.any():
        f_ref = ray.put(frontier)
        v_ref = ray.put(depth >= 0)

        def partial(batch: pa.Table, _f=f_ref, _v=v_ref) -> pa.Table:
            si = batch["si"].to_numpy(zero_copy_only=False)
            di = batch["di"].to_numpy(zero_copy_only=False)
            fr = ray.get(_f)
            vis = ray.get(_v)
            m = fr[si] & ~vis[di]
            idx = np.unique(di[m])
            return pa.table({"idx": idx, "val": np.ones(len(idx), np.int64)})

        hits = scatter_combine(
            edges, partial, n, op="max", init=np.zeros(n, np.int64), dtype=np.int64
        )
        new = (hits > 0) & (depth < 0)
        d += 1
        depth[new] = d
        frontier = new
    return depth


@dataclass
class SsspResult:
    distances: np.ndarray  # float64, inf = unreachable
    rounds: int
    metrics: dict = field(default_factory=dict)


def sssp(graph: GraphTables, source_vid: int, directed: bool = True) -> SsspResult:
    """Weighted SSSP (non-negative weights) by Bellman-Ford rounds."""
    n = graph.n
    s = int(np.searchsorted(graph.vids, source_vid))
    if s >= n or graph.vids[s] != source_vid:
        raise KeyError(f"source vid {source_vid} not in graph")
    edges = graph.edges if directed else graph.edges_both()
    weighted = graph.weighted
    dist = np.full(n, np.inf)
    dist[s] = 0.0
    rounds = 0
    while True:
        d_ref = ray.put(dist)

        def partial(batch: pa.Table, _d=d_ref, _w=weighted) -> pa.Table:
            si = batch["si"].to_numpy(zero_copy_only=False)
            di = batch["di"].to_numpy(zero_copy_only=False)
            dv = ray.get(_d)
            w = (
                batch["w"].to_numpy(zero_copy_only=False)
                if _w
                else np.ones(len(si), dtype=np.float64)
            )
            cand = dv[si] + w
            ok = np.isfinite(cand)
            idx, mins = group_min(di[ok], cand[ok])
            return pa.table({"idx": idx, "val": mins})

        new = scatter_combine(
            edges, partial, n, op="min", init=dist.copy(), dtype=np.float64
        )
        rounds += 1
        if np.array_equal(new, dist, equal_nan=False) or np.allclose(
            new, dist, rtol=0, atol=0, equal_nan=True
        ):
            break
        dist = new
    return SsspResult(distances=dist, rounds=rounds)


def delta_stepping(
    graph: GraphTables,
    source_vid: int,
    delta: float = 1.0,
    directed: bool = True,
) -> SsspResult:
    """Delta-stepping SSSP (reference:
    ``algo.shortestPath.deltaStepping``,
    ``algo/.../impl/ShortestPathDeltaStepping.java`` — Meyer–Sanders
    bucketed parallel SSSP). Buckets of width Δ processed in order:
    light edges (w ≤ Δ) relaxed to fixpoint within the bucket, heavy
    edges (w > Δ) relaxed once on bucket settlement. Each relaxation is
    one pre-aggregated sweep over the stateful shard pool; matches
    Dijkstra exactly (tested for several Δ)."""
    n = graph.n
    s = int(np.searchsorted(graph.vids, source_vid))
    if s >= n or graph.vids[s] != source_vid:
        raise KeyError(f"source vid {source_vid} not in graph")
    sg = graph.sharded()
    undirected = not directed
    dist = np.full(n, np.inf)
    dist[s] = 0.0
    rounds = 0
    k = 0
    while True:
        lo, hi = k * delta, (k + 1) * delta
        in_bucket = (dist >= lo) & (dist < hi)
        if not in_bucket.any():
            # jump to the next non-empty bucket
            pending = dist[np.isfinite(dist) & (dist >= hi)]
            if not len(pending):
                break
            k = int(pending.min() // delta)
            continue
        frontier = in_bucket
        while frontier.any():
            new = sg.relax(dist, frontier, w_cap=delta, heavy=False,
                           undirected=undirected)
            rounds += 1
            improved = new < dist
            dist = new
            frontier = improved & (dist < hi)
        settled = (dist >= lo) & (dist < hi)
        if settled.any():
            new = sg.relax(dist, settled, w_cap=delta, heavy=True,
                           undirected=undirected)
            rounds += 1
            dist = new
        k += 1
    return SsspResult(distances=dist, rounds=rounds, metrics={"delta": delta})


def dijkstra_numpy_oracle(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n: int, s: int
) -> np.ndarray:
    """Heap Dijkstra oracle for tests (reference ShortestPathDijkstra)."""
    import heapq

    order = np.argsort(src, kind="stable")
    ss, dd, ww = src[order], dst[order], w[order]
    indptr = np.searchsorted(ss, np.arange(n + 1))
    dist = np.full(n, np.inf)
    dist[s] = 0.0
    h = [(0.0, s)]
    done = np.zeros(n, dtype=bool)
    while h:
        dv, v = heapq.heappop(h)
        if done[v]:
            continue
        done[v] = True
        for i in range(indptr[v], indptr[v + 1]):
            u = dd[i]
            nd = dv + ww[i]
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(h, (nd, int(u)))
    return dist


# ----------------------------------------------------------------------
# MSBFS + closeness family
# ----------------------------------------------------------------------
def _msbfs_bit_waves(
    graph: GraphTables,
    sources: np.ndarray,
    directed: bool = False,
):
    """Yield (batch_sources, depth, nz, bits) per BFS depth per ≤64-source
    batch: ``nz`` are the dense vertex ids first reached at ``depth`` and
    ``bits[i]`` the uint64 mask of which batch sources reached ``nz[i]``."""
    n = graph.n
    edges = graph.edges if directed else graph.edges_both()
    for lo in range(0, len(sources), 64):
        batch_sources = sources[lo : lo + 64]
        seen = np.zeros(n, dtype=np.uint64)
        frontier = np.zeros(n, dtype=np.uint64)
        for bit, s in enumerate(batch_sources):
            frontier[s] |= np.uint64(1 << bit)
        seen |= frontier
        depth = 0
        while frontier.any():
            f_ref = ray.put(frontier)

            def partial(batch: pa.Table, _f=f_ref) -> pa.Table:
                si = batch["si"].to_numpy(zero_copy_only=False)
                di = batch["di"].to_numpy(zero_copy_only=False)
                fr = ray.get(_f)
                m = fr[si] != 0
                if not m.any():
                    z = np.empty(0, np.int64)
                    return pa.table({"idx": z, "val": z})
                dsel = di[m]
                msel = fr[si[m]]
                uniq, inv = np.unique(dsel, return_inverse=True)
                acc = np.zeros(len(uniq), dtype=np.uint64)
                np.bitwise_or.at(acc, inv, msel)
                return pa.table(
                    {"idx": uniq, "val": acc.view(np.int64)}  # arrow-safe carrier
                )

            parts = edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
            acc = np.zeros(n, dtype=np.uint64)
            for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
                idx = b["idx"].to_numpy(zero_copy_only=False)
                val = b["val"].to_numpy(zero_copy_only=False).view(np.uint64)
                np.bitwise_or.at(acc, idx, val)
            newbits = acc & ~seen
            depth += 1
            if not newbits.any():
                break
            nz = np.flatnonzero(newbits)
            yield batch_sources, depth, nz, newbits[nz]
            seen |= newbits
            frontier = newbits


def msbfs_depth_waves(
    graph: GraphTables,
    sources: np.ndarray,
    directed: bool = False,
):
    """Yield (depth, new_bits_count_per_vertex) for successive BFS depths
    over ≤64-source batches (bitmask ANP). ``new_bits_count_per_vertex``
    is how many of the batch's sources first reached each vertex at that
    depth."""
    from ..stages.minhash import popcount64

    n = graph.n
    for _srcs, depth, nz, bits in _msbfs_bit_waves(graph, sources, directed):
        counts = np.zeros(n, dtype=np.int64)
        counts[nz] = popcount64(bits)
        yield depth, counts


def msbfs_depth_table(
    graph: GraphTables,
    sources: np.ndarray,
    directed: bool = False,
) -> pa.Table:
    """All-pairs BFS depths restricted to a source set: rows
    ``(source, vid, depth)`` with original vids, one row per (s, v)
    first reached at ``depth`` (the source itself is not emitted).
    Reference MSBFS all-shortest-paths surface
    (``core/.../msbfs/MultiSourceBFS.java`` ~L60 ANP traversal).
    Output is O(|sources| · n) rows — callers bound the source set the
    same way the sampled-closeness variants do."""
    vids = graph.vids
    out_s: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    for batch_sources, depth, nz, bits in _msbfs_bit_waves(graph, sources, directed):
        for bit, s in enumerate(batch_sources):
            hit = nz[(bits >> np.uint64(bit)) & np.uint64(1) == np.uint64(1)]
            if len(hit):
                out_s.append(np.full(len(hit), vids[s], dtype=np.int64))
                out_v.append(vids[hit])
                out_d.append(np.full(len(hit), depth, dtype=np.int64))
    if not out_s:
        z = np.empty(0, dtype=np.int64)
        return pa.table({"source": z, "vid": z, "depth": z})
    return pa.table(
        {
            "source": np.concatenate(out_s),
            "vid": np.concatenate(out_v),
            "depth": np.concatenate(out_d),
        }
    )


def closeness_table(
    graph: GraphTables,
    variant: str = "standard",  # standard | harmonic | dangalchev
    sources: Optional[np.ndarray] = None,
    directed: bool = False,
) -> pa.Table:
    n = graph.n
    if sources is None:
        sources = np.arange(n)
    farness = np.zeros(n, dtype=np.float64)
    for depth, counts in msbfs_depth_waves(graph, sources, directed=directed):
        if variant == "standard":
            farness += depth * counts
        elif variant == "harmonic":
            farness += counts / depth
        elif variant == "dangalchev":
            farness += counts / (2.0**depth)
        else:  # pragma: no cover
            raise ValueError(variant)
    if variant == "standard":
        with np.errstate(divide="ignore"):
            cent = np.where(farness > 0, (n - 1.0) / farness, 0.0)
    elif variant == "harmonic":
        cent = farness / max(n - 1.0, 1.0)
    else:
        cent = farness
    return graph.to_table({"centrality": cent})


# ----------------------------------------------------------------------
# betweenness (Brandes) — per-source tasks over broadcast CSR
# ----------------------------------------------------------------------
def weighted_allpairs_table(
    graph: GraphTables,
    sources: Optional[np.ndarray] = None,
    directed: bool = True,
    max_distance: Optional[float] = None,
) -> "rd.Dataset":
    """Weighted all-pairs shortest paths (reference
    ``algo.allShortestPaths.stream``, ``impl/AllShortestPaths.java``
    ~L60 — a thread pool of per-source Dijkstras; the unweighted case
    is covered by :func:`msbfs_depth_table`). Emits one row per finite
    (source, target) pair, target ≠ source:
    ``(source, target, distance)`` in original vid space.

    Dataflow: the weighted CSR (parallel edges deduped to min weight,
    matching Dijkstra semantics) is assembled ONCE in a worker task and
    shared via plasma; ``sources`` (dense indices; default all) fan out
    as Ray Data blocks, each task runs vectorized Bellman-Ford rounds
    per source — O(rounds·m) numpy scatter-mins, no per-edge Python.
    All-pairs is inherently O(|sources|·m); sample sources at scale
    (the reference's own guidance) or use :func:`delta_stepping` for
    one source. ``max_distance`` drops rows with longer distances
    (mirrors a cost-bounded recursive-SQL oracle exactly).
    """
    from ..state.csr import build_csr_ref
    from ..state.partitioning import cluster_cpus

    n = graph.n
    csr_ref = build_csr_ref(
        graph, directed=directed, weighted=True, dedup_parallel_min=True
    )
    if sources is None:
        sources = np.arange(n)
    sources = np.asarray(sources, dtype=np.int64)
    vids_ref = ray.put(graph.vids)
    src_ds = rd.from_arrow(pa.table({"s": sources}))

    def partial(
        batch: pa.Table, _csr=csr_ref, _vids=vids_ref, _n=n, _cap=max_distance
    ) -> pa.Table:
        ip, nb, w = ray.get(_csr)
        vids = ray.get(_vids)
        si = np.repeat(np.arange(_n, dtype=np.int64), np.diff(ip))
        out_s, out_t, out_d = [], [], []
        for s in batch["s"].to_numpy(zero_copy_only=False):
            dist = np.full(_n, np.inf)
            dist[int(s)] = 0.0
            while True:
                cand = dist[si] + w
                ok = cand < dist[nb]
                if not ok.any():
                    break
                idx, mins = group_min(nb[ok], cand[ok])
                new = dist.copy()
                new[idx] = np.minimum(new[idx], mins)
                dist = new
            t = np.flatnonzero(np.isfinite(dist))
            t = t[t != int(s)]
            d = dist[t]
            if _cap is not None:
                keep = d <= _cap
                t, d = t[keep], d[keep]
            out_s.append(np.full(len(t), vids[int(s)], dtype=np.int64))
            out_t.append(vids[t].astype(np.int64))
            out_d.append(d)
        if not out_s:
            return pa.table(
                {
                    "source": np.empty(0, np.int64),
                    "target": np.empty(0, np.int64),
                    "distance": np.empty(0, np.float64),
                }
            )
        return pa.table(
            {
                "source": np.concatenate(out_s),
                "target": np.concatenate(out_t),
                "distance": np.concatenate(out_d),
            }
        )

    width = max(1, min(len(sources), 4 * cluster_cpus()))
    return src_ds.repartition(width).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )


def _expand_frontier(indptr, nbrs, frontier: np.ndarray):
    """Vectorized CSR slice-gather: (src, tgt) edge pairs leaving
    ``frontier`` — no per-vertex Python loop."""
    starts = indptr[frontier]
    counts = indptr[frontier + 1] - starts
    total = int(counts.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(total, dtype=np.int64) + np.repeat(starts - offsets, counts)
    return np.repeat(frontier, counts), nbrs[pos]


def _brandes_source(indptr, nbrs, s: int, n: int) -> np.ndarray:
    """Dependency accumulation for one source (Brandes 2001) —
    level-synchronous: BFS frontiers, sigma scatter-adds and the
    backward delta pass all run as whole-level numpy kernels."""
    sigma = np.zeros(n)
    sigma[s] = 1.0
    depth = np.full(n, -1, dtype=np.int64)
    depth[s] = 0
    frontier = np.array([s], dtype=np.int64)
    levels = [frontier]
    d = 0
    while True:
        src, tgt = _expand_frontier(indptr, nbrs, frontier)
        if not len(tgt):
            break
        fresh = depth[tgt] == -1
        depth[tgt[fresh]] = d + 1
        on_level = depth[tgt] == d + 1
        np.add.at(sigma, tgt[on_level], sigma[src[on_level]])
        frontier = np.unique(tgt[fresh])
        if not len(frontier):
            break
        levels.append(frontier)
        d += 1
    delta = np.zeros(n)
    for lvl in reversed(levels):
        src, tgt = _expand_frontier(indptr, nbrs, lvl)
        if not len(tgt):
            continue
        down = depth[tgt] == depth[src] + 1
        src, tgt = src[down], tgt[down]
        ok = sigma[tgt] > 0
        np.add.at(delta, src[ok], sigma[src[ok]] / sigma[tgt[ok]] * (1.0 + delta[tgt[ok]]))
    delta[s] = 0.0
    return delta


def betweenness_table(
    graph: GraphTables,
    directed: bool = True,
    sources: Optional[np.ndarray] = None,
    sample_probability: Optional[float] = None,
    seed: int = 42,
) -> pa.Table:
    """Exact (all sources) or RA-Brandes sampled betweenness."""
    from ..state.csr import build_csr_ref

    n = graph.n
    # CSR assembled in a worker task from the edge blocks (bounded
    # driver RSS); the plasma object is shared by every source task
    csr_ref = build_csr_ref(graph, directed=directed)

    scale = 1.0
    if sources is None:
        sources = np.arange(n)
        if sample_probability is not None and 0 < sample_probability < 1:
            rng = np.random.default_rng(seed)
            sources = sources[rng.random(n) < sample_probability]
            scale = n / max(len(sources), 1)

    src_ds = rd.from_arrow(pa.table({"s": sources.astype(np.int64)}))
    # split the source list into ~4 batches per CPU so the per-source
    # Brandes tasks actually fan out (a single-block source table would
    # otherwise run as ONE task)
    from ..state.partitioning import cluster_cpus

    n_src = len(sources)

    def partial(batch: pa.Table, _csr=csr_ref, _n=n) -> pa.Table:
        ip, nb = ray.get(_csr)
        total = np.zeros(_n)
        for s in batch["s"].to_numpy(zero_copy_only=False):
            total += _brandes_source(ip, nb, int(s), _n)
        idx = np.flatnonzero(total)
        return pa.table({"idx": idx.astype(np.int64), "val": total[idx]})

    cent = (
        scatter_combine(
            src_ds.repartition(max(1, min(n_src, 4 * cluster_cpus()))),
            partial,
            n,
            op="sum",
        )
        * scale
    )
    if not directed:
        cent = cent / 2.0
    return graph.to_table({"centrality": cent})
