"""Random walks and Yen's k-shortest paths.

- Random walk (reference [later-branch] ``algo.randomWalk.stream``,
  ``algo/.../NodeWalkerProc.java``): uniform random walks of fixed
  length from start vertices. Walkers fan out over a ``map_batches`` of
  the start-vertex Dataset; each task walks its batch to completion
  against the broadcast CSR (per SURVEY.md §2.5 P7 — the per-step
  frontier-join dataflow is the >broadcast-scale path). Seeded per
  (walk_id) so results are deterministic under any parallelism.

- Yen's k-shortest paths (reference ``algo.kShortestPaths``,
  ``algo/.../impl/yens/YensKShortestPaths.java``): loopless k shortest
  paths between two vertices via repeated Dijkstra with edge masking —
  inherently sequential, runs as a small-graph kernel in one process
  (the reference, too, runs it single-threaded per call); the result is
  an edge-shaped table (reference writes PATH_0..k−1 relationships).
"""

from __future__ import annotations

import hashlib
import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import GraphTables


def _csr(graph: GraphTables, directed: bool = True, dedup_parallel_min: bool = False):
    """(indptr, nbrs[, w]) over dense ids from the edge Dataset.

    ``dedup_parallel_min`` collapses parallel (u, v) edges to their
    minimum weight — required by Yen's, whose root-cost summation and
    spur-edge banning are keyed on the (u, v) pair, not the edge
    instance; on a multigraph the min-weight representative is the only
    edge a shortest loopless path can use anyway."""
    chunks = []
    for b in graph.edges.iter_batches(batch_format="pyarrow", batch_size=None):
        si = b["si"].to_numpy(zero_copy_only=False)
        di = b["di"].to_numpy(zero_copy_only=False)
        w = (
            b["w"].to_numpy(zero_copy_only=False)
            if "w" in b.column_names
            else np.ones(len(si))
        )
        chunks.append((si, di, w))
    if chunks:
        si = np.concatenate([c[0] for c in chunks])
        di = np.concatenate([c[1] for c in chunks])
        w = np.concatenate([c[2] for c in chunks])
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
    if dedup_parallel_min and len(si):
        first = np.empty(len(si), dtype=bool)
        first[0] = True
        first[1:] = (si[1:] != si[:-1]) | (di[1:] != di[:-1])
        grp = np.cumsum(first) - 1
        wmin = np.full(int(grp[-1]) + 1, np.inf)
        np.minimum.at(wmin, grp, w)
        si, di, w = si[first], di[first], wmin
    indptr = np.searchsorted(si, np.arange(graph.n + 1))
    return indptr, di, w


def _hash_u64(seed: int, walk_id: int, step: int) -> int:
    """Per-(walk, step) 64-bit uniform — big-endian sha256 prefix of
    "seed:walk_id:step". Hash-based instead of a seeded PRNG stream so
    each step is independently recomputable (any parallelism, resumable
    mid-walk) and the SQL oracle can reproduce walks exactly via
    ('0x'||substr(sha256(...),1,16))::UBIGINT."""
    key = f"{seed}:{walk_id}:{step}".encode()
    return int.from_bytes(hashlib.sha256(key).digest()[:8], "big")


def _pick_weighted(h: int, w_int: np.ndarray) -> int:
    """Index choice by integer cumulative weights: smallest j with
    cum[j] * 2^64 > h * total — exact integer arithmetic, mirrored by
    the SQL oracle's window-cumsum comparison."""
    cum = np.cumsum(w_int, dtype=np.int64)
    t = (h * int(cum[-1])) >> 64
    return int(np.searchsorted(cum, t, side="right"))


def random_walks(
    graph: GraphTables,
    start_vids: np.ndarray,
    steps: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
    directed: bool = False,
) -> "rd.Dataset":
    """(walk_id, step, vid) rows; a walk stops early at a dead end."""
    from ..state.csr import build_csr_ref

    csr_ref = build_csr_ref(graph, directed=directed, weighted=True)
    vids = graph.vids
    starts = np.searchsorted(vids, np.asarray(start_vids, dtype=np.int64))
    walk_ids = np.repeat(np.arange(len(starts) * walks_per_node), 1)
    starts_rep = np.tile(starts, walks_per_node)
    ds = rd.from_arrow(
        pa.table({"walk_id": walk_ids, "start": starts_rep})
    )
    vids_ref = graph.vids_ref

    def walk(batch: pa.Table, _steps=steps, _seed=seed) -> pa.Table:
        indptr, nbrs, _w = ray.get(csr_ref)
        vv = ray.get(vids_ref)
        out_id, out_step, out_vid = [], [], []
        for wid, cur in zip(
            batch["walk_id"].to_numpy(zero_copy_only=False),
            batch["start"].to_numpy(zero_copy_only=False),
        ):
            out_id.append(wid)
            out_step.append(0)
            out_vid.append(vv[cur])
            for s in range(1, _steps + 1):
                lo, hi = indptr[cur], indptr[cur + 1]
                if hi <= lo:
                    break
                h = _hash_u64(_seed, int(wid), s)
                cur = nbrs[lo + ((h * int(hi - lo)) >> 64)]
                out_id.append(wid)
                out_step.append(s)
                out_vid.append(vv[cur])
        return pa.table(
            {
                "walk_id": np.asarray(out_id, np.int64),
                "step": np.asarray(out_step, np.int64),
                "vid": np.asarray(out_vid, np.int64),
            }
        )

    return ds.map_batches(walk, batch_format="pyarrow", batch_size=1024)


def node2vec_walks(
    graph: GraphTables,
    start_vids: np.ndarray,
    steps: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    seed: int = 42,
    directed: bool = False,
) -> "rd.Dataset":
    """node2vec p/q-biased random walks (reference [3.4+]
    ``algo.randomWalk.stream`` node2vec mode, ``algo/.../NodeWalkerProc.java``
    / Grover & Leskovec 2016): from step 2 on, the unnormalized
    transition weight to neighbor x of the current vertex is
    1/p if x == prev, 1 if x is adjacent to prev, else 1/q.
    Same actor-fan-out shape as ``random_walks``; seeded per walk_id so
    results are deterministic under any parallelism."""
    from ..state.csr import build_csr_ref

    csr_ref = build_csr_ref(graph, directed=directed, weighted=True)
    vids = graph.vids
    starts = np.searchsorted(vids, np.asarray(start_vids, dtype=np.int64))
    walk_ids = np.arange(len(starts) * walks_per_node, dtype=np.int64)
    starts_rep = np.tile(starts, walks_per_node)
    ds = rd.from_arrow(pa.table({"walk_id": walk_ids, "start": starts_rep}))
    vids_ref = graph.vids_ref

    def walk(batch: pa.Table, _steps=steps, _seed=seed, _p=p, _q=q) -> pa.Table:
        indptr, nbrs, _w = ray.get(csr_ref)
        vv = ray.get(vids_ref)
        # integer transition weights: scale (1/p, 1, 1/q) by 2·max(p,q,1)
        # so the cumulative-pick arithmetic is exact (and matched by the
        # SQL oracle) whenever p and q are halves/doubles; general p/q
        # fall back to float weights scaled to a 2^20 integer grid
        scale = 2.0 * max(_p, _q, 1.0)
        trio = np.array([scale / _p, scale, scale / _q])
        if not np.allclose(trio, np.round(trio)):
            trio = np.round(trio * (1 << 20) / trio.max())
        w_prev, w_adj, w_far = (int(x) for x in np.round(trio))
        out_id, out_step, out_vid = [], [], []
        for wid, cur in zip(
            batch["walk_id"].to_numpy(zero_copy_only=False),
            batch["start"].to_numpy(zero_copy_only=False),
        ):
            prev = -1
            out_id.append(wid)
            out_step.append(0)
            out_vid.append(vv[cur])
            for s in range(1, _steps + 1):
                lo, hi = indptr[cur], indptr[cur + 1]
                if hi <= lo:
                    break
                cand = nbrs[lo:hi]
                h = _hash_u64(_seed, int(wid), s)
                if prev < 0:
                    nxt = cand[(h * int(hi - lo)) >> 64]
                else:
                    # neighbors are di-sorted per source → membership in
                    # prev's adjacency via one vectorized searchsorted
                    pn = nbrs[indptr[prev] : indptr[prev + 1]]
                    pos = np.searchsorted(pn, cand)
                    is_adj = (pos < len(pn)) & (pn[np.minimum(pos, len(pn) - 1)] == cand)
                    wgt = np.where(cand == prev, w_prev, np.where(is_adj, w_adj, w_far))
                    nxt = cand[_pick_weighted(h, wgt)]
                prev = int(cur)
                cur = int(nxt)
                out_id.append(wid)
                out_step.append(s)
                out_vid.append(vv[cur])
        return pa.table(
            {
                "walk_id": np.asarray(out_id, np.int64),
                "step": np.asarray(out_step, np.int64),
                "vid": np.asarray(out_vid, np.int64),
            }
        )

    return ds.map_batches(walk, batch_format="pyarrow", batch_size=1024)


def _reverse_arcs(indptr, nbrs):
    """Reverse-arc view of a CSR: (rev_indptr, rev_srcs, rev_fpos) where
    rev_fpos maps each reverse slot back to its forward CSR position (so
    forward-position edge bans apply to reverse traversal too)."""
    n = len(indptr) - 1
    srcs = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    order = np.argsort(nbrs, kind="stable")
    rev_indptr = np.searchsorted(nbrs[order], np.arange(n + 1))
    return rev_indptr, srcs[order], order


_BF_ROUND_CAP = 256


def _masked_dists_to(indptr, nbrs, w, n, dst, banned_edges, banned_nodes):
    """Exact distances-to-``dst`` over the masked graph by vectorized
    Bellman-Ford rounds to fixpoint (one reduceat sweep over the edge
    list per round — C-speed, vs the per-arc Python heap loop this
    replaced, ~70x on the sf0.1 yens graph). Bit-identical to the heap
    Dijkstra: each candidate is the same ``w[pos] + dist[v]``
    right-to-left accumulation, and the fixpoint min over identical
    float candidates is the same value. Returns None if the hop
    diameter exceeds _BF_ROUND_CAP rounds (pathological chains) — the
    caller then falls back to the heap kernel."""
    m = len(nbrs)
    u_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    usable = np.ones(m, dtype=bool)
    if banned_edges:
        usable[np.fromiter(banned_edges, np.int64, len(banned_edges))] = False
    if banned_nodes:
        nb = np.zeros(n, dtype=bool)
        nb[np.fromiter(banned_nodes, np.int64, len(banned_nodes))] = True
        usable &= ~nb[u_all]
    uu, vv, wwe = u_all[usable], nbrs[usable], w[usable]
    ptr = np.searchsorted(uu, np.arange(n + 1))
    deg = np.diff(ptr)
    rows = deg > 0
    starts = ptr[:-1][rows]
    dist = np.full(n, np.inf)
    dist[dst] = 0.0
    for _ in range(_BF_ROUND_CAP):
        cand = wwe + dist[vv]
        mins = (
            np.minimum.reduceat(cand, starts)
            if len(starts)
            else np.empty(0, np.float64)
        )
        new = dist.copy()
        np.minimum(new[rows], mins, out=mins)
        new[rows] = mins
        if np.array_equal(new, dist):
            return dist
        dist = new
    return None


def _masked_dists_to_heap(rev, w, n, dst, banned_edges, banned_nodes):
    """Heap-Dijkstra fallback for graphs whose masked hop diameter
    exceeds the Bellman-Ford round cap."""
    rev_indptr, rev_srcs, rev_fpos = rev
    dist_t = np.full(n, np.inf)
    dist_t[dst] = 0.0
    heap = [(0.0, dst)]
    done = np.zeros(n, dtype=bool)
    while heap:
        d, y = heapq.heappop(heap)
        if done[y]:
            continue
        done[y] = True
        for rpos in range(rev_indptr[y], rev_indptr[y + 1]):
            fpos = rev_fpos[rpos]
            if fpos in banned_edges:
                continue
            x = rev_srcs[rpos]
            if x in banned_nodes or done[x]:
                continue
            nd = d + w[fpos]
            if nd < dist_t[x]:
                dist_t[x] = nd
                heapq.heappush(heap, (nd, int(x)))
    return dist_t


def _dijkstra_masked(
    indptr,
    nbrs,
    w,
    n: int,
    src: int,
    dst: int,
    banned_edges: set,
    banned_nodes: set,
    rev=None,
):
    """(cost, path) or None; edges banned as (u_idx_in_csr) positions.

    The returned path is the LEXICOGRAPHICALLY SMALLEST vertex sequence
    among all minimum-cost src→dst paths (pinned, documented tie-break —
    the reference's Yen leaves ties unspecified; a total order makes the
    result reproducible under any parallelism and SQL-checkable).
    Computed as: Dijkstra distances-to-dst over the reverse arcs, then a
    greedy forward walk that always steps to the smallest next vertex
    still on SOME minimum-cost path."""
    if rev is None:
        rev = _reverse_arcs(indptr, nbrs)
    dist_t = _masked_dists_to(indptr, nbrs, w, n, dst, banned_edges, banned_nodes)
    if dist_t is None:
        dist_t = _masked_dists_to_heap(rev, w, n, dst, banned_edges, banned_nodes)
    total = dist_t[src]
    if not np.isfinite(total):
        return None
    path = [src]
    acc = 0.0
    cur = src
    while cur != dst:
        best_v, best_pos = -1, -1
        for pos in range(indptr[cur], indptr[cur + 1]):
            if pos in banned_edges:
                continue
            v = nbrs[pos]
            if v in banned_nodes:
                continue
            cand = acc + w[pos] + dist_t[v]
            if cand <= total + 1e-9 * max(1.0, abs(total)) and (
                best_v < 0 or v < best_v
            ):
                best_v, best_pos = int(v), pos
        if best_v < 0:  # pragma: no cover — unreachable when total finite
            return None
        acc += w[best_pos]
        path.append(best_v)
        cur = best_v
    return float(total), path


def astar_path(
    graph: GraphTables,
    start_vid: int,
    end_vid: int,
    heuristic: np.ndarray | None = None,
    directed: bool = True,
) -> dict:
    """A* single-pair shortest path (reference [later-branch]
    ``algo.shortestPath.astar``, ``algo/.../impl/ShortestPathAStar.java``
    3.4+ — there hard-wired to a haversine heuristic over lat/lon node
    properties). Generalized to any per-dense-id heuristic vector ``h``
    (admissible + consistent => optimal path; ``h=None`` means h=0,
    which degenerates to Dijkstra — the default, since the corpus graph
    carries no coordinates). Single-pair search is inherently sequential
    (the reference, too, runs it single-threaded per call; SURVEY §2.5
    P1 note) so this is a small-graph kernel in one process over the
    CSR pulled once from the edge Dataset. Deterministic: heap pops on
    (f, dense-id), relaxations only on strict improvement in CSR order.

    Returns ``{found, total_cost, path (original vids), expanded}`` —
    ``expanded`` (settled-vertex count) is the knob tests use to verify
    a consistent heuristic actually prunes the search."""
    indptr, nbrs, w = _csr(graph, directed=directed)
    vids = graph.vids
    n = graph.n
    s = int(np.searchsorted(vids, start_vid))
    t = int(np.searchsorted(vids, end_vid))
    if s >= n or vids[s] != start_vid:
        raise KeyError(f"start vid {start_vid} not in graph")
    if t >= n or vids[t] != end_vid:
        raise KeyError(f"end vid {end_vid} not in graph")
    h = (
        np.zeros(n, dtype=np.float64)
        if heuristic is None
        else np.asarray(heuristic, dtype=np.float64)
    )
    dist = np.full(n, np.inf)
    dist[s] = 0.0
    parent = np.full(n, -1, np.int64)
    heap = [(float(h[s]), s)]
    done = np.zeros(n, dtype=bool)
    expanded = 0
    while heap:
        _, u = heapq.heappop(heap)
        if done[u]:
            continue
        done[u] = True
        expanded += 1
        if u == t:
            break
        du = dist[u]
        for pos in range(indptr[u], indptr[u + 1]):
            v = nbrs[pos]
            cand = du + w[pos]
            if cand < dist[v]:
                dist[v] = cand
                parent[v] = u
                heapq.heappush(heap, (float(cand + h[v]), int(v)))
    if not np.isfinite(dist[t]):
        return {
            "found": False,
            "total_cost": float("inf"),
            "path": [],
            "expanded": expanded,
        }
    rev = [t]
    while rev[-1] != s:
        rev.append(int(parent[rev[-1]]))
    return {
        "found": True,
        "total_cost": float(dist[t]),
        "path": [int(vids[p]) for p in reversed(rev)],
        "expanded": expanded,
    }


def yens_k_shortest_paths(
    graph: GraphTables, start_vid: int, end_vid: int, k: int, directed: bool = True
) -> pd.DataFrame:
    """Rows (path_index, step, vid, cost) for up to k loopless shortest
    paths, ordered by (total cost, lexicographic vertex sequence) — the
    tie order is pinned (reference Yen leaves it unspecified) so results
    are deterministic and recomputable by the SQL oracle."""
    indptr, nbrs, w = _csr(graph, directed=directed, dedup_parallel_min=True)
    vids = graph.vids
    n = graph.n
    s = int(np.searchsorted(vids, start_vid))
    t = int(np.searchsorted(vids, end_vid))
    rev = _reverse_arcs(indptr, nbrs)
    first = _dijkstra_masked(indptr, nbrs, w, n, s, t, set(), set(), rev=rev)
    if first is None:
        return pd.DataFrame(
            {"path_index": [], "step": [], "vid": [], "cost": []}
        ).astype({"path_index": "int64", "step": "int64", "vid": "int64", "cost": "float64"})
    paths = [first]
    candidates: list = []
    seen_paths = {tuple(first[1])}
    while len(paths) < k:
        cost_prev, path_prev = paths[-1]
        for i in range(len(path_prev) - 1):
            spur = path_prev[i]
            root = path_prev[: i + 1]
            banned_edges = set()
            for pc, pp in paths:
                if pp[: i + 1] == root and len(pp) > i + 1:
                    u, nxt = pp[i], pp[i + 1]
                    for pos in range(indptr[u], indptr[u + 1]):
                        if nbrs[pos] == nxt:
                            banned_edges.add(pos)
            banned_nodes = set(root[:-1])
            spur_res = _dijkstra_masked(
                indptr, nbrs, w, n, spur, t, banned_edges, banned_nodes, rev=rev
            )
            if spur_res is None:
                continue
            root_cost = 0.0
            for j in range(i):
                u, nxt = path_prev[j], path_prev[j + 1]
                for pos in range(indptr[u], indptr[u + 1]):
                    if nbrs[pos] == nxt:
                        root_cost += w[pos]
                        break
            total = root_cost + spur_res[0]
            full = root[:-1] + spur_res[1]
            key = tuple(full)
            if key not in seen_paths and all(c[1] != key for c in candidates):
                candidates.append((total, key, full))
        if not candidates:
            break
        candidates.sort(key=lambda c: (c[0], c[1]))
        best = candidates.pop(0)
        paths.append((best[0], best[2]))
        seen_paths.add(best[1])
    rows = []
    for pi, (cost, path) in enumerate(paths):
        for step, v in enumerate(path):
            rows.append((pi, step, int(vids[v]), cost))
    return pd.DataFrame(rows, columns=["path_index", "step", "vid", "cost"]).astype(
        {"path_index": "int64", "step": "int64", "vid": "int64", "cost": "float64"}
    )


def skipgram_pairs(
    walks: "rd.Dataset", window: int = 2
) -> "rd.Dataset":
    """The graph→embedding-training handoff (DeepWalk/node2vec §3:
    walks feed a skip-gram model): co-occurrence pair frequencies
    ``(center, context, cnt)`` over every walk position pair within
    ``window`` steps (both directions, offset ≥ 1).

    Dataflow: one keyed repartition on ``walk_id`` makes walks
    block-complete; the per-block pass emits pairs by shifted-array
    matching (one vectorized shift per offset, no per-walk Python) and
    PRE-AGGREGATES counts, so the final width-bounded hash aggregate
    sees one row per distinct pair per block — never one per
    occurrence."""
    from ..state.partitioning import (
        keyed_repartition,
        shuffle_width,
        source_size_bytes,
    )

    width = shuffle_width(source_size_bytes(walks))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "center": pd.Series([], dtype="int64"),
                    "context": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["walk_id", "step"], kind="stable")
        wid = df["walk_id"].to_numpy(np.int64)
        vid = df["vid"].to_numpy(np.int64)
        cs, xs = [], []
        for d in range(1, window + 1):
            same = wid[:-d] == wid[d:]
            a, b = vid[:-d][same], vid[d:][same]
            cs.append(np.concatenate([a, b]))  # both directions
            xs.append(np.concatenate([b, a]))
        out = (
            pd.DataFrame(
                {"center": np.concatenate(cs), "context": np.concatenate(xs)}
            )
            .groupby(["center", "context"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return out.astype({"cnt": "int64"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["center", "context"], sort=False, as_index=False)["cnt"]
            .sum()
            .astype({"cnt": "int64"})
        )

    # final sum via repartition+fold on center (co-locates every
    # (center, context) pair) — avoids Ray groupby's HashAggregate
    # fixed overhead
    per_block = keyed_repartition(walks, width, ["walk_id"]).map_batches(
        pairs, batch_format="pandas", batch_size=None
    )
    return keyed_repartition(per_block, width, ["center"]).map_batches(
        fold, batch_format="pandas", batch_size=None
    )
