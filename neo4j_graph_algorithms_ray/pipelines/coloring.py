"""Greedy parallel graph coloring (Jones & Plassmann 1993, the
Luby-style independent-set schedule; the GDS-family
``gds.beta.graphColoring`` analog — not in the mknblch tree itself,
included for the same reason as k-core: a standard link-graph
curation/scheduling primitive that exercises a fold shape the engine
needs anyway).

Deterministic variant: the random priority is the DENSE RANK of
``(splitmix64(vid), vid)`` — a permutation, so priority comparisons
are total (no hash-tie hazard) and the whole computation is exactly
SQL-recomputable (``__ray_entry__._coloring_sql`` unrolls the rounds;
the splitmix64 chain is the shared sketch-family SQL macro).

Synchronous rounds over the stateful shard pool: an uncolored vertex
colors itself in round t iff its priority exceeds every uncolored
neighbor's, taking the minimum color absent from its colored
neighborhood. Per round each shard returns two DECOMPOSABLE dense
partials — max uncolored-neighbor priority (max-fold) and the OR of
neighbor color bitmasks (or-fold, ``W = maxdeg//64 + 1`` uint64 words
per vertex) — so the driver fold is O(n·(1+W)) like the other dense
folds; the >4M-vertex upgrade is the same range-split the k-core
histogram fold uses. Every round colors at least the globally
max-priority uncolored vertex, and within any connected region the
round count is bounded by the longest decreasing priority path
(≤ block size on the part_blocks fixture), so convergence is fast
and extra rounds past the fixpoint are no-ops.

Edge contract (same as k-core, ``kcore.py`` module docstring): the
edge list is treated as UNDIRECTED and callers must hold at most one
orientation per pair.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import ray

from ..state.graph import GraphTables

# JP colors never exceed max degree + 1; 16 words = 1024 colors caps
# the mask width (a >1023-degree greedy color would need a different
# representation — raise rather than silently truncate).
_MAX_WORDS = 16


@dataclass
class ColoringResult:
    colors: np.ndarray  # dense int64, index = dense vid
    iterations: int
    converged: bool
    n_colors: int
    metrics: dict = field(default_factory=dict)


def _priority(graph: GraphTables) -> np.ndarray:
    """Dense rank of (splitmix64(vid), vid) — a deterministic
    permutation of 0..n-1 (vid tie-break makes hash collisions
    harmless)."""
    from .sketches import mix64

    h = mix64(graph.vids.astype(np.uint64))
    prio = np.empty(graph.n, dtype=np.int64)
    prio[np.lexsort((graph.vids, h))] = np.arange(graph.n, dtype=np.int64)
    return prio


def _min_excluded(mask_rows: np.ndarray) -> np.ndarray:
    """Per row of a (m, W) uint64 used-color bitmask: the smallest
    color index whose bit is clear — vectorized lowest-set-bit of the
    inverted words (x & (~x+1) is an exact power of two ≤ 2^63, so
    float64 log2 is exact)."""
    m, W = mask_rows.shape
    out = np.full(m, -1, dtype=np.int64)
    rem = np.ones(m, dtype=bool)
    for w in range(W):
        inv = ~mask_rows[:, w]
        has = rem & (inv != 0)
        if has.any():
            x = inv[has]
            lsb = x & (~x + np.uint64(1))
            out[has] = w * 64 + np.round(
                np.log2(lsb.astype(np.float64))
            ).astype(np.int64)
            rem &= ~has
    if rem.any():  # pragma: no cover - guarded by the W sizing
        raise ValueError("greedy color exceeds mask width")
    return out


@ray.remote
def _coloring_fold_range(
    lo: int, hi: int, colors: np.ndarray, prio: np.ndarray, *parts
):
    """Range fold task (the k-core range-split pattern): max/or-fold
    the shards' [lo, hi) partial slices and emit the range's NEW
    colors — the per-round decision is range-local (it reads only the
    vertex's own priority/color and its folded neighbor partials), so
    the driver ingests R color slices (O(n) total), never the
    S×n×(1+W) partials."""
    maxp = np.maximum.reduce([p[0] for p in parts])
    mask = np.bitwise_or.reduce([p[1] for p in parts])
    c = colors[lo:hi]
    p = prio[lo:hi]
    cand = (c < 0) & (p > maxp)
    new = c.copy()
    if cand.any():
        new[cand] = _min_excluded(mask[cand])
    return new


def greedy_coloring(
    graph: GraphTables,
    max_rounds: int = 10_000,
    fixed_rounds: Optional[int] = None,
) -> ColoringResult:
    """Color every vertex; no edge joins two equal colors. Fixed round
    counts past the fixpoint are no-ops (everything is colored), so a
    fixed count ≥ the observed convergence is oracle-reproducible.
    Above the k-core range-split threshold (10M edges, multi-shard)
    or the dense-fold ceiling, rounds run through per-range fold
    tasks (``_coloring_fold_range``) — bit-identical to the dense
    driver fold (pinned in tests)."""
    sg = graph.sharded()
    n = graph.n
    prio = _priority(graph)
    deg = (sg.degree("in") + sg.degree("out")).astype(np.int64)
    maxdeg = int(deg.max()) if n else 0
    W = maxdeg // 64 + 1
    if W > _MAX_WORDS:
        raise ValueError(
            f"max degree {maxdeg} needs {W} mask words (> {_MAX_WORDS}); "
            "greedy colors are bounded by degree+1 and this kernel caps "
            "the per-vertex bitmask at 1024 colors"
        )
    colors = np.full(n, -1, dtype=np.int64)
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    it, converged = 0, False
    range_fold = n > sg.DENSE_MAX_N or (
        sg.m >= 10_000_000 and len(sg.actors) > 1
    )
    if range_fold:
        R = max(2, len(sg.actors))
        cuts = np.linspace(0, n, R + 1).astype(np.int64)
        cuts_ref = ray.put(cuts)
    p_ref = ray.put(prio)
    t0 = time.perf_counter()
    while it < rounds:
        if not (colors < 0).any():
            converged = True
            if fixed_rounds is None:
                break
            it += 1
            continue
        if range_fold:
            c_ref = ray.put(colors)
            futs = [
                a.coloring_partials_split.options(num_returns=R).remote(
                    c_ref, p_ref, W, cuts_ref
                )
                for a in sg.actors
            ]
            folds = [
                _coloring_fold_range.remote(
                    int(cuts[r]), int(cuts[r + 1]), c_ref, p_ref,
                    *[futs[s][r] for s in range(len(sg.actors))]
                )
                for r in range(R)
            ]
            colors = np.concatenate(ray.get(folds))
            it += 1
            continue
        maxp, mask = sg.coloring_round(colors, prio, W)
        it += 1
        cand = (colors < 0) & (prio > maxp)
        # the globally max-priority uncolored vertex always qualifies
        colors[cand] = _min_excluded(mask[cand])
    if not (colors < 0).any():
        converged = True
    return ColoringResult(
        colors=colors,
        iterations=it,
        converged=converged,
        n_colors=int(colors.max()) + 1 if n else 0,
        metrics={"total_seconds": time.perf_counter() - t0},
    )


def coloring_oracle(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Exact single-machine replay of the synchronous rounds for tests
    (small-n only): same priority, same candidate rule, same
    min-excluded pick — straight numpy over an adjacency list."""
    from .sketches import mix64

    vids = np.arange(n, dtype=np.int64)
    h = mix64(vids.astype(np.uint64))
    prio = np.empty(n, dtype=np.int64)
    prio[np.lexsort((vids, h))] = np.arange(n, dtype=np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    colors = np.full(n, -1, dtype=np.int64)
    while (colors < 0).any():
        prev = colors.copy()
        for v in range(n):
            if prev[v] >= 0:
                continue
            if any(prev[u] < 0 and prio[u] > prio[v] for u in adj[v]):
                continue
            used = {int(prev[u]) for u in adj[v] if prev[u] >= 0}
            c = 0
            while c in used:
                c += 1
            colors[v] = c
    return colors
