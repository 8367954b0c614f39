"""k-core decomposition (coreness per vertex).

Not in the mknblch tree itself (it arrived with the later GDS
``gds.kcore``) — included because degeneracy/coreness is a standard
link-graph curation signal (spam-farm and boilerplate-cluster
detection) and it exercises a message-passing shape the engine needs
anyway: a NON-decomposable per-vertex reduction (the h-index) folded
from shard partials.

Algorithm: the h-operator fixpoint of Lü, Zhou, Zhang, Stanley 2016
("The H-index of a network node and its relation to degree and
coreness", Nat. Commun. 7) —

    c_0(v)   = deg(v)                 (undirected, simple)
    c_t+1(v) = H({c_t(u) : u ∈ N(v)})

where H is the h-index (max h such that ≥ h neighbor values are
≥ h). The sequence is non-increasing and converges to the coreness.
Rounds run on the SAME stateful shard pool as PageRank/WCC
(state.shards): each shard emits a per-target histogram of clipped
neighbor values — decomposable where the raw h-index is not — reduced
to h per vertex with pure numpy (cumulative ge-counts + ``reduceat``),
O(fold rows) per round. Clipping neighbor values at the target's
current value keeps the fold Σ_v |distinct clipped values| ≤ 2m rows.
Two scale levers (both bit-identical to the plain fold, pinned by
tests): FRONTIER FILTERING — only targets whose own or neighbor
values moved re-emit histograms, so on sparse graphs the fold
collapses to near-nothing after a few rounds — and, above 10M edges,
a RANGE-SPLIT FOLD — shards slice their sorted partials by target
range and per-range fold tasks reduce to h-slices, so the driver
ingests only the O(n) value vector, never the histograms (measured
3× on the 131M-edge near-clique fixture, BENCH/hits_kcore_scale_131M).

The edge streams are treated as UNDIRECTED: each directed edge
contributes both (u→v) and (v→u). Callers must project a graph whose
directed edge list holds at most one orientation per pair (the
bipartite projections guarantee this — src even / dst odd), otherwise
a reciprocal pair counts its endpoints twice.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..state.checkpoint import (
    CheckpointConfig,
    latest_complete,
    load_iteration,
    save_iteration,
)
from ..state.graph import GraphTables


@dataclass
class KCoreResult:
    coreness: np.ndarray  # dense int64, index = dense vid
    iterations: int
    converged: bool
    metrics: dict = field(default_factory=dict)


def kcore(
    graph: GraphTables,
    max_rounds: int = 1000,
    fixed_rounds: Optional[int] = None,
    checkpoint: Optional[CheckpointConfig] = None,
) -> KCoreResult:
    """Coreness of every vertex. ``fixed_rounds`` pins the round count
    (extra rounds past the fixpoint are no-ops — the h-operator is
    idempotent at convergence — so a fixed count ≥ the observed
    convergence equals the exact coreness and is oracle-reproducible
    round-for-round). ``checkpoint`` enables per-round parquet
    checkpoints + resume (state/checkpoint.py — the long dense-graph
    runs are minutes per round): each round is a pure function of the
    value vector, so a resumed run is bit-identical; the first resumed
    round runs unfiltered (the frontier mask is derivable state, and
    "all active" is the always-sound superset)."""
    sg = graph.sharded()
    deg_in = sg.degree("in")
    deg_out = sg.degree("out")
    vals = (deg_in + deg_out).astype(np.int64)
    it, converged = 0, False
    rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    changed: Optional[np.ndarray] = None  # round 1: everything active
    frontier_sizes = []
    if checkpoint is not None and checkpoint.resume:
        k = latest_complete(checkpoint)
        if k is not None:
            _, vectors, _ = load_iteration(
                checkpoint, k, expect_vids=graph.vids
            )
            vals = vectors["coreness"].astype(np.int64)
            it = k
    t0 = time.perf_counter()
    while it < rounds:
        ti = time.perf_counter()
        new = sg.hindex_round(vals, changed)
        it += 1
        changed = new != vals
        frontier_sizes.append(int(changed.sum()))
        same = not changed.any()
        vals = new
        if checkpoint is not None and it % checkpoint.every == 0:
            save_iteration(
                checkpoint,
                it,
                graph.vids,
                {"coreness": vals},
                {
                    "iteration": it,
                    "frontier": int(changed.sum()),
                    "seconds": time.perf_counter() - ti,
                },
                input_token=graph.token,
            )
        if same:
            converged = True
            if fixed_rounds is None:
                break
    return KCoreResult(
        coreness=vals,
        iterations=it,
        converged=converged,
        metrics={
            "total_seconds": time.perf_counter() - t0,
            "frontier_sizes": frontier_sizes,
        },
    )


def kcore_peel_oracle(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Exact single-machine peeling reference for tests (SURVEY §5.2):
    repeatedly remove the minimum-degree vertex; its degree at removal
    time (monotone max so far) is its coreness. O(m log n) heap peel —
    the textbook Batagelj–Zaveršnik shape, small-n only."""
    import heapq

    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    core = np.zeros(n, dtype=np.int64)
    dead = np.zeros(n, dtype=bool)
    heap = [(int(d), v) for v, d in enumerate(deg)]
    heapq.heapify(heap)
    k = 0
    while heap:
        d, v = heapq.heappop(heap)
        if dead[v] or d != deg[v]:
            continue
        dead[v] = True
        k = max(k, int(d))
        core[v] = k
        for u in adj[v]:
            if not dead[u]:
                deg[u] -= 1
                heapq.heappush(heap, (int(deg[u]), u))
    return core
