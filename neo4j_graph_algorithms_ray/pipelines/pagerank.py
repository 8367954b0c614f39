"""PageRank — flagship iterative kernel (reference: algo.pageRank).

Semantics reproduce the reference kernel
(``algo/.../impl/PageRank.java``, proc ``algo/.../PageRankProc.java`` in
mknblch/neo4j-graph-algorithms): UNNORMALIZED power iteration with

    rank_0[v]   = 1 - d                       (d = dampingFactor, 0.85)
    rank_k+1[v] = (1 - d) + d * Σ_{u→v} rank_k[u] / outDeg(u)

Dangling vertices (outDeg 0) simply emit nothing, exactly like the
reference's ComputeStep (their mass is not redistributed); Σ rank ≈ n
only on dangling-free graphs. The weighted variant replaces
``1/outDeg(u)`` with ``w(u,v)/weightedOutDeg(u)``.

Execution (SURVEY.md §2.2 A1): the edge table is densified + sorted by
``si`` ONCE (GraphTables); each iteration is

    edges.map_batches(gather-scatter)   # rank[si] * inv_out_deg[si],
                                        # pre-aggregated per block on di
    → combine into the dense next-rank vector ("driver" stream fold or
      "shuffle" groupby("idx").sum — both supported, see state.dense)
    → teleport add + L1 delta on the driver.

Stops at ``Σ|Δ| < tol`` (north rule 1e-6) or ``max_iterations``; the
reference's fixed-20-iterations behavior is ``fixed_iterations=20``.
Per-iteration checkpointing/resume via state.checkpoint (north rule).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..state.checkpoint import (
    CheckpointConfig,
    latest_complete,
    load_iteration,
    save_iteration,
)
from ..state.dense import group_sum, scatter_combine
from ..state.graph import GraphTables


@dataclass(frozen=True)
class PageRankConfig:
    """Mirrors the reference ProcedureConfiguration defaults
    (``core/ProcedureConfiguration.java``: iterations=20, damping=0.85)."""

    damping: float = 0.85
    tolerance: float = 1e-6
    max_iterations: int = 100
    fixed_iterations: Optional[int] = None  # reference-style fixed count
    weighted: bool = False
    combine: str = "driver"  # or "shuffle"
    # "actor": per-round calls against the stateful shard pool
    # (state.shards — per-partition CSR in long-lived actors, the north
    # star's actor-pool path; ~10 ms fixed cost per round);
    # "dataflow": per-round map_batches + combine (fresh streaming
    # execution per round); "range": range-sharded per-vertex vectors
    # owned by actors — partials flow shard→owner through the object
    # store, driver folds only scalar deltas (the >10^8-vertex
    # multi-node path; see state.shards.RangeEngine); "auto": actor for
    # materialized graphs above a small size floor, else dataflow.
    engine: str = "auto"
    checkpoint: Optional[CheckpointConfig] = None


@dataclass
class PageRankResult:
    ranks: np.ndarray  # dense, index = dense vid
    iterations: int
    converged: bool
    delta: float
    metrics: dict = field(default_factory=dict)


def _make_partial(ranks_ref, invdeg_ref, token: str, weighted: bool):
    def partial(batch: pa.Table) -> pa.Table:
        si = batch["si"].to_numpy(zero_copy_only=False)
        di = batch["di"].to_numpy(zero_copy_only=False)
        ranks = ray.get(ranks_ref)
        invdeg = ray.get(invdeg_ref)
        contrib = ranks[si] * invdeg[si]
        if weighted:
            contrib = contrib * batch["w"].to_numpy(zero_copy_only=False)
        idx, sums = group_sum(di, contrib, token=token)
        return pa.table({"idx": idx, "val": sums})

    return partial


def _use_actor_engine(graph: GraphTables, engine: str) -> bool:
    if engine == "actor":
        return True
    if engine == "dataflow":
        return False
    return graph.m >= 50_000  # "auto": round-trip cost amortized


def _pagerank_range(graph: GraphTables, config: PageRankConfig) -> PageRankResult:
    """Range-sharded PageRank: per-vertex state lives in range-owner
    actors; per round the driver routes ObjectRefs and folds R scalar
    deltas — O(S·R) refs + O(R) floats of driver ingress instead of the
    O(S·n) partial fold of the "actor" engine. Bit-identical to the
    actor engine (same chunked-reduceat kernel, same fold order); the
    full vector is gathered only for checkpoints and the final result."""
    from ..state.shards import RangeEngine

    n = graph.n
    d = config.damping
    alpha = 1.0 - d
    sg = graph.sharded()
    eng = RangeEngine(sg)
    deg = sg.degree("out", weighted=config.weighted)
    with np.errstate(divide="ignore"):
        invdeg = np.where(deg > 0, 1.0 / deg, 0.0)
    eng.set_multiplier(invdeg)

    start_iter = 0
    ckpt = config.checkpoint
    if ckpt is not None and ckpt.resume:
        k = latest_complete(ckpt)
        if k is not None:
            _, vectors, _ = load_iteration(ckpt, k, expect_vids=graph.vids)
            eng.set_vector(arr=vectors["rank"])
            start_iter = k
        else:
            eng.set_vector(value=alpha)
    else:
        eng.set_vector(value=alpha)

    max_iters = (
        config.fixed_iterations
        if config.fixed_iterations is not None
        else config.max_iterations
    )
    delta = float("inf")
    converged = False
    metrics: dict = {
        "iteration_seconds": [],
        "edges": graph.m,
        "engine": "range",
        "num_ranges": eng.num_ranges,
    }
    t_all = time.perf_counter()
    it = start_iter
    while it < max_iters:
        t0 = time.perf_counter()
        delta = eng.pagerank_round(alpha, d, config.weighted)
        it += 1
        dt = time.perf_counter() - t0
        metrics["iteration_seconds"].append(dt)
        if ckpt is not None and it % ckpt.every == 0:
            ranks_now = eng.collect()
            save_iteration(
                ckpt, it, graph.vids, {"rank": ranks_now},
                {"iteration": it, "delta": delta, "seconds": dt},
                input_token=graph.token,
            )
        if config.fixed_iterations is None and delta < config.tolerance:
            converged = True
            break
    ranks = eng.collect()
    total = time.perf_counter() - t_all
    iters_run = it - start_iter
    metrics.update(
        {
            "total_seconds": total,
            "iterations": it,
            "edges_per_sec": iters_run * graph.m / total if total > 0 else None,
            "delta": delta,
        }
    )
    return PageRankResult(
        ranks=ranks, iterations=it, converged=converged, delta=delta, metrics=metrics
    )


def pagerank(graph: GraphTables, config: PageRankConfig = PageRankConfig()) -> PageRankResult:
    if config.engine == "range":
        return _pagerank_range(graph, config)
    n = graph.n
    d = config.damping
    alpha = 1.0 - d
    use_actor = _use_actor_engine(graph, config.engine)
    sg = graph.sharded() if use_actor else None
    deg = (
        sg.degree("out", weighted=config.weighted)
        if use_actor
        else graph.out_degree(weighted=config.weighted)
    )
    with np.errstate(divide="ignore"):
        invdeg = np.where(deg > 0, 1.0 / deg, 0.0)
    invdeg_ref = ray.put(invdeg)

    start_iter = 0
    ranks = np.full(n, alpha, dtype=np.float64)
    ckpt = config.checkpoint
    if ckpt is not None and ckpt.resume:
        k = latest_complete(ckpt)
        if k is not None:
            _, vectors, _ = load_iteration(ckpt, k, expect_vids=graph.vids)
            ranks = vectors["rank"]
            start_iter = k

    max_iters = (
        config.fixed_iterations
        if config.fixed_iterations is not None
        else config.max_iterations
    )
    token = graph.token + "/pr"
    delta = float("inf")
    converged = False
    metrics: dict = {"iteration_seconds": [], "edges": graph.m}
    t_all = time.perf_counter()
    it = start_iter
    while it < max_iters:
        t0 = time.perf_counter()
        if use_actor:
            acc = sg.scatter_sum(ranks, mul=invdeg, weighted=config.weighted)
        else:
            ranks_ref = ray.put(ranks)
            partial = _make_partial(ranks_ref, invdeg_ref, token, config.weighted)
            acc = scatter_combine(
                graph.edges, partial, n, op="sum", combine=config.combine
            )
        new_ranks = alpha + d * acc
        delta = float(np.abs(new_ranks - ranks).sum())
        ranks = new_ranks
        it += 1
        dt = time.perf_counter() - t0
        metrics["iteration_seconds"].append(dt)
        if ckpt is not None and it % ckpt.every == 0:
            save_iteration(
                ckpt,
                it,
                graph.vids,
                {"rank": ranks},
                {
                    "iteration": it,
                    "delta": delta,
                    "seconds": dt,
                    "edges_per_sec": graph.m / dt if dt > 0 else None,
                },
                input_token=graph.token,
            )
        if config.fixed_iterations is None and delta < config.tolerance:
            converged = True
            break
    total = time.perf_counter() - t_all
    iters_run = it - start_iter
    metrics.update(
        {
            "total_seconds": total,
            "iterations": it,
            "iterations_per_sec": iters_run / total if total > 0 else None,
            "edges_per_sec": iters_run * graph.m / total if total > 0 else None,
            "delta": delta,
        }
    )
    return PageRankResult(
        ranks=ranks, iterations=it, converged=converged, delta=delta, metrics=metrics
    )


def pagerank_table(graph: GraphTables, config: PageRankConfig = PageRankConfig()) -> pa.Table:
    """(vid, rank) result keyed by original vertex id."""
    res = pagerank(graph, config)
    return graph.to_table({"rank": res.ranks})


def article_rank(
    graph: GraphTables, config: PageRankConfig = PageRankConfig()
) -> PageRankResult:
    """ArticleRank (reference ``algo.articleRank`` [later-branch],
    ``algo/.../PageRankProc.java`` 3.4+): PageRank with the per-source
    divisor ``outDeg(u) + avgOutDeg`` — damps the influence of
    low-degree sources. Same actor-pool rounds as pagerank."""
    n = graph.n
    d = config.damping
    alpha = 1.0 - d
    sg = graph.sharded()
    deg = sg.degree("out")
    avg = float(deg.mean()) if n else 0.0
    inv = np.where(deg > 0, 1.0 / (deg + avg), 0.0)
    ranks = np.full(n, alpha, dtype=np.float64)
    it, delta, converged = 0, float("inf"), False
    max_iters = (
        config.fixed_iterations
        if config.fixed_iterations is not None
        else config.max_iterations
    )
    t0 = time.perf_counter()
    while it < max_iters:
        new = alpha + d * sg.scatter_sum(ranks, mul=inv)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        it += 1
        if config.fixed_iterations is None and delta < config.tolerance:
            converged = True
            break
    return PageRankResult(
        ranks=ranks,
        iterations=it,
        converged=converged,
        delta=delta,
        metrics={"total_seconds": time.perf_counter() - t0, "avg_out_deg": avg},
    )


def personalized_pagerank(
    graph: GraphTables,
    source_vids: np.ndarray,
    config: PageRankConfig = PageRankConfig(),
) -> PageRankResult:
    """Personalized PageRank (reference [later-branch] ``sourceNodes``
    parameter of ``algo.pageRank``, ``algo/.../PageRankProc.java`` 3.4+
    with the personalized variant of ``impl/pagerank/``): teleport mass
    lands only on the source set S —

        rank_0[v]   = (1-d) * 1[v in S]
        rank_k+1[v] = (1-d) * 1[v in S] + d * sum_{u->v} rank_k[u]/outDeg(u)

    Unnormalized like the base kernel (reference semantics); vertices
    unreachable from S converge to 0. Same stateful shard-pool rounds
    as :func:`pagerank`'s actor engine — only the teleport vector
    differs, so scale behavior is identical."""
    n = graph.n
    d = config.damping
    alpha = 1.0 - d
    source_vids = np.asarray(source_vids, dtype=np.int64)
    if n == 0:
        if len(source_vids):
            raise KeyError(f"source vids not in graph: {source_vids}")
        pos = np.empty(0, np.int64)
    else:
        pos = np.searchsorted(graph.vids, source_vids)
        ok = (pos < n) & (graph.vids[np.minimum(pos, n - 1)] == source_vids)
        if not ok.all():
            raise KeyError(f"source vids not in graph: {source_vids[~ok]}")
    sg = graph.sharded()
    deg = sg.degree("out", weighted=config.weighted)
    with np.errstate(divide="ignore"):
        inv = np.where(deg > 0, 1.0 / deg, 0.0)
    teleport = np.zeros(n, dtype=np.float64)
    teleport[pos] = alpha
    ranks = teleport.copy()
    it, delta, converged = 0, float("inf"), False
    max_iters = (
        config.fixed_iterations
        if config.fixed_iterations is not None
        else config.max_iterations
    )
    t0 = time.perf_counter()
    while it < max_iters:
        new = teleport + d * sg.scatter_sum(ranks, mul=inv, weighted=config.weighted)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        it += 1
        if config.fixed_iterations is None and delta < config.tolerance:
            converged = True
            break
    return PageRankResult(
        ranks=ranks,
        iterations=it,
        converged=converged,
        delta=delta,
        metrics={
            "total_seconds": time.perf_counter() - t0,
            "sources": int(len(source_vids)),
        },
    )


@dataclass
class HitsResult:
    hubs: np.ndarray  # dense, index = dense vid
    auths: np.ndarray
    iterations: int
    converged: bool
    delta: float
    metrics: dict = field(default_factory=dict)


def hits(
    graph: GraphTables,
    tolerance: float = 1e-8,
    max_iterations: int = 100,
    fixed_iterations: Optional[int] = None,
    checkpoint: Optional[CheckpointConfig] = None,
) -> HitsResult:
    """HITS hubs & authorities (Kleinberg; the reference family's
    ``gds.alpha.hits`` surface — not in the mknblch tree itself, kept
    here because the hub update exercises the TRANSPOSED propagation
    the engine must support anyway). Per round:

        auth_k[v] = Σ_{u→v} hub_{k-1}[u],  then L2-normalize
        hub_k[u]  = Σ_{u→v} auth_k[v],     then L2-normalize

    The auth pass is the same forward scatter as PageRank; the hub
    pass runs the shard pool's ``reverse=True`` scatter (dst-gathered,
    src-scattered) — no second transposed graph is built, the actors
    reuse the one edge stream. ``fixed_iterations`` pins the round
    count (no tolerance early-stop) so results are
    oracle-reproducible. ``checkpoint`` saves both vectors per
    iteration with lineage + metrics and resumes mid-run (the same
    state.checkpoint contract as PageRank/WCC/LPA)."""
    n = graph.n
    sg = graph.sharded()
    init = 1.0 / np.sqrt(n) if n else 0.0
    hubs = np.full(n, init, dtype=np.float64)
    auths = np.full(n, init, dtype=np.float64)
    it, delta, converged = 0, float("inf"), False
    if fixed_iterations is not None:
        max_iterations = fixed_iterations
    if checkpoint is not None and checkpoint.resume:
        k = latest_complete(checkpoint)
        if k is not None:
            _, vectors, _ = load_iteration(checkpoint, k, expect_vids=graph.vids)
            hubs, auths = vectors["hub"], vectors["auth"]
            it = k
    t0 = time.perf_counter()
    while it < max_iterations:
        ti = time.perf_counter()
        new_auths = sg.scatter_sum(hubs)
        norm = float(np.linalg.norm(new_auths))
        if norm > 0.0:
            new_auths = new_auths / norm
        new_hubs = sg.scatter_sum(new_auths, reverse=True)
        norm = float(np.linalg.norm(new_hubs))
        if norm > 0.0:
            new_hubs = new_hubs / norm
        delta = float(
            np.abs(new_auths - auths).sum() + np.abs(new_hubs - hubs).sum()
        )
        auths, hubs = new_auths, new_hubs
        it += 1
        if checkpoint is not None and it % checkpoint.every == 0:
            save_iteration(
                checkpoint,
                it,
                graph.vids,
                {"hub": hubs, "auth": auths},
                {
                    "iteration": it,
                    "delta": delta,
                    "seconds": time.perf_counter() - ti,
                },
                input_token=graph.token,
            )
        if fixed_iterations is None and delta < tolerance:
            converged = True
            break
    return HitsResult(
        hubs=hubs,
        auths=auths,
        iterations=it,
        converged=converged,
        delta=delta,
        metrics={"total_seconds": time.perf_counter() - t0},
    )


def eigenvector_centrality(
    graph: GraphTables,
    tolerance: float = 1e-8,
    max_iterations: int = 200,
    fixed_iterations: Optional[int] = None,
) -> PageRankResult:
    """Eigenvector centrality (reference [later-branch] eigenvector
    variant of PageRankProc): power iteration on A^T with L2
    normalization per round; converges to the principal eigenvector.
    ``fixed_iterations`` pins the round count (no tolerance early-stop)
    so results are oracle-reproducible."""
    n = graph.n
    sg = graph.sharded()
    ranks = np.full(n, 1.0 / np.sqrt(n) if n else 0.0, dtype=np.float64)
    it, delta, converged = 0, float("inf"), False
    if fixed_iterations is not None:
        max_iterations = fixed_iterations
    t0 = time.perf_counter()
    while it < max_iterations:
        acc = sg.scatter_sum(ranks)
        norm = float(np.linalg.norm(acc))
        if norm == 0.0:
            ranks = acc
            converged = True
            break
        new = acc / norm
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        it += 1
        if fixed_iterations is None and delta < tolerance:
            converged = True
            break
    return PageRankResult(
        ranks=ranks, iterations=it, converged=converged, delta=delta,
        metrics={"total_seconds": time.perf_counter() - t0},
    )


def pagerank_numpy_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    *,
    damping: float = 0.85,
    iterations: int = 100,
    tol: float | None = 1e-6,
    weight: np.ndarray | None = None,
) -> np.ndarray:
    """Dense single-machine reference recurrence for tests (SURVEY §5.2)."""
    alpha = 1.0 - damping
    if weight is None:
        deg = np.bincount(src, minlength=n).astype(np.float64)
        contrib_w = np.ones(len(src))
    else:
        deg = np.bincount(src, weights=weight, minlength=n)
        contrib_w = weight
    with np.errstate(divide="ignore"):
        invdeg = np.where(deg > 0, 1.0 / deg, 0.0)
    r = np.full(n, alpha)
    for _ in range(iterations):
        acc = np.bincount(dst, weights=r[src] * invdeg[src] * contrib_w, minlength=n)
        new = alpha + damping * acc
        d1 = np.abs(new - r).sum()
        r = new
        if tol is not None and d1 < tol:
            break
    return r
