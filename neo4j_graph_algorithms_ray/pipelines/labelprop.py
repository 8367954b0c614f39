"""Label propagation — synchronous LPA (reference: algo.labelPropagation).

Vote semantics follow the reference kernel
(``algo/.../impl/LabelPropagation.java``,
``algo/.../LabelPropagationProc.java``): each vertex adopts the label
with the maximum summed edge-weight vote among its in-neighbors under
the chosen direction (default BOTH/undirected); labels seed from a
node property (``partitionProperty``) or default to the vertex's own
id; a vertex with no neighbors keeps its label.

Semantics pin (SURVEY.md §5.3): the reference updates IN PLACE in batch
order (semi-asynchronous, nondeterministic under concurrency); we pin
SYNCHRONOUS rounds + min-label tie-break, which is deterministic across
runs and parallelism levels — the property the north rule's exact-match
gate actually needs. Fixtures are chosen where both schemes converge to
the same labeling.

Dataflow per iteration (SURVEY.md §2.3 C5):

    edges(BOTH) → map_batches: votes (di, labels[si], w) pre-aggregated
    per block (pandas groupby inside the task)
    → combine: groupby(["idx","lab"]).sum (shuffle mode) or a driver
      stream fold (dense mode)
    → argmax per vertex, ties → min label
    → synchronous swap; converged when no label changed.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..state.checkpoint import (
    CheckpointConfig,
    latest_complete,
    load_iteration,
    save_iteration,
)
from ..state.graph import GraphTables
from ..state.partitioning import keyed_repartition, shuffle_width


@dataclass(frozen=True)
class LabelPropagationConfig:
    max_iterations: int = 100
    fixed_iterations: Optional[int] = None
    weighted: bool = False
    directed: bool = False  # reference default direction is OUTGOING;
    # undirected (BOTH) is what the community fixtures use
    combine: str = "driver"  # or "shuffle"
    engine: str = "auto"  # "actor" (state.shards pool) | "dataflow" |
    # "range" (range-owner label shards, >10^8-vertex path) | "auto"
    checkpoint: Optional[CheckpointConfig] = None


@dataclass
class LabelPropagationResult:
    labels: np.ndarray  # original-id labels per dense vertex
    iterations: int
    converged: bool
    metrics: dict = field(default_factory=dict)


def _vote_partial(batch: pa.Table, *, lab_ref, weighted: bool) -> pa.Table:
    si = batch["si"].to_numpy(zero_copy_only=False)
    di = batch["di"].to_numpy(zero_copy_only=False)
    lab = ray.get(lab_ref)
    w = (
        batch["w"].to_numpy(zero_copy_only=False)
        if weighted
        else np.ones(len(si), dtype=np.float64)
    )
    df = pd.DataFrame({"idx": di, "lab": lab[si], "w": w})
    agg = df.groupby(["idx", "lab"], sort=False, as_index=False)["w"].sum()
    return pa.Table.from_pandas(agg, preserve_index=False)


def _argmax_votes(votes: pd.DataFrame) -> pd.DataFrame:
    """Per idx: label with max summed weight, ties → min label."""
    votes = votes.sort_values(["idx", "w", "lab"], ascending=[True, False, True])
    return votes.drop_duplicates("idx", keep="first")[["idx", "lab"]]


def label_propagation(
    graph: GraphTables,
    config: LabelPropagationConfig = LabelPropagationConfig(),
    seeds: Optional[np.ndarray] = None,
) -> LabelPropagationResult:
    """``seeds``: dense-indexed int64 array of initial labels (−1 = unseeded,
    defaults to the vertex's own original vid — the reference's behavior
    without ``partitionProperty``)."""
    t0 = time.perf_counter()
    n = graph.n
    vids = graph.vids
    labels = vids.copy()
    if seeds is not None:
        seeded = seeds >= 0
        labels[seeded] = seeds[seeded]
    use_actor = config.engine == "actor" or (
        config.engine == "auto" and graph.m >= 50_000
    )
    edges = graph.edges if config.directed else graph.edges_both()
    max_iters = (
        config.fixed_iterations
        if config.fixed_iterations is not None
        else config.max_iterations
    )
    it = 0
    converged = False
    ckpt = config.checkpoint
    if ckpt is not None and ckpt.resume:
        k = latest_complete(ckpt)
        if k is not None:
            _, vectors, _ = load_iteration(ckpt, k, expect_vids=graph.vids)
            labels = vectors["label"]
            it = k

    def maybe_ckpt(iteration: int, labs: np.ndarray, changed: int, secs: float):
        if ckpt is not None and iteration % ckpt.every == 0:
            save_iteration(
                ckpt,
                iteration,
                graph.vids,
                {"label": labs},
                {"iteration": iteration, "changed": changed, "seconds": secs},
                input_token=graph.token,
            )

    if config.engine == "range":
        # range-sharded labels (multi-node ceiling, same protocol as
        # PageRank/WCC range engines): per-vertex state lives in range
        # owners, vote triples flow shard→owner split by target range,
        # the driver folds R changed-counts per round — O(S·R) refs
        # instead of the O(S·n) partial fold. Bit-identical to the
        # actor engine (same vote fold + argmax + min-tie kernels).
        from ..state.shards import RangeEngine

        sg = graph.sharded()
        eng = RangeEngine(sg)
        eng.set_vector(arr=labels)
        while it < max_iters:
            ti = time.perf_counter()
            changed = eng.lpa_round(
                weighted=config.weighted, directed=config.directed
            )
            it += 1
            if ckpt is not None and it % ckpt.every == 0:
                labels = eng.collect()
                maybe_ckpt(it, labels, changed, time.perf_counter() - ti)
            if config.fixed_iterations is None and changed == 0:
                converged = True
                break
        labels = eng.collect()
        return LabelPropagationResult(
            labels=labels,
            iterations=it,
            converged=converged,
            metrics={
                "seconds": time.perf_counter() - t0,
                "engine": "range",
                "num_ranges": eng.num_ranges,
            },
        )
    if use_actor:
        sg = graph.sharded()
        while it < max_iters:
            ti = time.perf_counter()
            new_labels = sg.lpa_round(
                labels, weighted=config.weighted, directed=config.directed
            )
            it += 1
            changed = new_labels != labels
            labels = new_labels
            maybe_ckpt(it, labels, int(changed.sum()), time.perf_counter() - ti)
            if config.fixed_iterations is None and not changed.any():
                converged = True
                break
        return LabelPropagationResult(
            labels=labels,
            iterations=it,
            converged=converged,
            metrics={"seconds": time.perf_counter() - t0, "engine": "actor"},
        )
    while it < max_iters:
        ti = time.perf_counter()
        lab_ref = ray.put(labels)
        parts = edges.map_batches(
            _vote_partial,
            batch_format="pyarrow",
            batch_size=None,
            fn_kwargs={"lab_ref": lab_ref, "weighted": config.weighted},
        )
        if config.combine == "shuffle":
            # hash-partition by vertex: all votes for a vertex land in one
            # block, so vote-fold AND argmax run distributed per block
            def fold_argmax(df: pd.DataFrame) -> pd.DataFrame:
                v = df.groupby(["idx", "lab"], sort=False, as_index=False)["w"].sum()
                return _argmax_votes(v)

            from ..state.partitioning import source_size_bytes

            parts = keyed_repartition(
                parts, shuffle_width(source_size_bytes(parts)), ["idx"]
            ).map_batches(fold_argmax, batch_format="pandas", batch_size=None)
        chunks = [
            b.to_pandas()
            for b in parts.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        new_labels = labels.copy()
        if chunks:
            votes = pd.concat(chunks, ignore_index=True)
            if config.combine == "shuffle":
                best = votes  # already per-vertex argmax, disjoint blocks
            else:
                votes = votes.groupby(["idx", "lab"], sort=False, as_index=False)["w"].sum()
                best = _argmax_votes(votes)
            new_labels[best["idx"].to_numpy()] = best["lab"].to_numpy()
        it += 1
        changed = new_labels != labels
        labels = new_labels
        maybe_ckpt(it, labels, int(changed.sum()), time.perf_counter() - ti)
        if config.fixed_iterations is None and not changed.any():
            converged = True
            break
    return LabelPropagationResult(
        labels=labels,
        iterations=it,
        converged=converged,
        metrics={"seconds": time.perf_counter() - t0},
    )


def label_propagation_table(graph: GraphTables, config=LabelPropagationConfig(), seeds=None) -> pa.Table:
    res = label_propagation(graph, config, seeds)
    return graph.to_table({"label": res.labels})
