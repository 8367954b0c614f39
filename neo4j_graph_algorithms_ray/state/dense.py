"""Dense per-vertex state + map-side pre-aggregated scatter/combine.

The reference engine (mknblch/neo4j-graph-algorithms) keeps all
per-vertex algorithm state in flat primitive arrays indexed by a dense
int id (``core/utils/AtomicDoubleArray.java``, the ``double[]`` rank
arrays in ``algo/impl/PageRank.java``) and accumulates across threads
with atomics. Ray workers share no memory, so the equivalent here is:

- the per-vertex vector is a numpy array ``ray.put`` into the object
  store once per round and read zero-copy by every task;
- scatter is a ``map_batches`` over the (materialized) edge Dataset in
  which each task PRE-AGGREGATES its block's contributions down to one
  row per touched vertex (``np.bincount`` over block-locally factorized
  destination ids) — the map-side combiner the reference gets for free
  from shared memory;
- combine is either (a) ``combine="driver"``: the small per-block
  partials stream back through ``iter_batches`` and are folded into the
  dense output vector (a tree-reduce whose final fan-in is the driver —
  appropriate while the vertex count fits one machine, which is the same
  assumption the dense vector itself makes), or (b)
  ``combine="shuffle"``: a Ray-native ``groupby("idx").aggregate`` hash
  shuffle whose (already pre-aggregated) result is then streamed into
  the dense vector. Both paths are tested for agreement
  (cross-representation agreement, SURVEY.md §5.2); "driver" is the
  default because at sandbox scale the extra shuffle is pure overhead.

Scale note (100 TB / 10^12 files): the dense vector holds ~8 bytes per
vertex — fine to ~10^9 repo vertices (8 GB in the object store, read
zero-copy per node, shipped once per round per node, not per task-batch
re-serialized, because every task on a node maps the same plasma
buffer). Beyond that the upgrade path is range-sharded vectors
co-partitioned with the (src-sorted) edge blocks; the partial-row
protocol here is unchanged.

A process-global block cache amortizes per-block factorization
(np.unique of the destination column) across iterations: Ray reuses
worker processes across Dataset executions within a session, so the
cache keyed by a content fingerprint survives the per-iteration
map_batches calls without requiring long-lived actors.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray

# Process-global cache: {(token, fingerprint...): value}. Bounded FIFO.
_BLOCK_CACHE: dict[tuple, object] = {}
_BLOCK_CACHE_MAX = 512


def block_cache_key(token: str, *arrays: np.ndarray) -> tuple:
    """Cheap deterministic fingerprint of block contents.

    O(n) (one vectorized sum per array); collision-safe in practice for
    blocks of one materialized dataset (length, ends, midpoint and full
    wrapping int64 sum all have to collide simultaneously).
    """
    parts: list = [token]
    for a in arrays:
        k = len(a)
        parts.append(k)
        if k:
            parts.extend(
                (int(a[0]), int(a[-1]), int(a[k // 2]), int(a.sum(dtype=np.int64)))
            )
    return tuple(parts)


def cache_get(key: tuple):
    return _BLOCK_CACHE.get(key)


def cache_put(key: tuple, value) -> None:
    if len(_BLOCK_CACHE) >= _BLOCK_CACHE_MAX:
        # FIFO eviction; dict preserves insertion order.
        _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))
    _BLOCK_CACHE[key] = value


def group_sum(idx: np.ndarray, val: np.ndarray, token: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Block-local (idx → sum(val)) pre-aggregation; factorization cached."""
    ent = None
    key = None
    if token is not None:
        key = block_cache_key(token, idx)
        ent = cache_get(key)
    if ent is None:
        uniq, inverse = np.unique(idx, return_inverse=True)
        if key is not None:
            cache_put(key, (uniq, inverse))
    else:
        uniq, inverse = ent
    sums = np.bincount(inverse, weights=val, minlength=len(uniq))
    return uniq, sums


def group_min(idx: np.ndarray, val: np.ndarray, token: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Block-local (idx → min(val)) pre-aggregation (vectorized, no .at)."""
    order = np.lexsort((val, idx))
    si, sv = idx[order], val[order]
    first = np.ones(len(si), dtype=bool)
    if len(si):
        first[1:] = si[1:] != si[:-1]
    return si[first], sv[first]


def _combine_driver(parts, n: int, op: str, out: np.ndarray) -> np.ndarray:
    for batch in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = batch["idx"].to_numpy(zero_copy_only=False)
        val = batch["val"].to_numpy(zero_copy_only=False)
        if op == "sum":
            np.add.at(out, idx, val)
        elif op == "min":
            np.minimum.at(out, idx, val)
        elif op == "max":
            np.maximum.at(out, idx, val)
        elif op == "or":  # bitmask union (MSBFS); driver combine only
            np.bitwise_or.at(out, idx, val)
        else:  # pragma: no cover
            raise ValueError(op)
    return out


def _combine_shuffle(parts, n: int, op: str, out: np.ndarray, num_partitions: int = 8) -> np.ndarray:
    """Distributed combine: hash-repartition partials by ``idx`` so each
    key lands in exactly one block, fold per block with pandas (C speed —
    Ray's ``groupby().aggregate`` costs ~1 ms per distinct group, measured
    pathological at high key cardinality), then stream the disjoint folded
    blocks into the dense vector."""
    pd_op = {"sum": "sum", "min": "min", "max": "max"}[op]

    def fold(df):
        import pandas as pd  # noqa: F401

        return df.groupby("idx", sort=False, as_index=False)["val"].agg(pd_op)

    from .partitioning import keyed_repartition

    small = keyed_repartition(parts, num_partitions, ["idx"]).map_batches(
        fold, batch_format="pandas", batch_size=None
    )
    return _combine_driver(small, n, op, out)


def dense_combine(
    parts,
    n: int,
    *,
    op: str = "sum",
    combine: str = "driver",
    init: np.ndarray | float = 0.0,
    dtype=np.float64,
) -> np.ndarray:
    """Fold a Dataset of pre-aggregated ``(idx, val)`` partial rows into a
    dense length-``n`` vector with ``op`` ∈ {sum, min, max}."""
    if isinstance(init, np.ndarray):
        out = init
    else:
        out = np.full(n, init, dtype=dtype)
    if combine == "shuffle":
        return _combine_shuffle(parts, n, op, out)
    return _combine_driver(parts, n, op, out)


def scatter_combine(
    edges,
    partial_fn: Callable[[pa.Table], pa.Table],
    n: int,
    *,
    op: str = "sum",
    combine: str = "driver",
    init: np.ndarray | float = 0.0,
    dtype=np.float64,
) -> np.ndarray:
    """One gather-scatter round: ``edges.map_batches(partial_fn)`` (each
    task emits pre-aggregated ``(idx, val)`` rows) then a dense combine.
    """
    parts = edges.map_batches(partial_fn, batch_format="pyarrow", batch_size=None)
    return dense_combine(parts, n, op=op, combine=combine, init=init, dtype=dtype)


def put_vector(vec: np.ndarray) -> ray.ObjectRef:
    """Broadcast a dense per-vertex vector (zero-copy reads in workers)."""
    return ray.put(vec)
