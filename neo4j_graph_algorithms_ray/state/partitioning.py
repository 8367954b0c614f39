"""Shuffle-width policy — every hash repartition in the repo derives
its partition count from the cluster size (and, when known, the data
size) instead of a hard-coded constant, so the same pipeline code is
right on a 4-CPU test session and a 256-node cluster.

Rule: at least one partition per cluster CPU (keeps every core busy
through the post-shuffle map stage), and roughly one partition per
``target_block_bytes`` of data when the caller knows the input size
(keeps individual blocks within the object-store comfort zone), capped
at 8 partitions per CPU (bounds shuffle metadata / tiny-block overhead).
"""

from __future__ import annotations

import os

import ray


def cluster_cpus() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:  # pragma: no cover - ray not initialised
        cpus = 0
    return cpus or (os.cpu_count() or 8)


def shuffle_width(
    size_bytes: int | None = None,
    *,
    target_block_bytes: int = 64 << 20,
    min_width: int = 1,
) -> int:
    """Partition count for a hash shuffle.

    Without a size hint: one partition per cluster CPU (keeps every
    core busy through the post-shuffle stage when the data is big
    enough to matter). With a size hint: ~one partition per
    ``target_block_bytes``, capped at 8 per CPU — so a few-MB table
    shuffles into a handful of blocks (a 32-wide exchange on 2 MB of
    keys is pure task/metadata overhead) while a multi-TB exchange
    still fans out across the whole cluster. Callers whose
    post-shuffle work is superlinear in the input (pair generation,
    wedge joins) should NOT pass a hint sized off the input — the
    CPU-floor default is the right width for them.
    """
    cpus = cluster_cpus()
    cap = _aggregator_memory_cap_width()
    if size_bytes is None or size_bytes <= 0:
        width = max(cpus, min_width)
    else:
        width = int(
            max(min_width, min(size_bytes // target_block_bytes + 1, cpus * 8))
        )
    if cap is not None:
        width = max(min(width, cap), min_width)
    return width


def _aggregator_memory_cap_width() -> int | None:
    """Width cap so ONE keyed exchange's aggregator-pool logical-memory
    request stays within ~15% of the cluster's logical memory.

    Ray's HashShuffleOperator sizes each aggregator's ``memory``
    request from ``num_partitions x target_max_block_size`` when it
    has no partition-size hint — i.e. the request scales with WIDTH,
    not with the data. Union plans in this repo run several keyed
    exchanges concurrently (minhash-LSH runs three), and a pool whose
    actors cannot all place makes its operator wait indefinitely while
    upstream maps starve behind it (observed end-to-end deadlock at
    10M docs: 3 pools requested ~125 GB of logical memory on a 94 GB
    node, 0 blocks/min). 15% per exchange leaves room for ~6
    concurrent exchanges plus the object store's own working set; on a
    multi-node cluster the budget scales with total cluster memory and
    aggregators SPREAD across nodes."""
    try:
        mem = ray.cluster_resources().get("memory")
    except Exception:  # pragma: no cover - ray not initialised
        return None
    if not mem:
        return None
    try:
        import ray.data as rd

        blk = rd.DataContext.get_current().target_max_block_size or (128 << 20)
    except Exception:  # pragma: no cover
        blk = 128 << 20
    return max(8, int(mem * 0.15 / blk))


def keyed_repartition(ds, width: int, keys):
    """Hash-partition ``ds`` on ``keys`` so every key is
    block-complete (the contract all per-block folds in this repo rely
    on). ``width <= 1`` degenerates to a PLAIN single-block
    repartition: one block trivially holds every key, and Ray's
    HashShuffleOperator pays a fixed aggregator-actor spin-up
    (~0.6-1.9 s measured on this box, scaling with partition count)
    that a plain Repartition (~0.1 s) does not — on a few-MB table the
    keyed exchange is pure overhead. At real widths the hash shuffle
    is the right tool and is used unchanged.

    The aggregator CPU-reservation cap that keeps concurrent keyed
    exchanges from starving upstream maps is set at PACKAGE IMPORT
    (``__init__.configure_ray_data``), not here: Datasets snapshot
    DataContext at creation, so a mutation at exchange-build time
    would never reach a plan whose source was built earlier."""
    if width <= 1:
        return ds.repartition(1)
    return ds.repartition(width, keys=list(keys))


def _leaf_size_bytes(op) -> int | None:
    """Size one LEAF logical operator knows about without execution:
    RefBundle footprints for in-memory leaves (from_pandas /
    from_arrow(_refs) / materialized InputData), the datasource's
    in-memory estimate for Read leaves."""
    data = getattr(op, "input_data", None)
    if data:
        try:
            return int(sum(b.size_bytes() for b in data))
        except Exception:
            return None
    src = getattr(op, "_datasource", None)
    if src is not None:
        try:
            est = src.estimate_inmemory_data_size()
            return int(est) if est else None
        except Exception:
            return None
    return None


def source_size_bytes(ds) -> int | None:
    """Best-effort *input* size of a Dataset without executing its plan.

    Walks the LOGICAL plan to its leaves and sums what each leaf knows:
    the parquet datasource's in-memory estimate for Read leaves (this
    survives map_batches / filter / union lineage, which
    ``ds.input_files()`` does not), RefBundle sizes for in-memory
    leaves (from_pandas / from_arrow_refs / materialized datasets).
    Returns None when no leaf knows its size — callers fall back to the
    CPU-floor shuffle width. Private-plan access is fully guarded: on
    any Ray-internals change this degrades to None, never raises.
    """
    try:
        stack = [ds._plan._logical_plan.dag]
    except Exception:
        return None
    total = 0
    known = False
    seen: set[int] = set()
    while stack:
        op = stack.pop()
        if id(op) in seen:
            continue
        seen.add(id(op))
        try:
            deps = op.input_dependencies
        except Exception:
            deps = None
        if deps:
            stack.extend(deps)
            continue
        sz = _leaf_size_bytes(op)
        if sz:
            total += sz
            known = True
    return total if known and total > 0 else None
