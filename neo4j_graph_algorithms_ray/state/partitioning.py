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
    if size_bytes is None or size_bytes <= 0:
        return max(cpus, min_width)
    return int(max(min_width, min(size_bytes // target_block_bytes + 1, cpus * 8)))


def keyed_repartition(ds, width: int, keys):
    """Hash-partition ``ds`` on ``keys`` so every key is
    block-complete (the contract all per-block folds in this repo rely
    on). ``width <= 1`` degenerates to a PLAIN single-block
    repartition: one block trivially holds every key, and Ray's
    HashShuffleOperator pays a fixed aggregator-actor spin-up
    (~0.6-1.9 s measured on this box, scaling with partition count)
    that a plain Repartition (~0.1 s) does not — on a few-MB table the
    keyed exchange is pure overhead. At real widths the hash shuffle
    is the right tool and is used unchanged."""
    if width <= 1:
        return ds.repartition(1)
    return ds.repartition(width, keys=list(keys))


def source_size_bytes(ds) -> int | None:
    """Best-effort *input* size of a Dataset without executing its plan.

    Sums the on-disk sizes of the plan's input files (metadata-only;
    works for read-rooted plans even under lazy transforms) and scales
    by a nominal 4x parquet-decompression factor. Returns None when the
    plan has no file inputs (e.g. from_pandas) — callers fall back to
    the CPU-floor shuffle width.
    """
    try:
        files = ds.input_files()
    except Exception:
        files = None
    if files:
        total = 0
        for f in files:
            try:
                total += os.path.getsize(f)
            except OSError:
                total = 0
                break
        if total > 0:
            return total * 4
    # materialized datasets know their object-store footprint without
    # executing anything — without this, every in-memory pipeline fell
    # back to the CPU-floor width (32 hash-shuffle aggregator actors
    # per exchange on a few-MB table is pure spin-up overhead)
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            sz = ds.size_bytes()
            if sz:
                return int(sz)
    except Exception:
        pass
    return None
