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
    target_block_bytes: int = 128 << 20,
    min_width: int = 1,
) -> int:
    cpus = cluster_cpus()
    width = cpus
    if size_bytes is not None and size_bytes > 0:
        width = max(cpus, min(size_bytes // target_block_bytes + 1, cpus * 8))
    return max(int(width), min_width)
