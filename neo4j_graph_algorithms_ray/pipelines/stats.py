"""Result-stats builders (reference: the ``WriteResult`` percentile
fields every procedure returns — e.g. ``UnionFindProc`` streams
``setCount`` plus p1/p5/.../p100 of community sizes,
``algo/.../results/AbstractCommunityResultBuilder.java`` [public
tree]). The percentile definition is the discrete order statistic
"smallest value whose rank ≥ ceil(q·n/100)" — exactly reproducible in
SQL as a cumulative-rank window, no interpolation ambiguity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_QS = (1, 5, 10, 25, 50, 75, 90, 95, 99, 100)


def size_percentiles(labels: np.ndarray, qs=_QS) -> pa.Table:
    """(stat, value) rows for a per-vertex label assignment: set_count
    plus the q-th percentiles of the label-group sizes. ``labels`` is
    the dense per-vertex community/component vector (the same O(n)
    representation every community kernel already returns)."""
    sizes = np.unique(labels, return_counts=True)[1]
    order = np.sort(sizes)
    n = len(order)
    stats = ["set_count"]
    vals = [n]
    for q in qs:
        rank = max(1, int(np.ceil(q * n / 100.0)))
        stats.append(f"p{q}")
        vals.append(int(order[min(rank, n) - 1]))
    return pa.table(
        {"stat": stats, "value": np.asarray(vals, dtype=np.int64)}
    )
