"""Write-back sinks (reference write modes: ``algo.pageRank(...,
write:true, writeProperty:'pagerank')`` node-property write-back and
``algo.similarity.*(..., write:true)`` relationship write-back —
``algo/.../results/*WriteResult`` [public tree]). Here the store is
partitioned Parquet:

- one file per vid-range / result shard (never one giant file),
- a ``_SUCCESS`` marker written only after every partition landed,
- re-runs SKIP partitions whose file already exists (resumable after a
  mid-write failure — the north rule's resumability requirement applied
  to outputs).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote
def _write_part(path: str, table: pa.Table) -> int:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: a crash never leaves a partial file
    return table.num_rows


def write_node_properties(
    graph,
    vectors: dict[str, np.ndarray],
    path: str,
    partitions: Optional[int] = None,
) -> dict:
    """Node-property write mode: dense per-vertex vectors → vid-keyed
    partitioned parquet under ``path``. Returns {rows, partitions,
    skipped} — ``skipped`` counts partitions already present from a
    previous (interrupted) run."""
    os.makedirs(path, exist_ok=True)
    n = graph.n
    vids = graph.vids
    P = partitions or max(1, min(256, n // 65536 or 1))
    cuts = np.linspace(0, n, P + 1).astype(np.int64)
    futs, skipped = [], 0
    for i in range(P):
        f = os.path.join(path, f"part-{i:05d}.parquet")
        if os.path.exists(f):
            skipped += 1
            continue
        lo, hi = int(cuts[i]), int(cuts[i + 1])
        cols: dict = {"vid": vids[lo:hi]}
        for name, vec in vectors.items():
            cols[name] = vec[lo:hi]
        futs.append(_write_part.remote(f, pa.table(cols)))
    rows = int(sum(ray.get(futs))) if futs else 0
    with open(os.path.join(path, "_SUCCESS"), "w") as fh:
        fh.write("")
    return {"rows": rows, "partitions": P, "skipped": skipped}


def write_relationships(result, path: str) -> dict:
    """Relationship write mode: an edge-shaped result (Dataset or
    DataFrame, e.g. similarity pairs / MST edges / path rows) →
    partitioned parquet + ``_SUCCESS``. Datasets stream block-by-block
    (one file per block, never concatenated); DataFrames write as one
    partition."""
    import ray.data as rd

    os.makedirs(path, exist_ok=True)
    if isinstance(result, pd.DataFrame):
        rows = int(
            ray.get(
                _write_part.remote(
                    os.path.join(path, "part-00000.parquet"),
                    pa.Table.from_pandas(result, preserve_index=False),
                )
            )
        )
        parts = 1
    elif isinstance(result, rd.Dataset):
        result.write_parquet(path)
        rows = int(result.count())
        parts = None  # one file per block, sized by the executor
    else:  # pragma: no cover
        raise TypeError(type(result))
    with open(os.path.join(path, "_SUCCESS"), "w") as fh:
        fh.write("")
    return {"rows": rows, "partitions": parts}
