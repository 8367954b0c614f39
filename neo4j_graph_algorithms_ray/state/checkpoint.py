"""Per-iteration Parquet checkpoints with lineage + metrics (north rule).

The reference has NO checkpointing (a procedure call is all-or-nothing,
SURVEY.md §4.1); resumability is a requirement of OUR engine: every
iterative kernel can write, per iteration, a directory

    <dir>/iter=<K>/
        state.parquet     per-vertex state (vid + one column per vector)
        lineage.json      {iteration, n, rows, input_token, vectors,
                           partitions: [{partition_id, rows, vid_min,
                           vid_max, checksum}], sha_invariant}
        metrics.json      per-iteration convergence / throughput metrics
        _SUCCESS          atomic completion marker (written last)

Resume scans for the highest complete (``_SUCCESS``-marked) iteration
and restarts the driver loop from there; the edge Dataset is rebuilt
deterministically from its source, so the resumed run is bit-identical
to an uninterrupted one (tested in tests/test_resume.py).

State here is a dense driver-side vector, so the state write is a single
small parquet file; partition lineage entries describe vid ranges of the
written row groups. At sharded-vector scale the same layout holds with
one file per shard, written by the shard's owner task.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class CheckpointConfig:
    dir: str
    every: int = 1  # checkpoint every K iterations
    resume: bool = True
    rows_per_partition: int = 1 << 20


def _iter_dir(root: str, k: int) -> str:
    return os.path.join(root, f"iter={k:05d}")


def _checksum(arrs: list[np.ndarray]) -> int:
    c = 0
    for a in arrs:
        c = zlib.crc32(np.ascontiguousarray(a).tobytes(), c)
    return c


def save_iteration(
    cfg: CheckpointConfig,
    iteration: int,
    vids: np.ndarray,
    vectors: dict[str, np.ndarray],
    metrics: dict,
    input_token: str = "",
) -> str:
    d = _iter_dir(cfg.dir, iteration)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = len(vids)
    parts = []
    step = max(1, cfg.rows_per_partition)
    tbl = pa.table({"vid": vids, **vectors})
    pq.write_table(tbl, os.path.join(tmp, "state.parquet"), row_group_size=step)
    for pid, lo in enumerate(range(0, max(n, 1), step)):
        hi = min(lo + step, n)
        if lo >= n:
            break
        parts.append(
            {
                "partition_id": pid,
                "rows": hi - lo,
                "vid_min": int(vids[lo]) if n else None,
                "vid_max": int(vids[hi - 1]) if n else None,
                # sorted name order — load_iteration verifies against
                # lineage["vectors"] (sorted), so dict insertion order
                # must not leak into the checksum (it did: the first
                # multi-vector checkpoint, HITS' {hub, auth}, failed
                # verification on every resume)
                "checksum": _checksum(
                    [vids[lo:hi]] + [vectors[v][lo:hi] for v in sorted(vectors)]
                ),
            }
        )
    lineage = {
        "iteration": iteration,
        "n": n,
        "rows": n,
        "input_token": input_token,
        "vectors": sorted(vectors),
        "partitions": parts,
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=1)
    with open(os.path.join(tmp, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    if os.path.isdir(d):  # stale partial from a killed run
        import shutil

        shutil.rmtree(d)
    os.replace(tmp, d)
    # marker written only after the rename → directory is complete iff marked
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")
    return d


def latest_complete(cfg: CheckpointConfig) -> Optional[int]:
    if not os.path.isdir(cfg.dir):
        return None
    best = None
    for name in os.listdir(cfg.dir):
        if not name.startswith("iter="):
            continue
        d = os.path.join(cfg.dir, name)
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            k = int(name.split("=", 1)[1])
            best = k if best is None else max(best, k)
    return best


def load_iteration(
    cfg: CheckpointConfig,
    iteration: int,
    expect_vids: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, dict[str, np.ndarray], dict]:
    """Load a checkpointed iteration; if ``expect_vids`` is given, refuse
    checkpoints whose vertex set differs from the resuming graph (guards
    against a checkpoint dir shared by runs over different inputs —
    GraphTables tokens are per-process uuids, so identity is checked on
    the deterministic vid array itself)."""
    d = _iter_dir(cfg.dir, iteration)
    tbl = pq.read_table(os.path.join(d, "state.parquet"))
    with open(os.path.join(d, "lineage.json")) as f:
        lineage = json.load(f)
    vids = tbl["vid"].to_numpy(zero_copy_only=False)
    if expect_vids is not None and (
        len(vids) != len(expect_vids) or not np.array_equal(vids, expect_vids)
    ):
        raise IOError(
            f"checkpoint lineage mismatch: iter={iteration} holds "
            f"{len(vids)} vids that differ from the resuming graph's "
            f"{len(expect_vids)} — refusing to adopt state from a "
            "different input"
        )
    vectors = {
        name: tbl[name].to_numpy(zero_copy_only=False) for name in lineage["vectors"]
    }
    # verify partition checksums (lineage integrity gate)
    step = lineage["partitions"][0]["rows"] if lineage["partitions"] else 1
    for p in lineage["partitions"]:
        lo = p["partition_id"] * step
        hi = lo + p["rows"]
        got = _checksum([vids[lo:hi]] + [vectors[v][lo:hi] for v in lineage["vectors"]])
        if got != p["checksum"]:
            raise IOError(
                f"checkpoint corrupt: partition {p['partition_id']} checksum mismatch"
            )
    return vids, vectors, lineage
