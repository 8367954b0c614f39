"""Windowed aggregates over the events log (streaming-shaped workload).

Ray Data is a batch engine (like the reference's snapshot model —
SURVEY.md §2.8 notes the reference has no stream-time semantics); the
events table is treated as an ordered, partitioned log: tumbling
windows are ``floor(ts / size)`` keys computed vectorized per batch,
pre-aggregated map-side and folded per (user, window) after a
hash-repartition — no global sort needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..state.partitioning import shuffle_width, source_size_bytes


def tumbling_window(
    events: "rd.Dataset",
    *,
    window: str = "1d",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "rd.Dataset":
    """(user_id, window_start, n_events, sum_value) per tumbling window."""
    size = pd.Timedelta(window)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        w = df[ts_col].dt.floor(size)
        g = df.groupby([df[user_col], w], sort=False, observed=True)
        out = g[value_col].agg(["size", "sum"]).reset_index()
        out.columns = ["user_id", "window_start", "n_events", "sum_value"]
        return out.astype({"user_id": "int64", "n_events": "int64"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "window_start"], sort=False, as_index=False)
        out = g.agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        return out

    return (
        events.map_batches(part, batch_format="pandas")
        .repartition(shuffle_width(source_size_bytes(events)), keys=["user_id"])
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def hopping_window(
    events: "rd.Dataset",
    *,
    size: str = "1d",
    hop: str = "6h",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "rd.Dataset":
    """(user_id, window_start, n_events, sum_value) per HOPPING window
    of width ``size`` advancing every ``hop`` (size must be a multiple
    of hop). Each event fans out to size/hop windows map-side — the
    pre-aggregation keeps the exchange at O(windows touched), not
    O(events × overlap)."""
    size_td = pd.Timedelta(size)
    hop_td = pd.Timedelta(hop)
    k = int(size_td / hop_td)
    if k * hop_td != size_td:
        raise ValueError("size must be a multiple of hop")

    def part(df: pd.DataFrame) -> pd.DataFrame:
        base = df[ts_col].dt.floor(hop_td)
        frames = []
        for i in range(k):
            w = base - i * hop_td
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": df[user_col].to_numpy(np.int64),
                        "window_start": w.to_numpy(),
                        "n": 1,
                        "v": df[value_col].to_numpy(np.float64),
                    }
                )
            )
        allw = pd.concat(frames, ignore_index=True)
        g = allw.groupby(["user_id", "window_start"], sort=False, as_index=False)
        return g.agg(n_events=("n", "sum"), sum_value=("v", "sum"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "window_start"], sort=False, as_index=False)
        return g.agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))

    return (
        events.map_batches(part, batch_format="pandas")
        .repartition(shuffle_width(source_size_bytes(events)), keys=["user_id"])
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


def sessionize(
    events: "rd.Dataset",
    *,
    gap: str = "30min",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> "rd.Dataset":
    """(user_id, session_id, session_start, session_end, n_events) —
    sessions split on gaps > ``gap``; per-user ordering established by a
    per-block sort AFTER hash-partitioning by user (each user's events
    complete in one block)."""
    gap_td = pd.Timedelta(gap)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col], kind="stable")
        new_user = df[user_col] != df[user_col].shift()
        gap_break = (df[ts_col] - df[ts_col].shift()) > gap_td
        sess = (new_user | gap_break).cumsum()
        g = df.groupby(sess, sort=False)
        out = pd.DataFrame(
            {
                "user_id": g[user_col].first().to_numpy(np.int64),
                "session_start": g[ts_col].min().to_numpy(),
                "session_end": g[ts_col].max().to_numpy(),
                "n_events": g.size().to_numpy(np.int64),
            }
        )
        # deterministic per-user ordinal (sessions are emitted in ts
        # order within each user, so the cumcount is stable across runs
        # and partitionings)
        out["session_id"] = out.groupby("user_id", sort=False).cumcount().astype(np.int64)
        return out

    return events.repartition(
        shuffle_width(source_size_bytes(events)), keys=[user_col]
    ).map_batches(
        per_user, batch_format="pandas", batch_size=None
    )
