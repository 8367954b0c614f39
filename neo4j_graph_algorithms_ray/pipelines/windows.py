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

from ..state.partitioning import (
    keyed_repartition,
    shuffle_width,
    source_size_bytes,
)


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

    return keyed_repartition(
        events.map_batches(part, batch_format="pandas"),
        shuffle_width(source_size_bytes(events)),
        ["user_id"],
    ).map_batches(_window_fold, batch_format="pyarrow", batch_size=None)


def _window_fold(t: "pa.Table") -> "pa.Table":
    """(user_id, window_start) partial-sum fold — zero-copy Arrow
    group_by (this stage is pure integers/sums; only the map-side
    ``part`` stages need pandas datetime ops)."""
    import pyarrow as pa

    g = t.group_by(["user_id", "window_start"]).aggregate(
        [("n_events", "sum"), ("sum_value", "sum")]
    )
    return g.select(
        ["user_id", "window_start", "n_events_sum", "sum_value_sum"]
    ).rename_columns(["user_id", "window_start", "n_events", "sum_value"])


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

    return keyed_repartition(
        events.map_batches(part, batch_format="pandas"),
        shuffle_width(source_size_bytes(events)),
        ["user_id"],
    ).map_batches(_window_fold, batch_format="pyarrow", batch_size=None)


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

    return keyed_repartition(
        events, shuffle_width(source_size_bytes(events)), [user_col]
    ).map_batches(per_user, batch_format="pandas", batch_size=None)


def funnel(
    events: "rd.Dataset",
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> "rd.Dataset":
    """Ordered-sequence funnel analysis over an event stream: per user,
    how far through ``steps`` they progressed, where step i counts only
    at the EARLIEST event of that type STRICTLY AFTER the user's step
    i-1 time (first-touch attribution, the standard product-analytics
    funnel). Emits one row per user:
    ``(user_id, steps_completed, converted, time_to_convert_us)`` —
    time is -1 for non-converted users (no NULLs, exact SQL parity).

    Dataflow: one projection pass keeps only step-typed events as
    ``(user, step_idx, ts_us)`` — the shuffle carries 24 B/event for
    relevant types only — then a single hash repartition on the user
    key makes each user block-complete; the per-block fold walks the
    ``len(steps)`` stages as whole-column pandas merges (no per-user
    Python). Same partitioning contract as :func:`sessionize`: one
    user's (filtered) events fit one block.

    Timestamp contract: ``ts_col`` is projected to MICROSECOND int64
    and the stage-walk keeps it int64 end-to-end with a separate
    reachability mask (no NaN-in-float carrier), so comparisons and
    the final subtraction are exact for the full int64 range — safe
    even if a caller feeds nanosecond-scale values > 2^53.
    """
    idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m = df[type_col].isin(idx).to_numpy()
        return pd.DataFrame(
            {
                "u": df[user_col].to_numpy(np.int64)[m],
                "step": df[type_col].map(idx).to_numpy()[m].astype(np.int64),
                "ts_us": df[ts_col].to_numpy("datetime64[us]").astype(np.int64)[m],
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "steps_completed": pd.Series([], dtype="int64"),
                    "converted": pd.Series([], dtype="int64"),
                    "time_to_convert_us": pd.Series([], dtype="int64"),
                }
            )
        users = np.unique(df["u"].to_numpy(np.int64))
        upos = pd.Series(np.arange(len(users), dtype=np.int64), index=users)
        # t[i]: per-user first time of step i STRICTLY AFTER t[i-1].
        # Timestamps stay int64 throughout; reachability is a separate
        # boolean mask (not NaN-in-float), so ns-scale values > 2^53
        # would still compare and subtract exactly.
        imax = np.iinfo(np.int64).max
        cur = np.full(len(users), -1, dtype=np.int64)  # step -1 sentinel
        cur_ok = np.ones(len(users), dtype=bool)
        first_t = np.zeros(len(users), dtype=np.int64)
        done = np.zeros(len(users), dtype=np.int64)
        for i in range(k):
            ev = df[df["step"] == i]
            nxt = np.full(len(users), imax, dtype=np.int64)
            if len(ev):
                pos = upos.reindex(ev["u"].to_numpy(np.int64)).to_numpy(np.int64)
                ts = ev["ts_us"].to_numpy(np.int64)
                ok = cur_ok[pos] & (ts > cur[pos])
                np.minimum.at(nxt, pos[ok], ts[ok])
            cur_ok = nxt != imax
            cur = np.where(cur_ok, nxt, -1)
            done += cur_ok.astype(np.int64)
            if i == 0:
                first_t = cur.copy()
        converted = (done == k).astype(np.int64)
        ttc = np.where(converted == 1, cur - first_t, -1).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "steps_completed": done,
                "converted": converted,
                "time_to_convert_us": ttc,
            }
        )

    return keyed_repartition(
        events.map_batches(project, batch_format="pandas"),
        shuffle_width(source_size_bytes(events)),
        ["u"],
    ).map_batches(fold, batch_format="pandas", batch_size=None)
