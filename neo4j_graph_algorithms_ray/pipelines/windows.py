"""Windowed aggregates over the events log (streaming-shaped workload).

Ray Data is a batch engine (like the reference's snapshot model —
SURVEY.md §2.8 notes the reference has no stream-time semantics); the
events table is treated as an ordered, partitioned log: tumbling
windows are ``floor(ts / size)`` keys computed vectorized per batch,
pre-aggregated map-side and folded per (user, window) after a
hash-repartition — no global sort needed.

All stages are zero-copy Arrow (round-5 pandas burn-down): window
floors are int64 nanosecond arithmetic (``ts - ts % size`` — numpy's
non-negative modulo IS floor semantics, matching the former pandas
``dt.floor`` bit-for-bit including pre-epoch timestamps), group folds
are lexsort + ``reduceat``, and every shuffle input is pruned to the
columns the fold reads before the exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..state.partitioning import (
    keyed_repartition,
    shuffle_width,
    source_size_bytes,
)


def _ts_ns(t: pa.Table, ts_col: str) -> np.ndarray:
    return (
        t[ts_col]
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[ns]")
        .astype(np.int64)
    )


def _group_fold_uw(
    u: np.ndarray, w: np.ndarray, v: np.ndarray
) -> pa.Table:
    """(user_id, window_start, n_events, sum_value) pre-aggregated per
    (user, window) — one lexsort + reduceat."""
    if not len(u):
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "window_start": pa.array([], pa.timestamp("ns")),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
    order = np.lexsort((w, u))
    uu, ww, vv = u[order], w[order], v[order]
    first = np.ones(len(uu), dtype=bool)
    first[1:] = (uu[1:] != uu[:-1]) | (ww[1:] != ww[:-1])
    starts = np.flatnonzero(first)
    return pa.table(
        {
            "user_id": uu[starts],
            "window_start": ww[starts].astype("datetime64[ns]"),
            "n_events": np.diff(np.append(starts, len(uu))).astype(np.int64),
            "sum_value": np.add.reduceat(vv, starts),
        }
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
    size_ns = int(pd.Timedelta(window).value)

    def part(t: pa.Table) -> pa.Table:
        ts = _ts_ns(t, ts_col)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return _group_fold_uw(u, ts - (ts % size_ns), v)

    return keyed_repartition(
        events.select_columns([user_col, ts_col, value_col]).map_batches(
            part, batch_format="pyarrow"
        ),
        shuffle_width(source_size_bytes(events)),
        ["user_id"],
    ).map_batches(_window_fold, batch_format="pyarrow", batch_size=None)


def _window_fold(t: "pa.Table") -> "pa.Table":
    """(user_id, window_start) partial-sum fold — zero-copy Arrow
    group_by (pure integers/sums)."""
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
    size_ns = int(pd.Timedelta(size).value)
    hop_ns = int(pd.Timedelta(hop).value)
    k = size_ns // hop_ns
    if k * hop_ns != size_ns:
        raise ValueError("size must be a multiple of hop")

    def part(t: pa.Table) -> pa.Table:
        ts = _ts_ns(t, ts_col)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        base = ts - (ts % hop_ns)
        # k-window fan-out, doc-major: window i is base - i*hop
        w = (base[None, :] - (np.arange(k, dtype=np.int64) * hop_ns)[:, None]).ravel()
        return _group_fold_uw(np.tile(u, k), w, np.tile(v, k))

    return keyed_repartition(
        events.select_columns([user_col, ts_col, value_col]).map_batches(
            part, batch_format="pyarrow"
        ),
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
    gap_ns = int(pd.Timedelta(gap).value)

    def per_user(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_ns(t, ts_col)
        order = np.lexsort((ts, u))
        uu, tt = u[order], ts[order]
        brk = np.ones(len(uu), dtype=bool)
        if len(uu):
            brk[1:] = (uu[1:] != uu[:-1]) | ((tt[1:] - tt[:-1]) > gap_ns)
        starts = np.flatnonzero(brk)
        runs = np.diff(np.append(starts, len(uu)))
        su = uu[starts]
        # within a session ts is ascending, so end = last element
        ends = tt[np.append(starts[1:], len(uu)) - 1] if len(starts) else tt[:0]
        # deterministic per-user ordinal (sessions are emitted in ts
        # order within each user, so the rank is stable across runs
        # and partitionings)
        ufirst = np.ones(len(su), dtype=bool)
        if len(su):
            ufirst[1:] = su[1:] != su[:-1]
        ustarts = np.flatnonzero(ufirst)
        uruns = np.diff(np.append(ustarts, len(su)))
        sid = np.arange(len(su), dtype=np.int64) - np.repeat(ustarts, uruns)
        return pa.table(
            {
                "user_id": su,
                "session_start": tt[starts].astype("datetime64[ns]"),
                "session_end": ends.astype("datetime64[ns]"),
                "n_events": runs.astype(np.int64),
                "session_id": sid,
            }
        )

    return keyed_repartition(
        events.select_columns([user_col, ts_col]),
        shuffle_width(source_size_bytes(events)),
        [user_col],
    ).map_batches(per_user, batch_format="pyarrow", batch_size=None)


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
    ``len(steps)`` stages as whole-column numpy passes (no per-user
    Python). Same partitioning contract as :func:`sessionize`: one
    user's (filtered) events fit one block.

    Timestamp contract: ``ts_col`` is projected to MICROSECOND int64
    and the stage-walk keeps it int64 end-to-end with a separate
    reachability mask (no NaN-in-float carrier), so comparisons and
    the final subtraction are exact for the full int64 range — safe
    even if a caller feeds nanosecond-scale values > 2^53.
    """
    k = len(steps)
    steps_arr = pa.array(list(steps))

    def project(t: pa.Table) -> pa.Table:
        sidx = pc.index_in(t[type_col], value_set=steps_arr)
        m = pc.is_valid(sidx)
        return pa.table(
            {
                "u": pc.filter(t[user_col], m).cast(pa.int64()),
                "step": pc.filter(sidx, m).cast(pa.int64()),
                "ts_us": pa.array(
                    pc.filter(t[ts_col], m)
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64)
                ),
            }
        )

    _FUNNEL_SCHEMA = pa.schema(
        [
            ("user_id", pa.int64()),
            ("steps_completed", pa.int64()),
            ("converted", pa.int64()),
            ("time_to_convert_us", pa.int64()),
        ]
    )

    def fold(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _FUNNEL_SCHEMA.empty_table()
        uarr = t["u"].to_numpy(zero_copy_only=False)
        steparr = t["step"].to_numpy(zero_copy_only=False)
        tsarr = t["ts_us"].to_numpy(zero_copy_only=False)
        users = np.unique(uarr)
        pos_all = np.searchsorted(users, uarr)
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
            m = steparr == i
            nxt = np.full(len(users), imax, dtype=np.int64)
            if m.any():
                pos = pos_all[m]
                ts = tsarr[m]
                ok = cur_ok[pos] & (ts > cur[pos])
                np.minimum.at(nxt, pos[ok], ts[ok])
            cur_ok = nxt != imax
            cur = np.where(cur_ok, nxt, -1)
            done += cur_ok.astype(np.int64)
            if i == 0:
                first_t = cur.copy()
        converted = (done == k).astype(np.int64)
        ttc = np.where(converted == 1, cur - first_t, -1).astype(np.int64)
        return pa.table(
            {
                "user_id": users,
                "steps_completed": done,
                "converted": converted,
                "time_to_convert_us": ttc,
            }
        )

    return keyed_repartition(
        events.select_columns([user_col, ts_col, type_col]).map_batches(
            project, batch_format="pyarrow"
        ),
        shuffle_width(source_size_bytes(events)),
        ["u"],
    ).map_batches(fold, batch_format="pyarrow", batch_size=None)
