"""Temporal joins Ray Data lacks natively, built as compositions of
map_batches + one keyed repartition: as-of join — for every left row, the latest right row of the
same key with ``on``-value ≤ the left's (backward, inclusive — the
semantics of DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.on >= r.on``).

Partitioning assumption (documented per the brief): after the hash
repartition on the ``by`` key, EVERY row of one key lands in one block
(``batch_size=None`` → the fold sees whole keys). Keys are users /
sessions / entities — far smaller than a block at any scale; skewed
hot keys cost one oversized block, not correctness. The shuffle
carries only the pruned (by, on, payload) projection of both sides.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..state.partitioning import shuffle_width

_SIDE = "__asof_side"


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    by: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    width: Optional[int] = None,
) -> "rd.Dataset":
    """Left as-of join: one output row per left row, carrying
    ``left_cols`` plus ``right_cols`` from the matched right row (nulls
    when no right row of the key precedes it). ``left_cols`` /
    ``right_cols`` must be disjoint and exclude ``on`` / ``by`` (those
    are always carried from the left row; expose the matched right
    timestamp by duplicating it into a right payload column upstream).

    Ties on (by, on) in the right side resolve to the row that sorts
    LAST by the right payload columns — mirror it in SQL by
    pre-aggregating the right side (``GROUP BY by, on`` + MAX), which
    is what a well-defined as-of needs anyway. Unmatched integer right
    payloads surface as float64 (pandas null promotion); filter matched
    rows before casting back.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap or {on, by} & (set(left_cols) | set(right_cols)):
        raise ValueError(f"payload columns must be disjoint and exclude on/by: {overlap}")

    l_schema, r_schema = left.schema(), right.schema()

    def typ(schema, name):
        base = schema.base_schema
        if hasattr(base, "field"):  # pyarrow.Schema
            return base.field(name).type
        # PandasBlockSchema: parallel name/dtype lists
        dt = dict(zip(base.names, base.types))[name]
        try:
            return pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # object dtype: strings in this codebase

    fields = (
        [(by, typ(l_schema, by)), (on, typ(l_schema, on)), (_SIDE, pa.int8())]
        + [(c, typ(l_schema, c)) for c in left_cols]
        + [(c, typ(r_schema, c)) for c in right_cols]
    )

    def norm(side: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for name, ty in fields:
                if name == _SIDE:
                    cols[name] = pa.array(np.full(len(t), side, np.int8))
                elif name in t.column_names:
                    cols[name] = t[name].cast(ty)
                else:
                    cols[name] = pa.nulls(len(t), ty)
            return pa.table(cols)

        return f

    combined = (
        left.select_columns([by, on, *left_cols])
        .map_batches(norm(0), batch_format="pyarrow")
        .union(right.select_columns([by, on, *right_cols]).map_batches(norm(1), batch_format="pyarrow"))
    )

    out_cols = [by, on, *left_cols, *right_cols]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df[_SIDE] == 0]
        rhs = df[df[_SIDE] == 1]
        lhs = lhs[[by, on, *left_cols]].sort_values(on, kind="stable")
        rhs = rhs[[by, on, *right_cols]].sort_values(
            [on, *right_cols], kind="stable"
        )
        if not len(lhs):
            return pd.DataFrame(
                {
                    c: pd.Series(
                        [], dtype=(lhs[c].dtype if c in lhs.columns else rhs[c].dtype)
                    )
                    for c in out_cols
                }
            )
        merged = pd.merge_asof(
            lhs, rhs, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return merged[out_cols].reset_index(drop=True)

    return combined.repartition(width or shuffle_width(), keys=[by]).map_batches(
        fold, batch_format="pandas", batch_size=None
    )


def interval_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    by: str,
    start: str,
    end: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    width: Optional[int] = None,
) -> "rd.Dataset":
    """Range (interval-containment) join: one output row per (left
    row, right interval) pair of the same ``by`` key with
    ``start <= on <= end`` — the temporal complement of
    :func:`asof_join` (SQL: ``JOIN ON l.by = r.by AND l.on BETWEEN
    r.start AND r.end``). Left rows matching no interval are dropped
    (inner semantics).

    Same partitioning contract and dataflow as :func:`asof_join`:
    both sides project to (by, key-fields, payload), a tagged union
    flows through ONE hash repartition on ``by``, and the per-block
    fold is a whole-column pandas merge + mask. Interval fan-out is
    bounded by intervals-per-key (sessions, windows), not corpus size.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap or {on, by, start, end} & (set(left_cols) | set(right_cols)):
        raise ValueError(f"payload columns must be disjoint and exclude keys: {overlap}")

    l_schema, r_schema = left.schema(), right.schema()

    def typ(schema, name):
        base = schema.base_schema
        if hasattr(base, "field"):  # pyarrow.Schema
            return base.field(name).type
        dt = dict(zip(base.names, base.types))[name]
        try:
            return pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    fields = (
        [(by, typ(l_schema, by)), (on, typ(l_schema, on)), (_SIDE, pa.int8())]
        + [(c, typ(l_schema, c)) for c in left_cols]
        + [(start, typ(r_schema, start)), (end, typ(r_schema, end))]
        + [(c, typ(r_schema, c)) for c in right_cols]
    )

    def norm(side: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for name, ty in fields:
                if name == _SIDE:
                    cols[name] = pa.array(np.full(len(t), side, np.int8))
                elif name in t.column_names:
                    cols[name] = t[name].cast(ty)
                else:
                    cols[name] = pa.nulls(len(t), ty)
            return pa.table(cols)

        return f

    combined = (
        left.select_columns([by, on, *left_cols])
        .map_batches(norm(0), batch_format="pyarrow")
        .union(
            right.select_columns([by, start, end, *right_cols]).map_batches(
                norm(1), batch_format="pyarrow"
            )
        )
    )
    out_cols = [by, on, *left_cols, start, end, *right_cols]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df[_SIDE] == 0][[by, on, *left_cols]]
        rhs = df[df[_SIDE] == 1][[by, start, end, *right_cols]]
        if not len(lhs) or not len(rhs):
            return pd.DataFrame({c: pd.Series([], dtype="float64") for c in out_cols})
        pairs = lhs.merge(rhs, on=by)
        mask = (pairs[on] >= pairs[start]) & (pairs[on] <= pairs[end])
        return pairs[mask][out_cols].reset_index(drop=True)

    from ..state.partitioning import shuffle_width as _sw

    return combined.repartition(width or _sw(), keys=[by]).map_batches(
        fold, batch_format="pandas", batch_size=None
    )
