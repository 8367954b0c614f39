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

from ..state.partitioning import keyed_repartition, shuffle_width, source_size_bytes

_SIDE = "__asof_side"


def _union_size_hint(left: "rd.Dataset", right: "rd.Dataset") -> int | None:
    """Size hint for the tagged-union exchange: sum of both sides'
    input bytes (None when neither side is read-rooted). Per-key fold
    work is bounded by the by-key group size (users/sessions), so an
    input-size width is the right shape for these joins."""
    a, b = source_size_bytes(left), source_size_bytes(right)
    if a is None and b is None:
        return None
    return (a or 0) + (b or 0)


def _pd_dtype(ty: "pa.DataType") -> np.dtype:
    try:
        return np.dtype(ty.to_pandas_dtype())
    except (NotImplementedError, TypeError):
        return np.dtype(object)




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
    is what a well-defined as-of needs anyway. Dtypes: ``by``/``on``/
    ``left_cols`` come back in their DECLARED input dtypes, bit-exact
    at any magnitude (each side converts to pandas null-free — the
    tagged union is split in Arrow first); integer RIGHT payloads
    surface as float64 in every block (pandas null promotion — a left
    row may match nothing), so the output schema is uniform; filter
    matched rows before casting those back.
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

    field_types = dict(fields)

    def _out_dtype(c: str) -> np.dtype:
        # right payloads keep the null-promotion dtype (uniform across
        # blocks — a left row may match nothing); everything else is
        # null-free and carries its declared dtype
        ty = field_types[c]
        if c in right_cols:
            if pa.types.is_integer(ty):
                return np.dtype(np.float64)
            if pa.types.is_boolean(ty):
                return np.dtype(object)
        return _pd_dtype(ty)

    def fold(t: pa.Table) -> pd.DataFrame:
        # split the tagged union in ARROW and select each side's own
        # (null-free) columns BEFORE the pandas conversion — converting
        # the combined block would promote every int64 to float64 and
        # silently round ids/timestamps above 2^53
        import pyarrow.compute as pc

        mask = pc.equal(t[_SIDE], 0)
        lhs = (
            t.filter(mask)
            .select([by, on, *left_cols])
            .to_pandas()
            .sort_values(on, kind="stable")
        )
        rhs = (
            t.filter(pc.invert(mask))
            .select([by, on, *right_cols])
            .to_pandas()
            .sort_values([on, *right_cols], kind="stable")
        )
        if not len(lhs):
            return pd.DataFrame(
                {c: pd.Series([], dtype=_out_dtype(c)) for c in out_cols}
            )
        merged = pd.merge_asof(
            lhs, rhs, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        out = merged[out_cols].reset_index(drop=True)
        # unmatched rows promote right payload ints; force the promoted
        # dtype even in all-matched blocks so the schema stays uniform
        for c in right_cols:
            want = _out_dtype(c)
            if out[c].dtype != want:
                out[c] = out[c].astype(want)
        return out

    return keyed_repartition(
        combined, width or shuffle_width(_union_size_hint(left, right)), [by]
    ).map_batches(fold, batch_format="pyarrow", batch_size=None)


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
    Dtypes: the inner join leaves no nulls, so EVERY output column is
    cast back to its declared input dtype after the fold (the tagged
    union's transient float64 promotion never reaches the caller).
    A fully-empty result still carries the typed schema at the Dataset
    level (``ds.schema()``); note ``Dataset.to_pandas()`` of a 0-row
    dataset returns a column-less frame (Ray Data yields no batches),
    which is a Ray API property, not a schema loss in this operator.
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

    field_types = dict(fields)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series([], dtype=_pd_dtype(field_types[c])) for c in out_cols}
        )

    def fold(t: pa.Table) -> pd.DataFrame:
        # Arrow-side split (see asof_join.fold): each side converts to
        # pandas null-free, so int64 ids/timestamps never transit
        # float64 and the inner-join output carries the declared dtypes
        import pyarrow.compute as pc

        if not t.num_rows:
            return _empty()
        mask = pc.equal(t[_SIDE], 0)
        lhs = t.filter(mask).select([by, on, *left_cols]).to_pandas()
        rhs = t.filter(pc.invert(mask)).select([by, start, end, *right_cols]).to_pandas()
        if not len(lhs) or not len(rhs):
            return _empty()
        pairs = lhs.merge(rhs, on=by)
        keep = (pairs[on] >= pairs[start]) & (pairs[on] <= pairs[end])
        return pairs[keep][out_cols].reset_index(drop=True)

    return keyed_repartition(
        combined, width or shuffle_width(_union_size_hint(left, right)), [by]
    ).map_batches(fold, batch_format="pyarrow", batch_size=None)
