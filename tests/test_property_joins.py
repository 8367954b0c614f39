"""Property-based parity: the temporal joins vs DuckDB on randomized
small inputs — ties on (key, time), duplicate rows, unmatched rows,
and multi-block layouts are all exercised by the generator. Few
examples (each spins real Ray pipelines), unbounded deadline."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # user: few keys -> collisions
        st.integers(min_value=0, max_value=9),   # t: small domain -> exact ties
        st.integers(min_value=1, max_value=99),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _ds(df: pd.DataFrame, blocks: int = 3):
    return rd.from_pandas(df).repartition(blocks)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=rows, r=rows)
def test_asof_join_matches_duckdb(ray_session, l, r):
    from neo4j_graph_algorithms_ray.pipelines.joins import asof_join

    left = pd.DataFrame(l, columns=["u", "t", "a"]).astype(np.int64)
    # pre-aggregate the right side (the documented well-defined-asof
    # contract: one row per (key, time), ties resolved to MAX payload)
    right = (
        pd.DataFrame(r, columns=["u", "t", "w"])
        .astype(np.int64)
        .groupby(["u", "t"], as_index=False)["w"]
        .max()
    )
    out = (
        asof_join(_ds(left), _ds(right), on="t", by="u",
                  left_cols=["a"], right_cols=["w"])
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.sql(
        """SELECT l.u, l.t, l.a, r.w FROM l
           ASOF JOIN r ON l.u = r.u AND l.t >= r.t"""
    ).df().astype(np.int64).sort_values(["u", "t", "a", "w"]).reset_index(drop=True)
    matched = out[out["w"].notna()] if "w" in out.columns else out
    if not len(want):
        assert not len(matched)
        return
    got = (
        matched.astype({c: "int64" for c in ("u", "t", "a", "w")})
        .sort_values(["u", "t", "a", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["u", "t", "a", "w"]], want)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=rows, r=rows)
def test_interval_join_matches_duckdb(ray_session, l, r):
    from neo4j_graph_algorithms_ray.pipelines.joins import interval_join

    left = pd.DataFrame(l, columns=["u", "t", "a"]).astype(np.int64)
    right = pd.DataFrame(r, columns=["u", "s", "w"]).astype(np.int64)
    right["e"] = right["s"] + (right["w"] % 4)  # intervals of length 0..3
    out = (
        interval_join(_ds(left), _ds(right), on="t", by="u", start="s", end="e",
                      left_cols=["a"], right_cols=["w"])
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = (
        con.sql(
            """SELECT l.u, l.t, l.a, r.s, r.e, r.w FROM l
               JOIN r ON l.u = r.u AND l.t BETWEEN r.s AND r.e"""
        )
        .df()
        .astype(np.int64)
        .sort_values(["u", "t", "a", "s", "w"])
        .reset_index(drop=True)
    )
    if not len(want):
        assert not len(out)
        return
    got = (
        out.astype({c: "int64" for c in ("u", "t", "a", "s", "e", "w")})
        .sort_values(["u", "t", "a", "s", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["u", "t", "a", "s", "e", "w"]], want)
