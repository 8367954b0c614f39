"""Local replica of the driver's correctness gate at sf0.001: every
query in __ray_entry__ with an oracle must match DuckDB on row count,
columns and values (tools/check_parity.py logic, subset for speed)."""

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_parity import TABLES, compare, to_pandas  # noqa: E402

import __ray_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"

ORACLED = sorted(entrymod.oracle_sql())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(con, name):
    ours = to_pandas(entrymod.queries()[name](SF))
    theirs = con.sql(entrymod.oracle_sql()[name]).df()
    problems = compare(name, ours, theirs)
    assert not problems, problems


def test_entry_smoke():
    ds = entrymod.entry()
    assert ds.count() > 0
    cols = {f.name for f in ds.schema().base_schema}
    assert cols == {"vid", "rank"}
