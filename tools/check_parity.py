"""Local replica of the driver's correctness gate: run each
__ray_entry__ query and its DuckDB oracle on the same sf dir, compare
row count, column names and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"columns {sorted(ours.columns)} vs {sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"rows {len(ours)} vs {len(theirs)}")
    a, b = canon(ours), canon(theirs)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                bv.dtype, np.floating
            ):
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=1e-12, equal_nan=True
                )
            else:
                ok = (av == bv).all()
            if not ok:
                bad = (
                    np.flatnonzero(av != bv)[:3]
                    if av.dtype == bv.dtype
                    else [0]
                )
                problems.append(
                    f"col {c} differs, e.g. rows {bad}: ours={av[bad]} oracle={bv[bad]}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"ok?  {name}: rows={len(ours)} ({t1-t0:.1f}s) [rows-only, no oracle]")
            continue
        try:
            theirs = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t2 = time.perf_counter()
        problems = compare(name, ours, theirs)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(
                f"PASS {name}: rows={len(ours)} (ray {t1-t0:.1f}s, sql {t2-t1:.1f}s)"
            )
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
