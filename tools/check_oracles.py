"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + schema-by-name + order-insensitive value comparison).

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(df[c]):
            # NO rounding here: the driver's gate hashes exact values, so
            # the local gate must be bitwise-strict too (r1: a 1-ULP gap
            # passed locally at atol=1e-9 but failed the driver hash).
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: ORACLE raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            try:
                # dtype-strict: the driver's hash compare distinguishes
                # int64 1 from float64 1.0, so a lenient check here hides
                # exactly the red the driver will raise (r2 lesson: six
                # HUGEINT->float64 oracle sums passed locally, failed there).
                pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                              check_exact=True)
            except AssertionError as e:
                print(f"FAIL  {name}: values differ: {str(e)[:300]}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
