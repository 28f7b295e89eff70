"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side on one sf dir,
compare row count, column names, and (column-name-sorted,
row-order-insensitive) values exactly.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: ray error: {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            if len(got) == 0:
                failures.append(name)
                print(f"[FAIL] {name}: empty rows-only result")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"[FAIL] {name}: oracle error: {ex}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
                print(f"       value diff: {msg}")
            # The driver's hash is dtype-representation-sensitive
            # (HUGEINT->object vs int64 diverges even when values match),
            # so a dtype mismatch is a hard failure here too.
            if ok_vals:
                got_dt = [str(d) for d in got.dtypes]
                exp_dt = [str(d) for d in exp.dtypes]
                if got_dt != exp_dt:
                    ok_vals = False
                    diff = [
                        f"{c}: {a}!={b}"
                        for c, a, b in zip(got.columns, got_dt, exp_dt)
                        if a != b
                    ]
                    print(f"       dtype diff: {diff}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: rows {len(got)}/{len(exp)} cols "
            f"{list(got.columns) if not ok_cols else 'match'}"
        )
    print()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
