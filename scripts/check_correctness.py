"""Local mirror of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count, sorted
column names, order-insensitive value equality). Usage:

    python scripts/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        res = fn(sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        wall = time.perf_counter() - t0
        if name not in sqls:
            print(f"{name:28s} rows={len(df):7d}  (rows-only)  {wall:5.1f}s")
            continue
        odf = con.sql(sqls[name]).df()
        a, b = canon(df), canon(odf)
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        # dtype-insensitive value compare (the driver hashes values after a
        # canonical string render; uint64 vs int64 representations both pass)
        ok_vals = (
            ok_rows
            and ok_schema
            and all(
                (a[c].astype(str).values == b[c].astype(str).values).all()
                for c in a.columns
            )
        )
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:28s} rows={len(a)}/{len(b)} schema={ok_schema} vals={ok_vals} FAIL")
            if not ok_schema:
                print("  ray:", list(a.columns), "\n  sql:", list(b.columns))
            elif ok_rows:
                neq = ~(a == b).all(axis=1)
                print(pd.concat([a[neq].head(3), b[neq].head(3)]))
        else:
            print(f"{name:28s} rows={len(a):7d}  OK  {wall:5.1f}s")
    ray.shutdown()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
