"""Local mirror of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count, sorted
column names, order-insensitive value equality). Usage:

    python scripts/check_correctness.py [sf_dir] [query_name ...]

A full no-name sweep also writes SWEEP_MANIFEST.json at the repo root:
per-query status + row count + an md5 over the canonicalized result values,
so the next round's judge can diff builder-claimed green against an
artifact instead of prose (VERDICT r3 item 9).
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
    manifest: dict = {}

    def value_md5(df: pd.DataFrame) -> str:
        import hashlib

        h = hashlib.md5()
        for c in df.columns:
            h.update(c.encode())
            h.update("\x1f".join(df[c].astype(str).tolist()).encode())
        return h.hexdigest()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        res = fn(sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        wall = time.perf_counter() - t0
        if name not in sqls:
            print(f"{name:28s} rows={len(df):7d}  (rows-only)  {wall:5.1f}s")
            manifest[name] = {
                "status": "rows-only", "rows": len(df),
                "value_md5": value_md5(canon(df)), "seconds": round(wall, 2),
            }
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
        manifest[name] = {
            "status": status, "rows": len(a),
            "value_md5": value_md5(a), "seconds": round(wall, 2),
        }
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
    if not only:  # full sweep: persist the artifact manifest
        import json

        out = {
            "sf_dir": sf_dir,
            "n_queries": len(manifest),
            "failures": failures,
            "queries": manifest,
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SWEEP_MANIFEST.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print("manifest:", path)
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
