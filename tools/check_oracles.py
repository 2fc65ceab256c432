"""Driver-compare mimic: run each queries() entry and its oracle_sql()
side-by-side on a scale factor dir; report row-count/schema/value matches.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            ray_df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        except Exception as e:
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(ray_df)} ({dt:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:24s} SQL-ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        a, b = normalize(ray_df), normalize(sql_df)
        rows_ok = len(a) == len(b)
        cols_ok = list(a.columns) == list(b.columns)
        vals_ok = rows_ok and cols_ok and a.equals(b)
        status = "OK" if vals_ok else "MISMATCH"
        print(
            f"{name:24s} {status} rows={len(a)}/{len(b)} cols_ok={cols_ok} ({dt:.1f}s)"
        )
        if not vals_ok:
            failures.append(name)
            if rows_ok and cols_ok:
                neq = ~(a == b).all(axis=1)
                print("  first diffs (ray vs sql):")
                print(pd.concat([a[neq].head(3), b[neq].head(3)]).to_string())
            else:
                print("  ray cols:", list(a.columns))
                print("  sql cols:", list(b.columns))
                print("  ray head:", a.head(2).to_dict("records"))
                print("  sql head:", b.head(2).to_dict("records"))
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
