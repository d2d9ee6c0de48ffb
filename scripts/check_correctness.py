#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for every query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf parquet tables and
compare rows / schema (sorted column names) / values (rows sorted, columns
sorted by name). Usage: check_correctness.py <verifyOutDir> <sfDir>
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              type(v).__name__ == "ndarray" else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"schema {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or not values_equal(x, y):
                return False, f"col {c} row {i}: {x!r} vs {y!r}"
    return True, ""


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            status = "rows-only" if len(spark_df) > 0 else "ROWS-ONLY-EMPTY"
            n_rows_only += 1
            print(f"{name:26s} {status} ({len(spark_df)} rows)")
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"{name:26s} ORACLE-ERR {str(e).splitlines()[0][:120]}")
            continue
        ok, why = frames_equal(canon(spark_df), canon(ora_df))
        if ok:
            n_pass += 1
            print(f"{name:26s} PASS ({len(spark_df)} rows)")
        else:
            n_fail += 1
            print(f"{name:26s} FAIL {why}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
