#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity (mimics the driver's t2 gate).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB over the same testdata tables,
then compares row counts, sorted columns, and values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = av.astype(float); bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            if not (both_nan | (av == bv)).all():
                bad = (~(both_nan | (av == bv))).idxmax()
                return f"VAL col={c} row={bad} spark={av[bad]!r} duck={bv[bad]!r}"
        else:
            avs = av.astype(str); bvs = bv.astype(str)
            if not (avs == bvs).all():
                bad = (avs != bvs).idxmax()
                return f"VAL col={c} row={bad} spark={av[bad]!r} duck={bv[bad]!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        path = f"{out_dir}/{name}"
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries without oracle => rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
            print(f"INFO {name}: no oracle, rows={n}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
