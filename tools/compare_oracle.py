#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Spark parquet dumps
written by `graft.Verify`.

Usage: compare_oracle.py <sf_dir> <verify_out_dir>
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                fails.append((name, "no spark output"))
                continue
            s = norm(pd.concat([pd.read_parquet(p) for p in files]))
            d = norm(con.execute(sql).df())
            if list(s.columns) != list(d.columns):
                fails.append((name, f"cols spark={list(s.columns)} duck={list(d.columns)}"))
            elif len(s) != len(d):
                fails.append((name, f"rows spark={len(s)} duck={len(d)}"))
            elif not s.astype(str).equals(d.astype(str)):
                diff = s.astype(str) != d.astype(str)
                cols = [c for c in s.columns if diff[c].any()]
                bad = diff.any(axis=1)
                fails.append((name, f"values differ in {cols}\nspark:\n"
                              f"{s[bad].head(3)}\nduck:\n{d[bad].head(3)}"))
        except Exception as e:
            fails.append((name, f"EXC {e}"))
    print(f"{len(oracle) - len(fails)}/{len(oracle)} queries match")
    for n, msg in fails:
        print("FAIL", n, str(msg)[:800])
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
