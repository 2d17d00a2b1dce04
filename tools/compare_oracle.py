#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Spark parquet dumps
written by `graft.Verify`.

Usage: compare_oracle.py [--fresh] <sf_dir> <verify_out_dir>

--fresh opens a NEW DuckDB connection per query (the VerifyHeavy sf1 drill:
one shared connection accumulates enough buffer-pool state on 10x corpora
to OOM; fresh connections keep each query's footprint independent).

Table paths may be plain parquet files (driver testdata) or Spark-written
directories (ScaleCorpus output) — directories are read via glob.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def connect(sf):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main(sf, out, fresh=False):
    con = None if fresh else connect(sf)
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                fails.append((name, "no spark output"))
                continue
            s = norm(pd.concat([pd.read_parquet(p) for p in files]))
            c = connect(sf) if fresh else con
            try:
                d = norm(c.execute(sql).df())
            finally:
                if fresh:
                    c.close()
            if list(s.columns) != list(d.columns):
                fails.append((name, f"cols spark={list(s.columns)} duck={list(d.columns)}"))
            elif len(s) != len(d):
                fails.append((name, f"rows spark={len(s)} duck={len(d)}"))
            elif not s.astype(str).equals(d.astype(str)):
                diff = s.astype(str) != d.astype(str)
                cols = [c2 for c2 in s.columns if diff[c2].any()]
                bad = diff.any(axis=1)
                fails.append((name, f"values differ in {cols}\nspark:\n"
                              f"{s[bad].head(3)}\nduck:\n{d[bad].head(3)}"))
            else:
                if fresh:
                    print(f"OK   {name} ({len(s)} rows)")
        except Exception as e:
            fails.append((name, f"EXC {e}"))
    print(f"{len(oracle) - len(fails)}/{len(oracle)} queries match")
    for n, msg in fails:
        print("FAIL", n, str(msg)[:800])
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--fresh"]
    main(args[0], args[1], fresh="--fresh" in sys.argv)
