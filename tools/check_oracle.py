#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query in
<outdir>/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables
and compare against the Spark parquet dump in <outdir>/<name>/."""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify1"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"MISSING-SPARK {name}")
        bad += 1
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"DUCKDB-ERR    {name}: {str(e).splitlines()[0][:200]}")
        bad += 1
        continue
    got = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
    # normalize: sort columns by name, sort rows, compare
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    exp_n, got_n = norm(exp), norm(got)
    if list(exp_n.columns) != list(got_n.columns):
        print(f"SCHEMA-DIFF   {name}: duckdb={list(exp_n.columns)} spark={list(got_n.columns)}")
        bad += 1
        continue
    if len(exp_n) != len(got_n):
        print(f"ROWS-DIFF     {name}: duckdb={len(exp_n)} spark={len(got_n)}")
        bad += 1
        continue
    try:
        pd.testing.assert_frame_equal(exp_n, got_n, check_dtype=False,
                                      check_exact=True)
        print(f"OK            {name} ({len(exp_n)} rows)")
        ok += 1
    except AssertionError as e:
        print(f"VALUE-DIFF    {name}: {str(e).splitlines()[-1][:200]}")
        # show first differing rows
        neq = (exp_n != got_n) & ~(exp_n.isna() & got_n.isna())
        rows = neq.any(axis=1)
        if rows.any():
            i = rows.idxmax()
            print(f"  duckdb: {exp_n.loc[i].to_dict()}")
            print(f"  spark : {got_n.loc[i].to_dict()}")
        bad += 1
print(f"\n{ok} OK, {bad} BAD of {len(oracle)}")
sys.exit(1 if bad else 0)
