#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate."""
import sys, json, glob, duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))], ignore_index=True)
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}"); fails += 1; continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}"); fails += 1; continue
        try:
            pd.testing.assert_frame_equal(exp, got, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({got.shape[0]} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}"); fails += 1
    except Exception as e:
        print(f"ERROR {name}: {str(e)[:300]}"); fails += 1
sys.exit(1 if fails else 0)
