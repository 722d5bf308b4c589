#!/usr/bin/env python3
"""Local oracle compare for VerifyOne dumps (mirrors the driver's check:
columns sorted by name, rows sorted, values compared). Driver-side tooling
only — not part of the library. Usage: verify_local.py <names...>"""
import sys, os, glob
import duckdb

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = "/tmp/graft_verify"

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.round(6) if any(df.dtypes == "float64") else df

ok = True
for name in sys.argv[1:]:
    con = duckdb.connect()
    for t in glob.glob(f"{SF}/*.parquet"):
        tn = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tn} AS SELECT * FROM read_parquet('{t}')")
    spark = con.execute(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    sqlpath = f"{OUT}/{name}.sql"
    if not os.path.exists(sqlpath):
        print(f"{name}: NO ORACLE (rows={len(spark)})")
        continue
    oracle = con.execute(open(sqlpath).read()).df()
    s, o = norm(spark), norm(oracle)
    rows = len(s) == len(o)
    cols = list(s.columns) == list(o.columns)
    vals = rows and cols and s.astype(str).equals(o.astype(str))
    print(f"{name}: rows={rows}({len(s)}/{len(o)}) cols={cols} values={vals}")
    if not vals:
        ok = False
        if cols and rows:
            neq = (s.astype(str) != o.astype(str)).any(axis=1)
            print("spark:\n", s[neq].head(5))
            print("oracle:\n", o[neq].head(5))
        else:
            print("spark cols:", list(s.columns), "oracle cols:", list(o.columns))
sys.exit(0 if ok else 1)
