#!/usr/bin/env python3
"""Local oracle compare for VerifyOne dumps — the SAME compare as the
driver's t2 gate (tools/check_oracle.py): columns sorted by name, rows in
emitted order, exact string equality per value. Deliberately NOT more
permissive: the earlier version sorted rows and rounded floats to 6dp, so
an ORDER BY regression or sub-1e-6 float drift passed per-query iteration
here and then failed the real gate on the full run.
Driver-side tooling only — not part of the library.
Usage: verify_local.py <names...>"""
import sys, os, glob
import duckdb
import pandas as pd

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = "/tmp/graft_verify"

ok = True
for name in sys.argv[1:]:
    con = duckdb.connect()
    for t in glob.glob(f"{SF}/*.parquet"):
        tn = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tn} AS SELECT * FROM read_parquet('{t}')")
    spark_files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not spark_files:
        print(f"{name}: NO SPARK OUTPUT"); ok = False; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    sqlpath = f"{OUT}/{name}.sql"
    if not os.path.exists(sqlpath):
        print(f"{name}: NO ORACLE (rows={len(sdf)})")
        continue
    ddf = con.execute(open(sqlpath).read()).df()
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).reset_index(drop=True)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1).reset_index(drop=True)
    rows = len(sdf) == len(ddf)
    cols = list(sdf.columns) == list(ddf.columns)
    vals = rows and cols
    if vals:
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = a.eq(b)
            if not eq.all():
                i = eq.idxmin()
                print(f"  col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
                vals = False
                break
    print(f"{name}: rows={rows}({len(sdf)}/{len(ddf)}) cols={cols} values={vals}")
    if not vals:
        ok = False
        if not cols:
            print("spark cols:", list(sdf.columns),
                  "oracle cols:", list(ddf.columns))
sys.exit(0 if ok else 1)
