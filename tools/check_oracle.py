#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark result parquet dumped
by graft.Verify (columns sorted by name, values hashed)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).reset_index(drop=True)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1).reset_index(drop=True)
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}"); fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); fails += 1; continue
    # exact value compare (mirror a hash compare); report first diff
    ok = True
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            eq = (a.astype(str) == b.astype(str))
        except Exception:
            eq = a.eq(b)
        if not eq.all():
            i = eq.idxmin()
            print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} duck={b[i]!r}")
            ok = False; fails += 1; break
    if ok:
        print(f"PASS {name} ({len(sdf)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
