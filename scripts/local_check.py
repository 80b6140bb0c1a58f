#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf dir's parquet tables, compare against the Spark result
parquet dumped by graft.Verify (columns sorted by name, rows sorted, exact
values)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracles.items()):
    spark_path = f"{out_dir}/{name}"
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}"))
        continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        fails.append((name, f"schema: spark={list(sdf.columns)} oracle={list(odf.columns)}"))
        continue
    if len(sdf) != len(odf):
        fails.append((name, f"rows: spark={len(sdf)} oracle={len(odf)}"))
        continue
    ss = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    oo = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    try:
        same_vals = ss.equals(oo)
        if not same_vals:
            # tolerate dtype-only diffs in the local check, but report them
            eq = (ss.astype(str) == oo.astype(str)).all().all()
            if eq:
                dt = [(c, str(ss[c].dtype), str(oo[c].dtype)) for c in ss.columns
                      if str(ss[c].dtype) != str(oo[c].dtype)]
                fails.append((name, f"DTYPE-ONLY diff (hash would fail): {dt}"))
            else:
                bad = [(c,) for c in ss.columns if not ss[c].equals(oo[c])]
                fails.append((name, f"value diff in cols {bad}"))
            continue
    except Exception as e:
        fails.append((name, f"compare error: {e}"))
        continue
    passes.append((name, len(sdf)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
