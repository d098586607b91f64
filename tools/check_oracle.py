#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: for each query output
parquet under outDir, run the oracle SQL in DuckDB over the sfDir tables
and compare (columns sorted by name, rows compared as ordered lists).
Usage: check_oracle.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out)):
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        continue
    spark_df = pd.read_parquet(d)
    spark_df = spark_df[sorted(spark_df.columns)]
    if name not in oracles:
        status = f"rows-only ({len(spark_df)} rows)" if len(spark_df) > 0 else "rows-only EMPTY (0 rows) <-- WARN"
        if len(spark_df) == 0:
            fail += 1
        print(f"{name:28s} {status}")
        continue
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    duck_df = duck_df[sorted(duck_df.columns)]
    ok = True
    msgs = []
    if list(spark_df.columns) != list(duck_df.columns):
        ok = False
        msgs.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
    elif len(spark_df) != len(duck_df):
        ok = False
        msgs.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    else:
        for c in spark_df.columns:
            a, b = spark_df[c].values, duck_df[c].values
            if np.issubdtype(spark_df[c].dtype, np.floating) or np.issubdtype(duck_df[c].dtype, np.floating):
                bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True))
            else:
                bad = ~(pd.Series(a).astype(str).values == pd.Series(b).astype(str).values)
            if bad.any():
                ok = False
                i = int(np.argmax(bad))
                msgs.append(f"col {c} differs at row {i}: spark={a[i]!r} duck={b[i]!r} ({int(bad.sum())} rows)")
        # dtype check (schema-ish)
        for c in spark_df.columns:
            if spark_df[c].dtype != duck_df[c].dtype:
                msgs.append(f"DTYPE WARN {c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
    if ok:
        print(f"{name:28s} OK ({len(spark_df)} rows)" + ("  [" + "; ".join(m for m in msgs if m.startswith('DTYPE')) + "]" if msgs else ""))
    else:
        fail += 1
        print(f"{name:28s} MISMATCH: " + " | ".join(msgs[:3]))
print(f"\n{'FAIL' if fail else 'ALL OK'} ({fail} problems)")
sys.exit(1 if fail else 0)
