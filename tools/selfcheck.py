#!/usr/bin/env python3
"""Dev-loop self-check: replicate the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOut>

Reads each <verifyOut>/<name> parquet (Spark result) and runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables; compares
after sorting columns by name and rows by all values (the driver sorts
columns by name before hashing values).
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, out = sys.argv[1], sys.argv[2]
skips = sys.argv[3:]  # query-name prefixes to skip (e.g. O(n^2) oracles at big sf)
oracle = json.load(open(f"{out}/oracle_sql.json"))
oracle = {k: v for k, v in oracle.items()
          if not any(k.startswith(s) for s in skips)}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for r in df.itertuples(index=False):
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(f"{v!r}")
            elif pd.isna(v):
                row.append("NULL")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    cw, cg = canon(want), canon(got)
    if cw == cg:
        print(f"ok   {name} ({len(cw)} rows)")
    else:
        fails += 1
        print(f"FAIL {name}: rows want={len(cw)} got={len(cg)}")
        for i,(a,b) in enumerate(zip(cw, cg)):
            if a != b:
                print(f"  first diff row {i}:\n   want {a}\n   got  {b}")
                break
        if len(cw) != len(cg):
            print(f"   want cols {sorted(want.columns)} got cols {sorted(got.columns)}")
print(("ALL PASS", f"{fails} FAILURES")[fails > 0])
sys.exit(1 if fails else 0)
