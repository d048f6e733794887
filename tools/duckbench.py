#!/usr/bin/env python3
"""Time the oracle SQL set in DuckDB at a given sf (baseline comparison).

Usage: python3 tools/duckbench.py <sfDir> <oracle_sql.json> [skip_prefix...]
"""
import json, sys, time
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
skips = sys.argv[3:]
oracle = json.load(open(oracle_path))
con = duckdb.connect()
con.execute(f"SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
out = {}
for name in sorted(oracle):
    if any(name.startswith(s) for s in skips):
        continue
    t0 = time.time()
    con.execute(oracle[name]).fetchall()
    out[name] = round(time.time() - t0, 3)
print(json.dumps({"sf": sfdir, "queries": out,
                  "total": round(sum(out.values()), 2)}))
