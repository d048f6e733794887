#!/usr/bin/env python3
"""Dev-loop self-check: replicate the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOut> [skipPrefix...]

Reads each <verifyOut>/<name> parquet (Spark result) and runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables; compares
after sorting columns by name and rows by all values (the driver sorts
columns by name before hashing values).

Results are PERSISTED incrementally to <verifyOut>/selfcheck_result.json
(one full rewrite after every query) so a long run that dies — or a log
that gets tailed — never loses a failure's name (the round-11 lesson:
a 2h sf0.1 run's single failing line was destroyed by a bounded tail).
The JSON maps query name -> {"status": "ok"|"fail", "rows": n,
"detail": "...", "sec": wall} plus a "__summary__" entry.
"""
import json, sys, time, os
import duckdb
import pandas as pd

sfdir, out = sys.argv[1], sys.argv[2]
skips = sys.argv[3:]  # query-name prefixes to skip (e.g. O(n^2) oracles at big sf)
oracle = json.load(open(f"{out}/oracle_sql.json"))
skipped = sorted(k for k in oracle if any(k.startswith(s) for s in skips))
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

results = {}
result_path = f"{out}/selfcheck_result.json"

def persist(done=False, fails=0):
    snap = dict(results)
    snap["__summary__"] = {
        "sfdir": sfdir, "total": len(oracle), "checked": len(results),
        "fails": fails, "skipped": skipped, "complete": done,
        "failed_names": sorted(n for n, r in results.items()
                               if r["status"] != "ok"),
    }
    tmp = result_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    os.replace(tmp, result_path)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    t0 = time.time()
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}", flush=True); fails += 1
        results[name] = {"status": "fail", "detail": f"oracle error {e}"[:800],
                         "sec": round(time.time() - t0, 2)}
        persist(fails=fails); continue
    try:
        got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})", flush=True); fails += 1
        results[name] = {"status": "fail", "detail": f"no spark result {e}"[:800],
                         "sec": round(time.time() - t0, 2)}
        persist(fails=fails); continue
    cw, cg = canon(want), canon(got)
    sec = round(time.time() - t0, 2)
    if cw == cg:
        print(f"ok   {name} ({len(cw)} rows, {sec}s)", flush=True)
        results[name] = {"status": "ok", "rows": len(cw), "sec": sec}
    else:
        fails += 1
        detail = [f"rows want={len(cw)} got={len(cg)}"]
        print(f"FAIL {name}: {detail[0]}", flush=True)
        for i, (a, b) in enumerate(zip(cw, cg)):
            if a != b:
                detail.append(f"first diff row {i}: want {a} | got {b}")
                print(f"  first diff row {i}:\n   want {a}\n   got  {b}", flush=True)
                break
        if len(cw) != len(cg):
            detail.append(f"want cols {sorted(want.columns)} got cols {sorted(got.columns)}")
            print(f"   {detail[-1]}", flush=True)
        results[name] = {"status": "fail", "rows": len(cg),
                         "detail": " ;; ".join(detail)[:1600], "sec": sec}
    persist(fails=fails)
persist(done=True, fails=fails)
print(("ALL PASS", f"{fails} FAILURES")[fails > 0], f"-> {result_path}", flush=True)
sys.exit(1 if fails else 0)
