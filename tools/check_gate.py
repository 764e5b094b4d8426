#!/usr/bin/env python3
"""Local replica of the driver's correctness check: run each oracle SQL in
DuckDB over the sf tables and compare with the Verify parquet dumps."""
import sys, json, glob, duckdb, pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if len(sys.argv) > 3:  # dev filter: comma-separated query names
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    # driver-style compare: sort columns by name, then sort rows, compare
    wc = want.reindex(sorted(want.columns), axis=1)
    gc = got.reindex(sorted(got.columns), axis=1)
    if sorted(wc.columns) != sorted(gc.columns):
        print(f"FAIL {name}: schema {list(gc.columns)} vs {list(wc.columns)}")
        fails += 1
        continue
    ws = wc.sort_values(by=list(wc.columns)).reset_index(drop=True)
    gs = gc.sort_values(by=list(gc.columns)).reset_index(drop=True)
    if len(ws) != len(gs):
        print(f"FAIL {name}: rows {len(gs)} vs {len(ws)}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(gs)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e)[:400]}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle checks passed")
sys.exit(1 if fails else 0)
