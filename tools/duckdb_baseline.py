#!/usr/bin/env python3
"""Time the DuckDB oracle on every oracle-bearing gate query — the
local twin of the judge's ratio measurement (BASELINE.md: the reference
publishes no numbers; the quantitative bar is DuckDB at the same SF).

Usage: python3 tools/duckdb_baseline.py <sf_dir> <verify_out_dir> [reps]
Reads oracle_sql.json from the verify dump, runs each query `reps`
times (default 2) on a warm connection, prints per-query min seconds
and the total, as one JSON line.
"""
import duckdb, json, sys, time, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
vd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

oracle = json.load(open(os.path.join(vd, "oracle_sql.json")))
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for p in glob.glob(os.path.join(sf, "*.parquet")):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

times, failures = {}, {}
for name, sql in oracle.items():
    try:
        con.execute(sql).fetchall()  # warmup
        best = min(
            (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(time.time())
            for _ in range(reps))
        times[name] = round(best, 4)
    except Exception as e:
        failures[name] = str(e)[:120]

print(json.dumps({
    "metric": "duckdb_total", "value": round(sum(times.values()), 3),
    "unit": "sec", "sf": sf, "n_queries": len(times),
    "queries": times, "failures": failures}))
