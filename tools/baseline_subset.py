#!/usr/bin/env python3
"""Time a SUBSET of the oracle SQL in DuckDB — the scale-ladder
companion to baseline.py for decades where the full pipeline set is
impractical (sf10's 60M-row text scans would take an hour per pass).

Usage: python3 tools/baseline_subset.py <sfDir> <oracle_sql.json> <passes> <query...>
Prints one JSON line; paste/format into BASELINE.md.
"""
import sys, glob, os, json, time, statistics
import duckdb

sf_dir, oracle_path, passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(oracle_path))
out = {}
for q in names:
    sql = oracle[q]
    con.execute(sql).fetchall()  # warm (page cache, plan)
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(time.perf_counter() - t0)
    out[q] = round(statistics.median(times), 4)
print(json.dumps({
    "engine": "duckdb", "version": duckdb.__version__,
    "threads": os.cpu_count(), "sf": sf_dir, "passes": passes,
    "unit": "sec", "queries": out, "total": round(sum(out.values()), 4),
}))
