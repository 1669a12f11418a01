#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each
oracle_sql.json query in DuckDB over the source parquet tables and
hash-compare with the Spark result parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, glob, os, json
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
expected = set(oracle)
qlist = os.path.join(out_dir, "queries.json")
if os.path.exists(qlist):  # includes rows-only queries
    expected |= set(json.load(open(qlist)))
for missing in sorted(expected - dumped):
    print(f"{missing:24s} *** NO SPARK DUMP (query failed in Verify) ***")
    fail += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        status = f"rows-only n={len(spark_df)}"
        if len(spark_df) == 0:
            status += "  *** EMPTY ***"
            fail += 1
        else:
            ok += 1
        print(f"{name:24s} {status}")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    # driver semantics: sort columns by name, then sort rows, hash values
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:24s} COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fail += 1
    elif len(a) != len(b):
        print(f"{name:24s} ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        fail += 1
    else:
        sa = a.astype(str).values.tolist()
        sb = b.astype(str).values.tolist()
        if sa == sb:
            print(f"{name:24s} OK n={len(a)}")
            ok += 1
        else:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(sa, sb)) if x != y][:3]
            print(f"{name:24s} VALUE MISMATCH n={len(a)} first_diffs={diffs}")
            fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
