#!/usr/bin/env python3
"""Produce the numeric baseline: time the headline oracle SQL in DuckDB
(the reference-grade single-node engine available in this image) over
the same parquet tables graft reads, same host, same core count.

Usage: python3 tools/baseline.py <sfDir> <oracle_sql.json> [passes]
Prints one JSON line; paste/format into BASELINE.md.
"""
import sys, glob, os, json, time, statistics
import duckdb

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "q7_nation_trade", "q9_nation_profit", "q10_returned_items",
    "q_window_topn", "q_rollup",
]

# Pipeline ops where the oracle SQL is the NATURAL DuckDB formulation
# (native ASOF JOIN, window sessionization, plain hashing/scans) — a
# fair single-node baseline. The LSH/minhash/IVF oracles are excluded:
# they are gate reconstructions (recursive CTEs, list-comprehension
# hashing) built for equality checking, not for speed — timing them
# would flatter graft.
PIPELINE = [
    "evt_window_agg", "evt_sessionize", "evt_asof_join",
    "evt_asof_tolerance", "evt_props_parse",
    "dedup_exact", "dedup_exact_norm",
    "text_tokencount", "text_quality", "text_langid", "text_fingerprint",
    "text_repetition",
    # r6 additions whose oracle SQL is the natural single-node
    # formulation (regex scan, hash sampling, quota window, gram
    # self-join, unigram rejoin, funnel/retention CTEs). dedup_semantic
    # stays excluded: its oracle is a gate reconstruction (centroid
    # cross join), not how one would write SemDeDup in DuckDB.
    "text_pii", "sample_stratified", "corpus_mix", "dedup_spans",
    "text_unigram", "evt_funnel", "evt_retention",
]

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 5

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(oracle_path))

def run_set(names):
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
    return out

head = run_set(HEADLINE)
pipe = run_set(PIPELINE)
print(json.dumps({
    "engine": "duckdb", "version": duckdb.__version__,
    "threads": os.cpu_count(), "sf": sf_dir, "passes": passes,
    "unit": "sec", "queries": head, "total": round(sum(head.values()), 4),
    "pipeline": pipe, "pipeline_total": round(sum(pipe.values()), 4),
}))
