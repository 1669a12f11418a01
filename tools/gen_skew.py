#!/usr/bin/env python3
"""Generate an ADVERSARIALLY SKEWED variant of a corpus — zipfian hot
keys for the pipeline-shuffle skew measurements (SURVEY §7 r15). The
sf ladder (gen_sf.py) scaled DENSITY; this scales KEY CONCENTRATION:

- documents: ~90% of docs reassigned to the modal language (text
  resampled from that language's empirical vocab, lengths preserved) —
  the hot GROUP for sample_topk_per_group and the hot token keys for
  text_classify's scoring join; plus a fixed 8-token boilerplate line
  planted at the START of 30% of docs — ONE line key shared by 30% of
  the corpus for dedup_lines (the RefinedWeb boilerplate shape, taken
  to the adversarial extreme).
- lineitem: 30% of rows reassigned to ONE hub supplier (existing key,
  referential integrity preserved) — the purchase graph grows a hub
  node adjacent to ~every customer for graph_pagerank.
- everything else copied as-is.

Deterministic (fixed seed). Measurement data only — never feeds an
oracle comparison.

Usage: python3 tools/gen_skew.py <srcDir> <outDir>
"""
import sys, os, random, collections
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 2718
HOT_LANG_FRACTION = 0.9
BOILERPLATE_FRACTION = 0.3
HUB_FRACTION = 0.3
# exactly 8 tokens = one full dedup_lines line (lineTokens = 8)
BOILERPLATE = "click here to subscribe to our free newsletter"


def skew_documents(con, src, out, rnd):
    rows = con.sql(f"SELECT doc_id, text, lang, source FROM "
                   f"'{src}/documents.parquet' ORDER BY doc_id").fetchall()
    langs = collections.Counter(r[2] for r in rows)
    hot = langs.most_common(1)[0][0]
    pool = [w for _, t, lang, _ in rows if lang == hot for w in t.split()]
    docs = []
    for doc_id, text, lang, source in rows:
        if lang != hot and rnd.random() < ((HOT_LANG_FRACTION - langs[hot] / len(rows))
                                           / max(1e-9, 1 - langs[hot] / len(rows))):
            n = len(text.split())
            text = " ".join(pool[rnd.randrange(len(pool))] for _ in range(n))
            lang = hot
        if rnd.random() < BOILERPLATE_FRACTION:
            text = BOILERPLATE + " " + text
        docs.append((doc_id, text, lang, source))
    table = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    # bounded row groups — single-row-group files cap scan parallelism
    # at one task (see gen_sf.py)
    pq.write_table(table, f"{out}/documents.parquet", row_group_size=8192)
    n_hot = sum(1 for d in docs if d[2] == hot)
    print(f"  documents: {n_hot}/{len(docs)} now '{hot}' "
          f"({n_hot / len(docs):.0%}), boilerplate planted in ~{BOILERPLATE_FRACTION:.0%}")


def skew_lineitem(con, src, out, rnd):
    hub = con.sql(f"SELECT l_suppkey FROM '{src}/lineitem.parquet' "
                  "GROUP BY 1 ORDER BY count(*) DESC, 1 LIMIT 1").fetchone()[0]
    # deterministic per-row choice via a hash of the row id — one SQL
    # pass, no python loop over millions of rows
    thr = int(HUB_FRACTION * 1000)
    desc = con.sql(f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()
    sel = ", ".join(
        f"CASE WHEN hash(l_orderkey * 7 + l_linenumber) % 1000 < {thr} "
        f"THEN {hub}::BIGINT ELSE l_suppkey END AS l_suppkey"
        if c == "l_suppkey" else c for c, *_ in desc)
    con.sql(f"COPY (SELECT {sel} FROM '{src}/lineitem.parquet') TO "
            f"'{out}/lineitem.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet' "
                f"WHERE l_suppkey = {hub}").fetchone()[0]
    tot = con.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0]
    print(f"  lineitem: hub supplier {hub} now on {n}/{tot} rows ({n / tot:.0%})")


def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rnd = random.Random(SEED)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "events", "embeddings"]:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
    skew_lineitem(con, src, out, rnd)
    skew_documents(con, src, out, rnd)
    print("done:", out)


if __name__ == "__main__":
    main()
