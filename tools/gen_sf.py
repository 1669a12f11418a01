#!/usr/bin/env python3
"""Generate a scaled synthetic corpus (default 10x of sf0.1 = "sf1")
for SCALING-SLOPE measurement only (the BASELINE.md sf0.1 -> sf1
ladder). Correctness gates keep using the driver's /root/testdata —
this data never feeds an oracle comparison.

Deterministic (fixed seed). Two recipes, chosen per table:

- TPC-H side (customer/supplier/part/orders/lineitem) + events:
  TILED K times with dense-key shifts (all keys are 0..N-1 in the
  source). Referential integrity is exact by construction; value and
  date distributions are preserved, so per-group cardinalities scale
  the way an organically grown corpus would (fixed date range, fixed
  dimension enums, 10x rows per group). region/nation are fixed
  dimensions and copied as-is.

- documents/embeddings: SYNTHESIZED, not tiled. Tiling text would
  make ~90% of the corpus exact cross-tile duplicates — every dedup
  operator's candidate generation would be measured on a pathological
  all-duplicates corpus instead of an organically scaled one. Instead:
  per-language word frequencies, document word-lengths, and
  (lang, source) pairs are sampled from the sf0.1 EMPIRICAL
  distributions; exact-duplicate pairs are planted at the measured
  sf0.1 rate (8 pairs / 5000 docs), plus near-duplicate pairs (copy
  with 3 word edits) at 2x that rate. Embeddings are drawn from
  per-label per-dimension gaussian moments estimated from sf0.1.

Usage: python3 tools/gen_sf.py <srcDir> <outDir> [K=10]
"""
import sys, os, random, collections
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1414


def tile_tpch(con, src, out, k):
    shifts = {  # table -> [(col, modulus)] key shifts per tile
        "customer": [("c_custkey", 15000)],
        "supplier": [("s_suppkey", 1000)],
        "part": [("p_partkey", 20000)],
        "orders": [("o_orderkey", 150000), ("o_custkey", 15000)],
        "lineitem": [("l_orderkey", 150000), ("l_partkey", 20000),
                     ("l_suppkey", 1000)],
        "events": [("event_id", 100000), ("user_id", 1500)],
    }
    for t in ["region", "nation"]:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT PARQUET)")
    for t, cols in shifts.items():
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        shifted = dict(cols)
        sel = ", ".join(
            f"({c} + t.i * {shifted[c]})::BIGINT AS {c}" if c in shifted else c
            for c, *_ in desc)
        con.sql(f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', range({k}) t(i)) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"  {t}: tiled x{k}")


def synth_documents(con, src, out, k, rnd):
    rows = con.sql(f"SELECT doc_id, text, lang, source FROM "
                   f"'{src}/documents.parquet' ORDER BY doc_id").fetchall()
    n_out = len(rows) * k
    # empirical distributions
    lang_src = [(r[2], r[3]) for r in rows]
    per_lang_words = collections.defaultdict(list)   # lang -> weighted vocab
    per_lang_lens = collections.defaultdict(list)
    for _, text, lang, _ in rows:
        ws = text.split()
        per_lang_words[lang].extend(ws)
        per_lang_lens[lang].append(len(ws))
    docs = []
    for i in range(n_out):
        lang, source = lang_src[rnd.randrange(len(lang_src))]
        length = per_lang_lens[lang][rnd.randrange(len(per_lang_lens[lang]))]
        pool = per_lang_words[lang]
        text = " ".join(pool[rnd.randrange(len(pool))] for _ in range(length))
        docs.append([i, text, lang, source])
    # plant exact duplicates at the measured sf0.1 rate (8 / 5000 docs)
    # and near-duplicates (3 word edits) at twice that rate
    n_exact, n_near = round(8 * n_out / 5000), round(16 * n_out / 5000)
    victims = rnd.sample(range(n_out), (n_exact + n_near) * 2)
    for j in range(n_exact):
        a, b = victims[2 * j], victims[2 * j + 1]
        docs[b][1], docs[b][2], docs[b][3] = docs[a][1], docs[a][2], docs[a][3]
    for j in range(n_exact, n_exact + n_near):
        a, b = victims[2 * j], victims[2 * j + 1]
        ws = docs[a][1].split()
        pool = per_lang_words[docs[a][2]]
        # an empty source doc (length 0 drawn from the empirical pool)
        # has no words to edit — plant it as an exact dup instead of
        # letting randrange(0) abort the whole generation
        if ws:
            for _ in range(3):
                ws[rnd.randrange(len(ws))] = pool[rnd.randrange(len(pool))]
        docs[b][1], docs[b][2], docs[b][3] = " ".join(ws), docs[a][2], docs[a][3]
    table = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    # bounded row groups: a single-row-group file caps Spark's scan
    # parallelism at ONE TASK no matter the split count (row groups are
    # the parquet read unit), so a one-file synthesized table silently
    # measures single-thread throughput on every compute-dense operator
    # (r16 found dedup/ANN/kmeans sf10 numbers were 1-2 way parallel).
    # A real corpus ships many files; bounded groups restore that.
    pq.write_table(table, f"{out}/documents.parquet", row_group_size=8192)
    print(f"  documents: synthesized {n_out} ({n_exact} exact-dup + "
          f"{n_near} near-dup pairs planted)")


def synth_embeddings(con, src, out, k, rnd):
    rows = con.sql(f"SELECT label, embedding FROM "
                   f"'{src}/embeddings.parquet' ORDER BY vec_id").fetchall()
    dim = len(rows[0][1])
    by_label = collections.defaultdict(list)
    for label, emb in rows:
        by_label[label].append(emb)
    moments = {}
    for label, vecs in sorted(by_label.items()):
        n = len(vecs)
        means = [sum(v[d] for v in vecs) / n for d in range(dim)]
        stds = [(sum((v[d] - means[d]) ** 2 for v in vecs) / max(n - 1, 1)) ** 0.5
                for d in range(dim)]
        moments[label] = (n, means, stds)
    ids, labels, vecs = [], [], []
    i = 0
    for label, (n, means, stds) in sorted(moments.items()):
        for _ in range(n * k):
            vecs.append([rnd.gauss(means[d], stds[d]) for d in range(dim)])
            labels.append(label)
            ids.append(i)
            i += 1
    table = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    # bounded row groups — see documents above (scan-parallelism cap)
    pq.write_table(table, f"{out}/embeddings.parquet", row_group_size=4096)
    print(f"  embeddings: synthesized {i} x dim{dim} from per-label moments")


def main():
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    rnd = random.Random(SEED)
    con = duckdb.connect()
    tile_tpch(con, src, out, k)
    synth_documents(con, src, out, k, rnd)
    synth_embeddings(con, src, out, k, rnd)
    print("done:", out)


if __name__ == "__main__":
    main()
