package graft

import graft.functions.VectorExpressions
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The engine-portable gate variants (md5 token hash, LCG hyperplanes,
  * md5 sampling order) must behave like their xxhash64/Gaussian
  * production twins: same operator semantics, only the hash derivation
  * swapped so the DuckDB oracle can recompute it. */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  private def clones = (0L until 10L).map { i =>
    (i, if (i < 8) "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        else s"unrelated text number $i with different words entirely here now")
  }.toDF("id", "text")

  test("md5TokenHash: 64-bit value matches an independent reference") {
    // md5("alpha") = 2c1743a391305fbf367df8e4f069f9f9 → hi=0x2c1743a3 lo=0x91305fbf
    val h = clones.select(Dedup.md5TokenHash(lit("alpha")).as("h")).head.getLong(0)
    assert(h == ((0x2c1743a3L << 32) | 0x91305fbfL))
  }

  test("simhashPairs with md5 token hash collapses a clone cluster") {
    val pairs = Dedup.simhashPairs(clones, "id", "text", tokenHash = Dedup.md5TokenHash)
      .collect()
    val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairs.length == 8 * 7 / 2, "all clone pairs, nothing else")
    assert(ids == (0L until 8L).toSet)
    assert(pairs.forall(_.getInt(2) == 0), "identical docs have hamming 0")
  }

  test("lcgPlanes are exact dyadic rationals in [-0.5, 0.5)") {
    val p = VectorExpressions.lcgPlanes(8, 4, 2)
    assert(p.length == 2 * 4 * 8)
    assert(p.forall(v => v >= -0.5 && v < 0.5))
    // spot-check the LCG derivation at idx 0 and 1
    assert(p(0) == 12345.0 / 2147483648.0 - 0.5)
    assert(p(1) == ((1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5)
  }

  test("embeddingPairs with LCG planes finds an exact duplicate vector") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val vecs = Seq(
      (1L, base), (2L, base),                                // exact dup
      (3L, Array.tabulate(16)(i => math.cos(i * 3 + 2).toFloat)),
    ).toDF("id", "v")
    val out = Dedup.embeddingPairs(vecs, "id", "v", dim = 16, threshold = 0.99,
      nBits = 4, nTables = 6, planes = Some(VectorExpressions.lcgPlanes(16, 4, 6)))
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("ngramJaccardStrings equals the hashed ngramJaccard on a real corpus") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val pairs = docs.select(col("doc_id").as("id_l"), (col("doc_id") + 1).as("id_r"))
      .filter(col("id_l") % 25 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hashed = asMap(Dedup.ngramJaccard(pairs, docs, "doc_id", "text", 3))
    val strings = asMap(Dedup.ngramJaccardStrings(pairs, docs, "doc_id", "text", 3))
    assert(hashed == strings, "same Jaccard modulo (absent) 64-bit hash collisions")
  }

  test("extractFeaturesPortable: deterministic, in [-1,1), dim respected") {
    val media = Multimodal.attachPayload(clones, "id", "text")
    val f1 = Multimodal.extractFeaturesPortable(media, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f2 = Multimodal.extractFeaturesPortable(media, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= -1.0 && x < 1.0)))
    // identical payloads → identical embeddings; different → different
    assert(f1(0L) == f1(7L) && f1(0L) != f1(8L))
  }

  test("ivfTopK with md5 sample key still self-matches at rank 1") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", "qid", "qvec",
      k = 3, dim = 64, nCentroids = 8, nProbe = 8,
      sampleKey = Some(id => md5(concat(lit("ivf:"), id.cast("string")))))
      .filter(col("rank") === 1).collect()
    assert(out.nonEmpty && out.forall(r => r.getLong(0) == r.getLong(1)),
      "with all cells probed, every query's rank-1 hit is itself")
  }
}
