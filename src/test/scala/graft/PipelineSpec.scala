package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma completely different tail here"),
    (3L, "nothing in common with anything else at all"),
    (4L, "alpha  beta gamma delta epsilon ZETA"), // normalized dup of 1
    (5L, "delta epsilon zeta eta theta iota"),
  ).toDF("doc_id", "text")

  // -- contamination ---------------------------------------------------

  test("contamination counts distinct shared k-grams vs the benchmark") {
    // benchmark = doc 1; its 3-grams: {alpha beta gamma, beta gamma delta,
    // gamma delta epsilon, delta epsilon zeta}
    val bench = docs.filter(col("doc_id") === 1)
    val corpus = docs.filter(col("doc_id") =!= 1)
    val out = Pipeline.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("contam_ratio"))).toMap
    assert(out(2L)._1 == 1L)             // shares "alpha beta gamma"
    assert(out(4L)._1 == 4L)             // normalized dup: all 4 grams
    assert(out(4L)._2 == 1.0)
    assert(out(5L)._1 == 1L)             // shares "delta epsilon zeta"
    assert(!out.contains(3L))            // clean doc absent from result
  }

  test("hashed and string gram variants agree") {
    val bench = docs.filter(col("doc_id") === 1)
    val corpus = docs.filter(col("doc_id") =!= 1)
    def rows(hashGrams: Boolean) =
      Pipeline.contamination(corpus, bench, "doc_id", "text", hashGrams = hashGrams)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(hashGrams = true) == rows(hashGrams = false))
  }

  // -- hashSplit -------------------------------------------------------

  test("hashSplit is exhaustive, deterministic, and respects bounds") {
    val many = spark.range(0, 2000).select(col("id").as("doc_id"))
    val out = Pipeline.hashSplit(many, "doc_id")
    assert(out.count() == 2000)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: 80/10/10 ±5pp at n=2000
    assert(counts("train") > 1400 && counts("train") < 1750)
    assert(counts("val") > 120 && counts("val") < 280)
    assert(counts("test") > 120 && counts("test") < 280)
    // stable under repartitioning (the property that matters: no doc
    // migrates between train and test on a re-read)
    val again = Pipeline.hashSplit(many.repartition(13), "doc_id")
    assert(out.join(again.withColumnRenamed("split", "split2"), "doc_id")
      .filter(col("split") =!= col("split2")).count() == 0)
    // bucket < weight-space bound
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
  }

  test("hashSplit honors custom weights and seed changes the assignment") {
    val many = spark.range(0, 500).select(col("id").as("doc_id"))
    val out = Pipeline.hashSplit(many, "doc_id", fractions = Seq("a" -> 1, "b" -> 1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("a", "b"))
    assert(math.abs(counts("a") - counts("b")) < 150)
    val reseeded = Pipeline.hashSplit(many, "doc_id", seed = "other")
    assert(Pipeline.hashSplit(many, "doc_id")
      .join(reseeded.withColumnRenamed("split", "s2"), "doc_id")
      .filter(col("split") =!= col("s2")).count() > 0)
  }

  // -- keepBestByFingerprint -------------------------------------------

  test("keepBest keeps the highest-scoring doc per normalized cluster") {
    val d = Seq(
      (1L, "same same same", 5),
      (2L, "SAME  same   SAME", 9),  // normalized dup of 1, higher score
      (3L, "unique text", 1),
    ).toDF("doc_id", "text", "quality")
    val out = Pipeline.keepBestByFingerprint(d, "doc_id", "text", col("quality"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("keepBest tie-breaks deterministically on id") {
    val d = Seq((7L, "x y z"), (3L, "x y z"), (9L, "x y z")).toDF("doc_id", "text")
    val out = Pipeline.keepBestByFingerprint(d, "doc_id", "text", lit(1))
      .filter(col("keep")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L))
  }
}
