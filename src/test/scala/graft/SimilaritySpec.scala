package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector functions match hand-computed values") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.norm(col("a")).as("na"),
      VectorFunctions.cosineRounded(col("a"), col("b")).as("cos")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-6)
  }

  test("native codegen expressions match the HOF reference formulations") {
    val df = Tables.embeddings(spark, sfDir).limit(200)
      .select(col("vec_id"), col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val cmp = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      VectorFunctions.cosineHof(col("a"), col("b")).as("hof"),
      VectorFunctions.dot(col("a"), col("b")).as("ndot"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hdot"),
      VectorFunctions.lshBuckets(col("a"), 64, 8, 4).as("buckets"),
      VectorFunctions.lshBucket(col("a"), 64, 8, 42L).as("t0"),
      VectorFunctions.lshBucket(col("a"), 64, 8, 42L + 7919L).as("t1"))
    cmp.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
      val buckets = r.getSeq[Long](4)
      assert(buckets.length == 4)
      assert(buckets(0) == r.getLong(5)) // table 0 == single-table impl, same seed
      assert(buckets(1) == r.getLong(6)) // table 1 == seed + 7919
    }
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f)),
    ).toDF("id", "v")
    val queries = Seq((100L, Seq(1f, 0f))).toDF("qid", "qv")
    val out = Similarity.bruteForceTopK(corpus, queries, "id", "v", "qid", "qv", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(out.head.getAs[Double]("score") == 1.0)
  }

  test("lshTopK returns the exact match in its candidates") {
    val dim = 16
    val corpus = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).toFloat).toSeq)
    }.toDF("id", "v")
    val queries = Seq((42L, Array.tabulate(dim)(d => math.sin(42 * 31 + d * 7).toFloat).toSeq))
      .toDF("qid", "qv")
    val out = Similarity.lshTopK(corpus, queries, "id", "v", "qid", "qv",
      k = 3, dim = dim, nBits = 6, nTables = 8).collect()
    // the identical vector hashes identically in every table -> always a candidate, rank 1
    assert(out.find(_.getAs[Int]("rank") == 1).get.getAs[Long]("id") == 42L)
  }
}
