package graft

import graft.functions.{KmvAggregate, KmvImpl}
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, bounded error above, bytes partition-invariant") {
    // 100 distinct values, k=1024 → the sketch IS the set: exact
    val small = (0 until 100).map(_.toLong).toDF("v")
    val exactEst = small.agg(KmvAggregate.estimate(
        KmvAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    assert(exactEst == 100.0)
    // 20k distinct, k=1024 → RSE ≈ 1/√1022 ≈ 3.1%; assert 4σ
    val n = 20000
    val big = (0 until n).map(_.toLong).toDF("v")
    val est = big.agg(KmvAggregate.estimate(
        KmvAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    assert(math.abs(est - n) / n < 0.13, s"estimate $est vs $n")
    // sketch bytes are a function of the SET — partitioning-invariant
    def bytes(parts: Int): Seq[Byte] =
      big.repartition(parts).agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s"))
        .head.getAs[Array[Byte]](0).toSeq
    assert(bytes(1) == bytes(17))
    // duplicates are no-ops
    val dup = (big.union(big)).agg(KmvAggregate.estimate(
        KmvAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    assert(dup == est)
  }

  test("merge of per-group sketches equals the global sketch") {
    val df = (0 until 5000).map(i => (i.toLong % 7, i.toLong)).toDF("g", "v")
    val global = df.agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s"))
      .head.getAs[Array[Byte]](0).toSeq
    val merged = df.groupBy(col("g")).agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s"))
      .agg(KmvAggregate.merge(col("s")).as("s"))
      .head.getAs[Array[Byte]](0).toSeq
    assert(merged == global)
  }

  test("jaccard estimate tracks the true overlap of two sets") {
    // A = [0, 1200), B = [600, 1800): |A∩B| = 600, |A∪B| = 1800, J = 1/3.
    // Sets are sub-k (k=1024 holds 1200-value sketches truncated to
    // 1024) — overlap estimated from the merged bottom-k
    val a = (0 until 1200).map(_.toLong).toDF("v")
      .agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s")).head.getAs[Array[Byte]](0)
    val b = (600 until 1800).map(_.toLong).toDF("v")
      .agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s")).head.getAs[Array[Byte]](0)
    val j = KmvImpl.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.06, s"jaccard $j")
    // identical sets → exactly 1; disjoint sets → ~0
    assert(KmvImpl.jaccard(a, a) == 1.0)
    val c = (100000 until 101200).map(_.toLong).toDF("v")
      .agg(KmvAggregate.sketch(xxhash64(col("v"))).as("s")).head.getAs[Array[Byte]](0)
    assert(KmvImpl.jaccard(a, c) < 0.02)
    // the Column API agrees with the direct impl
    val viaCol = Seq((a, b)).toDF("sa", "sb")
      .select(KmvAggregate.jaccard(col("sa"), col("sb")).as("j"))
      .head.getDouble(0)
    assert(viaCol == j)
  }

  test("merging sketches built with different k fails loudly") {
    val a = (0 until 100).map(_.toLong).toDF("v")
      .agg(KmvAggregate.sketch(xxhash64(col("v")), k = 64).as("s"))
    val b = (0 until 100).map(_.toLong).toDF("v")
      .agg(KmvAggregate.sketch(xxhash64(col("v")), k = 128).as("s"))
    val ex = intercept[Exception] {
      a.union(b).agg(KmvAggregate.merge(col("s")).as("m")).collect()
    }
    assert(ex.getMessage.contains("k mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("k mismatch")))
  }

  test("un-hashed (non-long) child fails at analysis time") {
    val df = Seq("a", "b").toDF("t")
    val ex = intercept[Exception] {
      df.agg(KmvAggregate.sketch(col("t")).as("s")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("long"))
  }
}
