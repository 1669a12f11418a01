package graft

import graft.functions.{HllAggregate, HllImpl}
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within the p=12 error bound; exact merge/partition invariance") {
    val n = 10000
    val df = (0 until n).map(i => (i.toLong % 3, i.toLong)).toDF("g", "v")
    // global sketch over 10k distinct values
    val est = df.agg(HllAggregate.estimate(
        HllAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs $n")
    // sketch BYTES are bit-identical under any partitioning (register
    // max is commutative+associative — merge order cannot matter)
    def bytes(parts: Int): Seq[Byte] =
      df.repartition(parts).agg(HllAggregate.sketch(xxhash64(col("v"))).as("s"))
        .head.getAs[Array[Byte]](0).toSeq
    assert(bytes(1) == bytes(13))
    // rollup: merging per-group sketches == sketching the whole corpus
    val merged = df.groupBy(col("g")).agg(HllAggregate.sketch(xxhash64(col("v"))).as("s"))
      .agg(HllAggregate.merge(col("s")).as("s"))
      .head.getAs[Array[Byte]](0).toSeq
    assert(merged == bytes(1))
    // per-group estimates track the exact per-group cardinalities
    val perGroup = df.groupBy(col("g"))
      .agg(HllAggregate.estimate(HllAggregate.sketch(xxhash64(col("v")))).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = df.groupBy(col("g")).agg(countDistinct(col("v")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, c) =>
      assert(math.abs(perGroup(g) - c) / c < 0.08, s"group $g: ${perGroup(g)} vs $c") }
  }

  test("small-range linear counting is exact-ish at tiny cardinalities") {
    val df = (0 until 40).map(_.toLong).toDF("v")
    val est = df.agg(HllAggregate.estimate(
        HllAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    // with 4096 registers and 40 values, linear counting is near-exact
    assert(math.abs(est - 40) < 2, s"estimate $est")
    // duplicate values never move the sketch
    val dup = (0 until 40).map(_.toLong) ++ (0 until 40).map(_.toLong)
    val est2 = dup.toDF("v").agg(HllAggregate.estimate(
        HllAggregate.sketch(xxhash64(col("v")))).as("e"))
      .head.getDouble(0)
    assert(est2 == est)
  }

  test("HllImpl register semantics: rank caps, merge is max") {
    val a = new Array[Byte](16) // p = 4
    HllImpl.add(a, 0L, 4) // rest == 0 → max rank 61
    assert((a(0) & 0xff) == 61)
    val b = new Array[Byte](16)
    b(0) = 3; b(5) = 7
    HllImpl.mergeInto(b, a)
    assert((b(0) & 0xff) == 61 && (b(5) & 0xff) == 7)
  }

  test("registers() exposes the exact register vector in bucket order") {
    import spark.implicits._
    val vals = Seq(7L, 99L, -3L, Long.MinValue, 0L)
    val regs = vals.toDF("v")
      .agg(HllAggregate.registers(HllAggregate.sketch(col("v"), p = 4)).as("r"))
      .head.getSeq[Int](0)
    // independent model of the documented layout: idx = top p bits,
    // rank = nlz(h << p) + 1 (64−p cap via the rest==0 branch)
    val model = new Array[Int](16)
    vals.foreach { h =>
      val idx = (h >>> 60).toInt
      val rest = h << 4
      val rank = (if (rest == 0L) 60 else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > model(idx)) model(idx) = rank
    }
    assert(regs == model.toSeq)
    assert(regs.length == 16)
  }

  test("un-hashed (non-long) child fails at analysis time") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("t")
    val ex = intercept[Exception] {
      df.agg(HllAggregate.sketch(org.apache.spark.sql.functions.col("t")).as("s")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("long"))
  }
}
