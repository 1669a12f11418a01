package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixtures (no Random: repeatable)
  private def lcg(seed: Long): LazyList[Long] =
    LazyList.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)

  test("pointInInterval matches the naive BETWEEN join on random data") {
    val pts = lcg(7).map(x => math.floorMod(x, 1000L)).take(200).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("pid", "pt")
    val ivs = lcg(13).map(x => math.floorMod(x, 950L)).take(60).zipWithIndex
      .map { case (s, i) => (i.toLong, s, s + math.floorMod(s * 31, 80L)) }
      .toDF("iid", "lo", "hi")
    for (binWidth <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(pts, "pt", ivs, "lo", "hi", binWidth)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = pts.crossJoin(ivs)
        .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"binWidth=$binWidth")
      assert(want.nonEmpty) // fixture sanity: the comparison tests something
    }
  }

  test("pointInInterval emits a point once per containing interval, no bin dupes") {
    val pts = Seq((1L, 50L)).toDF("pid", "pt")
    // interval spans many bins at width 7 -> must still match exactly once
    val ivs = Seq((1L, 0L, 1000L), (2L, 50L, 50L), (3L, 51L, 60L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "pt", ivs, "lo", "hi", 7L)
      .select("iid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("intervalOverlap matches the naive overlap join, exact-once per pair") {
    val l = lcg(3).map(x => math.floorMod(x, 500L)).take(80).zipWithIndex
      .map { case (s, i) => (i.toLong, s, s + math.floorMod(s * 17, 60L)) }
      .toDF("lid", "ls", "le")
    val r = lcg(11).map(x => math.floorMod(x, 500L)).take(80).zipWithIndex
      .map { case (s, i) => (i.toLong, s, s + math.floorMod(s * 23, 60L)) }
      .toDF("rid", "rs", "re")
    for (binWidth <- Seq(1L, 16L, 1000L)) {
      val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", binWidth)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.crossJoin(r)
        .filter(col("ls") <= col("re") && col("rs") <= col("le"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"binWidth=$binWidth")
      assert(got.distinct == got, s"pair duplicated at binWidth=$binWidth")
      assert(want.nonEmpty)
    }
  }
}
