package graft

import graft.core.Gds
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("skew join is row-identical to the plain inner join on skewed data") {
    // key 1 is the heavy hitter (3000 rows); 2..40 are cold (5 each);
    // 99 has no right match; right has a duplicate row on the hot key
    // (every hot left row must match BOTH) and a right-only key 500
    val left = ((1 to 3000).map(i => (1L, i)) ++
      (2L to 40L).flatMap(k => (1 to 5).map(i => (k, i))) ++
      Seq((99L, 0))).toDF("k", "lv")
    val right = (Seq((1L, "hot-a"), (1L, "hot-b"), (500L, "right-only")) ++
      (2L to 40L).map(k => (k, s"dim$k"))).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
    val skewed = SkewJoin.hotKeyJoin(left, right, "k", hotThreshold = 100L, salt = 4)
    assert(skewed.columns.toSeq == plain.columns.toSeq)
    assert(sortedRows(skewed) == sortedRows(plain))
    assert(skewed.count() == 3000L * 2 + 39L * 5) // hot rows × dup pair + cold matches
  }

  test("skew join: no hot keys degenerates to the plain join; threshold boundary") {
    val left = (1L to 50L).flatMap(k => (1 to 3).map(i => (k, i))).toDF("k", "lv")
    val right = (1L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
    // threshold 3: count==3 is NOT hot (strictly greater), so the salted
    // branch is empty and everything takes the cold path
    val out = SkewJoin.hotKeyJoin(left, right, "k", hotThreshold = 3L, salt = 4)
    assert(sortedRows(out) == sortedRows(plain))
    // threshold 2: every key is hot — fully salted path, same rows
    val out2 = SkewJoin.hotKeyJoin(left, right, "k", hotThreshold = 2L, salt = 4)
    assert(sortedRows(out2) == sortedRows(plain))
  }

  test("skew join is deterministic under repartitioning and via the Gds surface") {
    val left = ((1 to 500).map(i => (7L, i)) ++ (8L to 20L).map(k => (k, 1))).toDF("k", "lv")
    val right = (7L to 25L).map(k => (k, k * 10)).toDF("k", "rv")
    val a = sortedRows(SkewJoin.hotKeyJoin(left, right, "k", hotThreshold = 50L, salt = 3))
    val b = sortedRows(SkewJoin.hotKeyJoin(left.repartition(7), right.repartition(3), "k",
      hotThreshold = 50L, salt = 3))
    assert(a == b)
    val g = Gds(left).skewJoin("k", Gds(right), hotThreshold = 50L, salt = 3)
    assert(sortedRows(g.toDF) == a)
  }
}
