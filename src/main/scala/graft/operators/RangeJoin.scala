package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins. Spark plans an inequality-only join
  * condition as BroadcastNestedLoopJoin — fine when one side is tiny,
  * fatal when both sides scale (the build side must broadcast whole,
  * and the probe cost is |L|·|R|). The binned form below turns the
  * same semantics into an EQUI-join Spark can hash-partition:
  * both sides key on fixed-width bins of the range dimension, so the
  * shuffle and the probe each scale linearly.
  *
  * Reference capability: eel expresses point-in-interval lookups as
  * SQL BETWEEN joins (io/eels component SQL surface); the binned
  * rewrite is the Spark-native scale path for the same semantics.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose
    * [startCol, endCol] contains the point (inclusive both ends).
    * All three columns must be integral (epoch days/seconds/µs, ids —
    * caller converts). Each interval is emitted once per spanned bin
    * (⌈width/binWidth⌉ + 1 rows carrying the interval's columns), each
    * point exactly once; the bin equi-join prunes candidates to the
    * same bin and the exact BETWEEN filter runs only on those.
    *
    * Pick `binWidth` near the TYPICAL interval width: much smaller
    * multiplies the interval fan-out; much larger degrades pruning
    * toward a bin-local cross product. Both failure modes are graceful
    * (correctness never depends on binWidth).
    *
    * Output: points columns ++ intervals columns (join survivors). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer `div`, not floor(double ÷): epoch-µs longs exceed exact
    // double division near bin boundaries
    def bin(c: String) = expr(s"CAST($c AS BIGINT) div $binWidth")
    val iv = intervals
      .withColumn("__bin", explode(sequence(bin(startCol), bin(endCol))))
    points
      .withColumn("__bin", bin(pointCol))
      .join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs (l, r) whose [lStart,lEnd] and
    * [rStart,rEnd] intersect. Same binning trick on both sides; a pair
    * sharing several bins would duplicate, so each candidate pair is
    * kept only in the FIRST bin both spans share (max of the two start
    * bins) — exact-once without a distinct. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String, tag: String): DataFrame = df
      .withColumn(s"__b0_$tag", expr(s"CAST($s AS BIGINT) div $binWidth"))
      .withColumn("__bin", explode(sequence(col(s"__b0_$tag"),
        expr(s"CAST($e AS BIGINT) div $binWidth"))))
    binned(left, lStart, lEnd, "l")
      .join(binned(right, rStart, rEnd, "r"), Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") === greatest(col("__b0_l"), col("__b0_r")))
      .drop("__bin", "__b0_l", "__b0_r")
  }
}
