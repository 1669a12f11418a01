package graft

import graft.sources.{ParquetSink, ZOrder, ZOrderParquetSink}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  /** per-file (min, max) of `c` — the stats a reader prunes on */
  private def fileRanges(path: String, c: String): Seq[(Long, Long)] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
        (r.getLong(0), r.getLong(1))
      }

  private def covering(ranges: Seq[(Long, Long)], v: Long): Int =
    ranges.count { case (lo, hi) => lo <= v && v <= hi }

  test("zValue interleaves bits; bucketOf ranks against boundaries") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,5) = a bits 011, b bits 101 -> z bits b2 a2 b1 a1 b0 a0 = 100111 = 39
    assert(out == Seq(0L, 1L, 2L, 39L))
    val b = Seq(0.5, 1.5, 2.5)
    val got = Seq(0.0, 1.0, 2.0, 3.0).toDF("x")
      .select(ZOrder.bucketOf(col("x"), b).as("r")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
  }

  test("z-order files prune on BOTH columns; single-key range sort only on one") {
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val probes = df.agg(
      percentile_approx(col("o_orderkey").cast("double"), lit(0.5), lit(1000)),
      percentile_approx(col("o_custkey").cast("double"), lit(0.5), lit(1000))).head()
    val (keyProbe, custProbe) = (probes.getDouble(0).toLong, probes.getDouble(1).toLong)

    val zp = tmp("zorder")
    ZOrderParquetSink(zp, "o_orderkey", "o_custkey", bits = 4, rangePartitions = Some(16))
      .write(df.repartition(8))
    // nothing lost or duplicated by the rewrite
    assert(spark.read.parquet(zp).count() == df.count())
    val zFiles = fileRanges(zp, "o_orderkey")
    assert(zFiles.size > 4, s"want >4 files, got ${zFiles.size}")
    val nz = zFiles.size
    // a median probe on EITHER column touches at most ~half the files
    // (each file is a small z-rectangle in (orderkey, custkey) space)
    assert(covering(zFiles, keyProbe) <= nz / 2,
      s"o_orderkey probe hit ${covering(zFiles, keyProbe)}/$nz z-ordered files")
    val zCust = fileRanges(zp, "o_custkey")
    assert(covering(zCust, custProbe) <= nz / 2,
      s"o_custkey probe hit ${covering(zCust, custProbe)}/$nz z-ordered files")

    // contrast: range-clustering on o_orderkey alone cannot prune
    // o_custkey — every file spans (almost) the whole custkey range
    val rp = tmp("rangeonly")
    ParquetSink(rp, rangeClusterCols = Seq("o_orderkey"), rangePartitions = Some(16))
      .write(df.repartition(8))
    val rCust = fileRanges(rp, "o_custkey")
    assert(covering(rCust, custProbe) >= (rCust.size * 3) / 4,
      s"expected custkey probe to hit ~all range-only files, hit ${covering(rCust, custProbe)}/${rCust.size}")
  }
}
