package graft

/** Targeted timing: warm once, report the median of 3 measured passes
  * per query (same discipline as Bench, without the full set). Looks
  * up gate queries first, then the production perf twins.
  * SPARK_GRAFT_QB_PASSES overrides the total pass count (warm + N−1
  * measured; default 4) — drop to 2–3 for multi-minute heavy ops
  * where median-of-3 would cost more than the signal it buys. */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_QB_PASSES", "4").toInt.max(2)
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val q = SparkEntry.queries.getOrElse(name, SparkEntry.perfQueries(name))
      var n = 0L
      val times = (0 until passes).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        n = q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted // pass 0 = warm-up
      println(f"QB $name%-24s ${times(times.length / 2)}%8.3f s  n=$n")
    }
    spark.stop()
  }
}
