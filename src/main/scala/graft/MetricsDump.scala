package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executes named queries and writes the FINAL adaptive plan with
  * per-node SQL metrics (agg fallbacks, spill, hash-build sizes,
  * pipeline times) — the level below SkewCheck's per-stage task view,
  * for attributing a stage's CPU to the operator inside it. Runs in
  * the same forked-JVM/heap configuration as Bench/QuickBench, so the
  * memory-pressure metrics are the ones the bench actually sees
  * (sbt console's 4g in-process heap exaggerates fallbacks).
  *
  * Usage: runMain graft.MetricsDump <sfDir> <outDir> <suffix> <query...>
  */
object MetricsDump {
  private def walk(p: SparkPlan, d: Int, sb: StringBuilder): Unit = {
    val ms = p.metrics.toSeq.sortBy(_._1)
      .filterNot { case (k, _) => k.startsWith("remote") || k.startsWith("localMerged") ||
        k.startsWith("corrupt") || k.startsWith("merged") }
      .map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
    sb.append("  " * d + p.nodeName + "  [" + ms + "]\n")
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    kids.foreach(walk(_, d + 1, sb))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args.toSeq.toArray[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries.getOrElse(name, SparkEntry.perfQueries(name))(spark, sfDir)
      df.count() // warm: codegen + master stores
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.collect() // collect on THIS Dataset so its adaptive plan finalizes
      val wall = (System.nanoTime() - t0) / 1e9
      val sb = new StringBuilder(f"wall=$wall%.2f s\n")
      walk(df.queryExecution.executedPlan, 0, sb)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.metrics.txt"),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[metricsdump] wrote $outDir/${name}_$suffix.metrics.txt")
    }
    spark.stop()
  }
}
