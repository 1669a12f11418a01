package graft
/** Prints plan-quality facts for headline queries: pushed filters,
  * read schemas (pruning), join strategies, codegen coverage. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
               "ds_projection", "ds_filter", "evt_asof_join", "dedup_exact")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"\n=== $name ===")
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      println(plan)
    }
    spark.stop()
  }
}
