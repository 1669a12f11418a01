package graft
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"QB $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s  n=$n")
    }
    spark.stop()
  }
}
