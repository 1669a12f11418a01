package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark. Prints ONE JSON line: total seconds + per-query.
  *
  * Each query is first executed once at sf0.001 (negligible data) so
  * janino/JIT compilation of the generated whole-stage-codegen classes
  * is not attributed to the measured run — we report steady-state
  * execution time at the target scale factor, which is what would be
  * observed on a long-lived cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up 1: tiny SF compiles every generated codegen class
    // warm-up 2: target SF warms shuffle/file-handle/page-cache paths —
    // the measured pass then reports steady-state execution, which is
    // what a long-lived cluster observes
    Seq(warmDir, sfDir).foreach { dir =>
      names.foreach { name =>
        try SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable =>
          // warm-up failures are not fatal (the measured pass decides)
          // but never silent: name the query and the error
          System.err.println(s"[bench-warmup] $name failed at $dir: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      // drop caches accumulated by operators' internal .cache() calls —
      // three passes' worth would otherwise squeeze execution memory
      spark.catalog.clearCache()
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED at $sfDir: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
