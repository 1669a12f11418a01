package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Hive-table semantics without a metastore service: Spark's built-in
  * catalog + partitioned `saveAsTable` demonstrates the same
  * create/list/add-partition/prune surface as the reference's
  * eel-hive/.../HiveOps.scala (createTable, partitionValues,
  * createPartition) and HiveSource partition pruning. The partition
  * pruning proof reads the scan's own numFiles metric — the property
  * that makes partitioned layouts pay off at 100 TB. */
class HiveSemanticsSpec extends SparkSpec {

  private val table = "graft_orders_part"

  private def partitionedOrders: DataFrame =
    Tables.table(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))

  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    val root = df.queryExecution.executedPlan
    val finalPlan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected a file scan in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    super.afterAll()
  }

  test("partitioned saveAsTable registers a catalog table with per-year partitions") {
    partitionedOrders.write.mode("overwrite").format("parquet")
      .partitionBy("o_year").saveAsTable(table)
    assert(spark.catalog.tableExists(table))
    val parts = spark.sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0)).sorted
    // orders span 1995-2001 in this corpus
    assert(parts.length >= 5 && parts.forall(_.startsWith("o_year=")))
  }

  test("partition filter prunes the scan to a strict subset of files") {
    val all = filesScanned(spark.table(table))
    val pruned = filesScanned(spark.table(table).filter(col("o_year") === 1996))
    assert(pruned > 0 && pruned < all,
      s"pruned scan must read fewer files (pruned=$pruned, all=$all)")
  }

  test("appending a new partition extends the partition list and prunes to it") {
    val before = spark.sql(s"SHOW PARTITIONS $table").count()
    partitionedOrders.limit(10).withColumn("o_year", lit(2099))
      .write.mode("append").format("parquet").insertInto(table)
    val after = spark.sql(s"SHOW PARTITIONS $table").collect().map(_.getString(0))
    assert(after.length == before + 1 && after.contains("o_year=2099"))
    val onlyNew = spark.table(table).filter(col("o_year") === 2099)
    assert(onlyNew.count() == 10)
    assert(filesScanned(onlyNew) < filesScanned(spark.table(table)))
  }
}
