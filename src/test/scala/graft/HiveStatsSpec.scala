package graft

import org.apache.spark.sql.functions._
import graft.sources.{HiveDDL, HiveOps, HiveStats}

/** Stats/DDL/partition-values surface over the local warehouse —
  * reference eel-hive HiveStats/HiveOps/HiveDDL semantics on Spark's
  * session catalog (see sources/HiveCatalog.scala). Every assertion
  * cross-checks catalog-served numbers against a direct scan, so the
  * statistics path is verified, not just exercised. */
class HiveStatsSpec extends SparkSpec {

  private val table = "graft_stats_orders"

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    super.afterAll()
  }

  private lazy val setup: Unit = {
    Tables.table(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").format("parquet")
      .partitionBy("o_year").saveAsTable(table)
  }

  test("analyze + tableStats matches the scanned row count") {
    setup
    HiveStats.analyze(spark, table, columns = Seq("o_totalprice"))
    val st = HiveStats.tableStats(spark, table)
    val actual = spark.table(table).count()
    assert(st.rowCount.contains(BigInt(actual)))
    assert(st.sizeInBytes.exists(_ > 0))
  }

  test("per-partition stats sum to the table count and constrain correctly") {
    setup
    HiveStats.analyzePartitions(spark, table)
    val parts = HiveStats.partitionStats(spark, table)
    assert(parts.nonEmpty)
    val summed = parts.flatMap(_._2.rowCount).sum
    assert(summed == BigInt(spark.table(table).count()))
    // constrained count = direct filtered count for one concrete year
    val y = HiveOps.partitionValues(spark, table, "o_year").head
    val viaStats = HiveStats.count(spark, table, Map("o_year" -> y))
    val viaScan = spark.table(table).filter(col("o_year") === y.toInt).count()
    assert(viaStats == BigInt(viaScan))
  }

  test("column min/max served from catalog match the scanned extremes") {
    setup
    HiveStats.analyze(spark, table, columns = Seq("o_totalprice"))
    val (mn, mx) = HiveStats.minMax(spark, table, "o_totalprice")
    val r = spark.table(table).agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(mn.map(_.toDouble).contains(r.getDouble(0)))
    assert(mx.map(_.toDouble).contains(r.getDouble(1)))
  }

  test("partition-values API reflects the registered specs") {
    setup
    assert(HiveOps.partitionKeys(spark, table) == Seq("o_year"))
    val vals = HiveOps.partitionValues(spark, table, "o_year")
    // orders span 1995-2001 in this corpus
    assert(vals.length >= 5 && vals.forall(_.forall(_.isDigit)))
    assert(HiveOps.partitionMap(spark, table) == Map("o_year" -> vals))
    assert(HiveOps.partitionExists(spark, table, Map("o_year" -> vals.head)))
    assert(!HiveOps.partitionExists(spark, table, Map("o_year" -> "1900")))
  }

  test("showDdl renders a CREATE TABLE with the table's columns and format") {
    setup
    val ddl = HiveDDL.showDdl(spark, table)
    assert(ddl.contains("CREATE TABLE"))
    assert(ddl.contains("o_orderkey"))
    assert(ddl.toLowerCase.contains("parquet"))
  }

  test("addColumn extends the schema; existing rows read NULL") {
    setup
    HiveOps.addColumn(spark, table, "o_note", "STRING")
    val df = spark.table(table)
    assert(df.schema.fieldNames.contains("o_note"))
    assert(df.filter(col("o_note").isNotNull).count() == 0)
  }
}
