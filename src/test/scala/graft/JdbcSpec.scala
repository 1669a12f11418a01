package graft

import graft.sources.{JdbcSink, JdbcSource}
import org.apache.spark.sql.functions._

/** End-to-end JDBC against embedded Derby (ships in /opt/spark/jars —
  * no external service). Covers the eel JdbcSource/JdbcSink surface:
  * write roundtrip, Range-strategy parallel read (partitionColumn
  * stride) and Hash-strategy parallel read (per-partition predicates).
  * Reference: eel-core .../component/jdbc/{JdbcSource,JdbcSink,
  * RangePartitionStrategy,HashPartitionStrategy}.scala. */
class JdbcSpec extends SparkSpec {

  System.setProperty("derby.system.home", "/tmp/graft_derby")
  System.setProperty("derby.language.logStatementText", "true")
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JdbcSink/JdbcSource roundtrip preserves rows and schema") {
    val region = Tables.table(spark, sfDir, "region")
    JdbcSink(url, "region_rt").write(region)
    val back = JdbcSource(url, "SELECT * FROM region_rt").read(spark)
    assert(back.count() == region.count())
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(region.columns.sorted))
    val a = region.select(col("r_regionkey").cast("long"), col("r_name")).collect().map(_.toSeq).toSet
    val b = back.select(col("R_REGIONKEY").cast("long"), col("R_NAME")).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("range-partitioned read splits into numPartitions executor slices") {
    val customer = Tables.table(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    JdbcSink(url, "customer_rng").write(customer)
    val n = customer.count()
    val maxKey = customer.agg(max(col("c_custkey"))).head().getLong(0)
    val src = JdbcSource(url, "SELECT * FROM customer_rng",
      partitionColumn = Some("C_CUSTKEY"), lowerBound = 0L,
      upperBound = maxKey + 1, numPartitions = 4)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == 4, "one JDBC slice per partition")
    assert(df.count() == n)
    assert(df.select(countDistinct(col("C_CUSTKEY"))).head().getLong(0) == n,
      "stride ranges cover every key exactly once")
  }

  test("hash-predicate read (eel HashPartitionStrategy) covers all rows disjointly") {
    // quote the identifier: Spark's JDBC sink creates columns with
    // quoted (exact-case) names, so an unquoted reference would
    // uppercase-normalize and miss
    val parts = 3
    val preds = (0 until parts).map(i => s"""MOD("c_custkey", $parts) = $i""")
    val src = JdbcSource(url, "SELECT * FROM customer_rng", predicates = preds)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == parts)
    val n = JdbcSource(url, "SELECT * FROM customer_rng").read(spark).count()
    assert(df.count() == n)
    assert(df.select(countDistinct(col("C_CUSTKEY"))).head().getLong(0) == n)
  }
}
