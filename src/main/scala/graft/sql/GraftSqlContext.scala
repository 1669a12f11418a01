package graft.sql

import graft.core.Gds
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL over registered frames.
  *
  * eel's `SqlContext` (reference:
  * eel-core/src/main/scala/io/eels/component/SqlContext.scala) copies
  * every registered DataStream into an embedded H2 database and runs
  * SQL there — a single-node materialization. Spark-first, the same
  * capability is zero-copy: register the plan as a temp view and let
  * Catalyst run the SQL over the original (distributed, pushdown-able)
  * relations.
  */
final class GraftSqlContext(spark: SparkSession) {
  def registerFrame(name: String, ds: Gds): Unit = register(name, ds.toDF)
  def register(name: String, df: DataFrame): Unit = df.createOrReplaceTempView(name)
  def sql(query: String): Gds = Gds(spark.sql(query))
}

object GraftSqlContext {
  def apply(spark: SparkSession): GraftSqlContext = new GraftSqlContext(spark)
  /** Register the whole test corpus from a scale-factor dir. */
  def withTables(spark: SparkSession, dir: String): GraftSqlContext = {
    val ctx = new GraftSqlContext(spark)
    graft.Tables.names.foreach(n => ctx.register(n, graft.Tables.table(spark, dir, n)))
    ctx
  }
}
