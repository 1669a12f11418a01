package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Hive-catalog operational surface, Spark-native.
  *
  * reference: eel-hive/src/main/scala/io/eels/component/hive/HiveOps.scala
  * (partitionMap/partitionValues/partitionKeys/createPartition/location/
  * schema/addColumn against a raw IMetaStoreClient). Spark already ships
  * the metastore client wired into its session catalog, so every one of
  * those calls maps to the catalog API or one ANSI DDL statement —
  * no metastore plumbing to re-build, and the same code runs against
  * the in-image local warehouse and a production HMS.
  */
object HiveOps {

  private def meta(spark: SparkSession, table: String) =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))

  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  def databaseExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.databaseExists(name)

  def createDatabase(spark: SparkSession, name: String, ignoreIfExists: Boolean = true): Unit =
    spark.sql(s"CREATE DATABASE ${if (ignoreIfExists) "IF NOT EXISTS " else ""}`$name`")

  /** Table root location (reference HiveOps.location). */
  def location(spark: SparkSession, table: String): String =
    meta(spark, table).location.toString

  /** Storage provider/format, e.g. "parquet" (reference HiveOps.tableFormat). */
  def tableFormat(spark: SparkSession, table: String): String =
    meta(spark, table).provider
      .orElse(meta(spark, table).storage.serde).getOrElse("unknown")

  def schema(spark: SparkSession, table: String): StructType =
    spark.table(table).schema

  /** Partition column names in declaration order (reference partitionKeys). */
  def partitionKeys(spark: SparkSession, table: String): Seq[String] =
    meta(spark, table).partitionColumnNames

  /** Every registered partition as a key→value spec (reference partitions). */
  def partitionSpecs(spark: SparkSession, table: String): Seq[Map[String, String]] =
    spark.sessionState.catalog.listPartitions(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).map(_.spec.toMap)

  /** Distinct registered values of one partition key (reference
    * partitionValues) — catalog metadata only, no data scan. */
  def partitionValues(spark: SparkSession, table: String, key: String): Seq[String] =
    partitionSpecs(spark, table).flatMap(_.get(key)).distinct.sorted

  /** key → distinct values for every partition key (reference partitionMap). */
  def partitionMap(spark: SparkSession, table: String): Map[String, Seq[String]] =
    partitionKeys(spark, table).map(k => k -> partitionValues(spark, table, k)).toMap

  def partitionExists(spark: SparkSession, table: String, spec: Map[String, String]): Boolean =
    partitionSpecs(spark, table).exists(p => spec.forall { case (k, v) => p.get(k).contains(v) })

  /** Register a partition directory without writing data (reference
    * createPartitionIfNotExists): ALTER TABLE ADD PARTITION. */
  def addPartition(spark: SparkSession, table: String, spec: Map[String, String],
                   locationPath: Option[String] = None): Unit = {
    val s = spec.map { case (k, v) => s"`$k`='$v'" }.mkString(", ")
    val loc = locationPath.map(p => s" LOCATION '$p'").getOrElse("")
    spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($s)$loc")
  }

  /** Append a nullable column to the table schema (reference addColumn).
    * Existing files simply read NULL for it — the schema-evolution
    * contract shared by eel and Spark parquet tables. */
  def addColumn(spark: SparkSession, table: String, name: String, sqlType: String): Unit =
    spark.sql(s"ALTER TABLE $table ADD COLUMNS (`$name` $sqlType)")
}

/** Table / partition / column statistics, Spark-native.
  *
  * reference: eel-hive/src/main/scala/io/eels/component/hive/HiveStats.scala
  * (ParquetHiveStats: row counts and per-field min/max read from parquet
  * footers on every call). The Spark twin computes once with ANALYZE
  * TABLE — executed as a distributed job, so it scales to tables whose
  * footer listing alone would swamp a single client — and serves every
  * subsequent read from catalog metadata. The same statistics feed the
  * optimizer's join-strategy and AQE decisions, which is why keeping
  * them current matters beyond this API.
  */
object HiveStats {

  /** rowCount/sizeInBytes may be absent until [[analyze]] has run. */
  final case class TableStats(rowCount: Option[BigInt], sizeInBytes: Option[BigInt])

  private def ident(spark: SparkSession, table: String) =
    spark.sessionState.sqlParser.parseTableIdentifier(table)

  /** Compute table-level statistics (+ column min/max/ndv for `columns`). */
  def analyze(spark: SparkSession, table: String, columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** Compute per-partition row counts / sizes for every partition. */
  def analyzePartitions(spark: SparkSession, table: String): Unit =
    spark.sql(s"ANALYZE TABLE $table PARTITION (${
      HiveOps.partitionKeys(spark, table).mkString(", ")}) COMPUTE STATISTICS")

  /** Catalog-recorded table stats (reference HiveStats.count — but from
    * the one-time ANALYZE instead of a footer walk per call). */
  def tableStats(spark: SparkSession, table: String): TableStats = {
    val st = spark.sessionState.catalog.getTableMetadata(ident(spark, table)).stats
    TableStats(st.flatMap(_.rowCount), st.map(_.sizeInBytes))
  }

  /** Per-partition stats: spec → TableStats (reference count(constraints)
    * summed over matching partitions; here each partition is reported). */
  def partitionStats(spark: SparkSession, table: String): Seq[(Map[String, String], TableStats)] =
    spark.sessionState.catalog.listPartitions(ident(spark, table)).map { p =>
      p.spec.toMap -> TableStats(p.stats.flatMap(_.rowCount), p.stats.map(_.sizeInBytes))
    }

  /** Row count of the partitions matching `constraints` (a subset spec;
    * empty = whole table). Requires [[analyzePartitions]]. */
  def count(spark: SparkSession, table: String,
            constraints: Map[String, String] = Map.empty): BigInt =
    if (constraints.isEmpty)
      tableStats(spark, table).rowCount.getOrElse(
        sys.error(s"no row-count statistics for $table — run HiveStats.analyze first"))
    else partitionStats(spark, table).collect {
      case (spec, st) if constraints.forall { case (k, v) => spec.get(k).contains(v) } =>
        st.rowCount.getOrElse(sys.error(
          s"no partition statistics for $table $spec — run HiveStats.analyzePartitions first"))
    }.sum

  /** Catalog-recorded column min/max in external (string) form —
    * reference HiveStats.min/max, served from the ANALYZE ... FOR
    * COLUMNS pass instead of a per-call footer walk. */
  def minMax(spark: SparkSession, table: String, field: String): (Option[String], Option[String]) = {
    val colStats = spark.sessionState.catalog.getTableMetadata(ident(spark, table))
      .stats.map(_.colStats).getOrElse(Map.empty)
    val cs = colStats.getOrElse(field,
      sys.error(s"no column statistics for $table.$field — run HiveStats.analyze(columns=...) first"))
    (cs.min, cs.max)
  }
}

/** DDL generation (reference: eel-hive/src/main/scala/io/eels/component/
  * hive/HiveDDL.scala `showDDL` — hand-assembled CREATE TABLE text).
  * Spark's catalog can render the canonical DDL of any registered
  * table, so the twin is one statement. */
object HiveDDL {
  def showDdl(spark: SparkSession, table: String): String =
    spark.sql(s"SHOW CREATE TABLE $table").head().getString(0)
}
