package graft.sources

import graft.core.Gds
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.StructType

/** Source/Sink abstraction, Spark-first.
  *
  * Mirrors eel's `Source`/`Sink` pair (reference:
  * eel-core/src/main/scala/io/eels/Source.scala,
  * eel-core/src/main/scala/io/eels/Sink.scala) but each Source is just
  * a recipe for a `DataFrameReader` call, so the result is a relation
  * Catalyst can push filters/projections into — not an eager
  * row-publisher. eel's `parts()` parallelism maps to Spark's file
  * splits (`spark.sql.files.maxPartitionBytes`).
  *
  * `FilePattern` (reference: eel-core/src/main/scala/io/eels/FilePattern.scala)
  * maps to the glob support built into every reader path.
  */
trait Source {
  def read(spark: SparkSession): DataFrame
  def toGds(spark: SparkSession): Gds = Gds(read(spark))
}

trait Sink {
  def write(df: DataFrame): Unit
}

/** reference: eel-core .../component/parquet/ParquetSource.scala */
final case class ParquetSource(paths: String*) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(paths: _*)
}

/** reference: eel-core .../component/parquet/ParquetSink.scala.
  * `partitionCols` gives hive-style directory partitioning (partition
  * pruning); `rangeClusterCols` additionally range-repartitions and
  * sorts within partitions so each output file covers a disjoint key
  * range — parquet row-group min/max stats then prune file reads for
  * range predicates (the poor man's Z-order, exact for one key).
  *
  * `maxRecordsPerFile` maps eel's RollingParquetWriter (reference:
  * eel-core .../component/parquet/RollingParquetWriter.scala:1-81 —
  * roll to file _N+1 when the current file reaches the record
  * threshold): Spark's task writers roll per-file at exactly this
  * count, distributed instead of single-writer. eel's byte-size
  * trigger (`maxFileSize`) has no task-level Spark equivalent; the
  * record count is the stable proxy (records × avg row width). */
final case class ParquetSink(path: String,
                             mode: SaveMode = SaveMode.Overwrite,
                             partitionCols: Seq[String] = Nil,
                             rangeClusterCols: Seq[String] = Nil,
                             rangePartitions: Option[Int] = None,
                             maxRecordsPerFile: Option[Long] = None,
                             compression: String = "zstd") extends Sink {
  def write(df: DataFrame): Unit = {
    val rangeCols = rangeClusterCols.map(org.apache.spark.sql.functions.col)
    val clustered =
      if (rangeClusterCols.isEmpty) df
      else rangePartitions.fold(df.repartitionByRange(rangeCols: _*))(
          n => df.repartitionByRange(n, rangeCols: _*))
        .sortWithinPartitions(rangeCols: _*)
    var w = clustered.write.mode(mode).option("compression", compression)
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }
}

/** 2-D Z-order (Morton-curve) clustering: the multi-column upgrade of
  * ParquetSink's single-key range clustering. Each cluster column is
  * quantile-bucketed into 2^bits ranks (equi-POPULATED, so skewed
  * distributions still spread — the boundaries come from one
  * approx_percentile sketch pass, a tiny sanctioned collect), the two
  * rank vectors are bit-interleaved into one z-value, and files are
  * range-partitioned + sorted on it. Every file then covers a small
  * rectangle in (a, b) space, so parquet min/max stats prune file
  * reads for predicates on EITHER column — a plain sort on `a` leaves
  * `b` spanning its full range in every file (ZOrderSpec proves both
  * statements). This is how lakehouse tables serve two access paths
  * from one layout at 100 TB without storing the data twice. */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs: bit i
    * of `a` lands at bit 2i, bit i of `b` at 2i+1. Static expression
    * tree (2·bits shift/mask terms on disjoint bits), fully codegen'd. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      (F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1L)) * F.lit(1L << (2 * i))) +
        (F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1L)) * F.lit(1L << (2 * i + 1)))
    }.reduce(_ + _) // disjoint bits: + is |
  }

  /** Rank of `c` against sorted `boundaries` (the quantile cut points):
    * a ≤`boundaries.length`-step fold — no join, no lookup table. */
  def bucketOf(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(F.lit(0L)) { (acc, bnd) =>
      acc + F.when(c.cast("double") > F.lit(bnd), 1L).otherwise(0L)
    }
}

/** Z-order clustered parquet sink over exactly two numeric columns
  * (the dominant lakehouse case; >2-D interleaving dilutes per-column
  * locality quickly). `bits` per-column rank resolution (default 6 =
  * 64 ranks/column → 12-bit z-value). */
final case class ZOrderParquetSink(path: String,
                                   colA: String, colB: String,
                                   bits: Int = 6,
                                   rangePartitions: Option[Int] = None,
                                   mode: SaveMode = SaveMode.Overwrite,
                                   compression: String = "zstd") extends Sink {
  def write(df: DataFrame): Unit = {
    val nCuts = (1 << bits) - 1
    val qs = (1 to nCuts).map(i => i.toDouble / (1 << bits))
    // one sketch pass → 2·(2^bits − 1) doubles on the driver
    val cuts = df.agg(
      F.percentile_approx(F.col(colA).cast("double"), F.typedlit(qs), F.lit(10000)).as("qa"),
      F.percentile_approx(F.col(colB).cast("double"), F.typedlit(qs), F.lit(10000)).as("qb"))
      .head()
    // null sketch = empty input → every row buckets to 0, write proceeds
    def cutsOf(i: Int): Seq[Double] =
      if (cuts.isNullAt(i)) Seq.empty else cuts.getSeq[Double](i)
    val (qa, qb) = (cutsOf(0), cutsOf(1))
    val z = ZOrder.zValue(ZOrder.bucketOf(F.col(colA), qa),
      ZOrder.bucketOf(F.col(colB), qb), bits).as("__z")
    val withZ = df.withColumn("__z", z)
    val clustered = rangePartitions
      .fold(withZ.repartitionByRange(F.col("__z")))(n => withZ.repartitionByRange(n, F.col("__z")))
      .sortWithinPartitions(F.col("__z"))
      .drop("__z")
    clustered.write.mode(mode).option("compression", compression).parquet(path)
  }
}

/** Bucketed managed-table sink: pre-shuffles by `bucketCols` into
  * `nBuckets` files per partition so later equi-joins/aggregations on
  * those keys are exchange-free (the 100 TB answer to repeatedly
  * joining the same fact tables). Spark requires saveAsTable for
  * bucket metadata — pass a table name, not a path; the warehouse dir
  * comes from the session. Sort columns make merge-joins zero-sort. */
final case class BucketedTableSink(table: String,
                                   nBuckets: Int,
                                   bucketCols: Seq[String],
                                   sortCols: Seq[String] = Nil,
                                   mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def write(df: DataFrame): Unit = {
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }
}

/** reference: eel-core .../component/csv/CsvSource.scala (header,
  * delimiter, nullValue options mirror CsvFormat.scala). Schema
  * resolution precedence: explicit `schema` > rule-driven `inferrer`
  * (header-name regex rules, one metadata-scale read — see
  * [[SchemaInferrer]]) > value-sampling `inferSchema` (extra data
  * scan) > all-strings. */
final case class CsvSource(path: String,
                           header: Boolean = true,
                           delimiter: String = ",",
                           nullValue: String = "",
                           schema: Option[StructType] = None,
                           inferSchema: Boolean = false,
                           inferrer: Option[SchemaInferrer] = None,
                           // malformed-row policy (eel's CsvSource skips or
                           // throws per row; Spark's three modes subsume that):
                           // PERMISSIVE nulls bad fields (+ captures the raw
                           // line in corruptColumn when set), DROPMALFORMED
                           // skips, FAILFAST throws
                           mode: String = "PERMISSIVE",
                           corruptColumn: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    var r = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("nullValue", nullValue)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("mode", mode)
    corruptColumn.foreach(c => r = r.option("columnNameOfCorruptRecord", c))
    val declared = schema.orElse(
      inferrer.map(inf => SchemaInferrer.schemaFor(spark, inf, path, delimiter)))
    // Spark only honors columnNameOfCorruptRecord when the column is
    // present in an EXPLICIT read schema — with inference (or the
    // all-strings default) the option is silently inert. So when a
    // corrupt column is requested without a declared schema, read once
    // to obtain the inferred/all-strings schema, then re-read with it
    // so the corrupt column can be appended.
    val resolved = declared.orElse {
      if (corruptColumn.isEmpty) None
      else {
        var probe = spark.read
          .option("header", header.toString)
          .option("sep", delimiter)
          .option("nullValue", nullValue)
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        if (inferSchema) probe = probe.option("inferSchema", "true")
        Some(probe.csv(path).schema)
      }
    }
      // the corrupt-record column must exist in the read schema
      .map(s => corruptColumn.filterNot(s.fieldNames.contains)
        .map(c => s.add(c, org.apache.spark.sql.types.StringType)).getOrElse(s))
    resolved.foreach(s => r = r.schema(s))
    if (resolved.isEmpty && inferSchema) r = r.option("inferSchema", "true")
    r.csv(path)
  }
}

/** reference: eel-core .../component/csv/CsvSink.scala */
final case class CsvSink(path: String,
                         header: Boolean = true,
                         delimiter: String = ",",
                         mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def write(df: DataFrame): Unit =
    df.write.mode(mode)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)
}

/** reference: eel-core .../component/json/JsonSource.scala */
final case class JsonSource(path: String, schema: Option[StructType] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    schema.fold(r.json(path))(s => r.schema(s).json(path))
  }
}

/** reference: eel-core .../component/json/JsonSink.scala */
final case class JsonSink(path: String, mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def write(df: DataFrame): Unit =
    df.write.mode(mode)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)
}

/** Raw-text ingestion — the LLM-corpus formats eel predates. Two
  * shapes: line mode (one row per line, the .txt/.jsonl-adjacent
  * layout; splittable, so a 100 GB file fans out across executors)
  * and whole-file mode (one row per document file with its path —
  * `wholetext`, for doc-per-file corpora; NOT splittable, parallelism
  * = file count). Output: value STRING (+ input_file_name as `path`
  * in whole-file mode). */
final case class TextSource(path: String, wholeFile: Boolean = false,
                            lineSep: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    var r = spark.read
    if (wholeFile) r = r.option("wholetext", "true")
    lineSep.foreach(s => r = r.option("lineSep", s))
    val df = r.text(path)
    if (wholeFile)
      df.withColumn("path", org.apache.spark.sql.functions.input_file_name())
    else df
  }
}

/** Line-oriented text sink (single STRING column; the training-export
  * counterpart of [[TextSource]] line mode). */
final case class TextSink(path: String, mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def write(df: DataFrame): Unit = df.write.mode(mode).text(path)
}

/** reference: eel-orc/src/main/scala/io/eels/component/orc/OrcSource.scala */
final case class OrcSource(paths: String*) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.orc(paths: _*)
}

/** reference: eel-orc .../OrcSink.scala */
final case class OrcSink(path: String, mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def write(df: DataFrame): Unit = df.write.mode(mode).orc(path)
}

/** reference: eel-core .../component/jdbc/JdbcSource.scala.
  * eel's partition strategies (JdbcPartitionStrategy.scala) map onto
  * Spark's built-in parallel-read modes — each executor opens its own
  * connection for its slice:
  *  - RangePartitionStrategy → partitionColumn/lowerBound/upperBound/
  *    numPartitions (stride ranges);
  *  - HashPartitionStrategy / BucketPartitionStrategy → `predicates`
  *    (one WHERE clause per partition, e.g. MOD(k, n) = i).
  * Spark requires `dbtable` (not `query`) for both parallel modes, so
  * the query is pushed down as a subquery alias.
  * Exercised end-to-end against embedded Derby (ships in
  * /opt/spark/jars) in JdbcSpec. */
final case class JdbcSource(url: String,
                            query: String,
                            partitionColumn: Option[String] = None,
                            lowerBound: Long = 0L,
                            upperBound: Long = 0L,
                            numPartitions: Int = 1,
                            predicates: Seq[String] = Nil) extends Source {
  private def asTable = s"($query) g"
  def read(spark: SparkSession): DataFrame =
    if (predicates.nonEmpty) {
      spark.read.jdbc(url, asTable, predicates.toArray, new java.util.Properties())
    } else if (partitionColumn.isDefined) {
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", asTable)
        .option("partitionColumn", partitionColumn.get)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
        .load()
    } else {
      spark.read.format("jdbc").option("url", url).option("query", query).load()
    }
}

/** reference: eel-core .../component/jdbc/JdbcSink.scala */
final case class JdbcSink(url: String, table: String,
                          mode: SaveMode = SaveMode.Append,
                          batchSize: Int = 1000) extends Sink {
  def write(df: DataFrame): Unit =
    df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize).save()
}

/** reference: eel-core/src/main/scala/io/eels/DevNullSink.scala —
  * useful for benchmarking a plan without write cost. */
case object DevNullSink extends Sink {
  def write(df: DataFrame): Unit = df.foreach(_ => ())
}
