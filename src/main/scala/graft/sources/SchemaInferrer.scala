package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Rule-driven schema-from-headers for headered text sources.
  *
  * Mirrors eel's `SchemaInferrer`/`BasicSchemaInferrer`/`DataTypeRule`
  * (reference: eel-core/src/main/scala/io/eels/SchemaInferrer.scala:1-34):
  * each rule is a header-name regex mapped to a type; the FIRST
  * matching rule wins; unmatched headers fall back to `default`.
  * Unlike value-sampling inference (`inferSchema=true`, which scans
  * data and can flip types between runs), header-rule inference is
  * deterministic and costs one metadata read — the right trade at
  * 100 TB where a sampling pass is a full extra scan.
  */
final case class DataTypeRule(pattern: String, dataType: DataType, nullable: Boolean = true) {
  private val regex = pattern.r
  def apply(header: String): Option[StructField] =
    if (regex.pattern.matcher(header).matches()) Some(StructField(header, dataType, nullable))
    else None
}

trait SchemaInferrer {
  def infer(name: String): StructField
  def struct(headers: Seq[String]): StructType = StructType(headers.map(infer))
}

class BasicSchemaInferrer(default: DataType, rules: Seq[DataTypeRule]) extends SchemaInferrer {
  override def infer(name: String): StructField =
    rules.iterator.flatMap(_(name)).nextOption()
      .getOrElse(StructField(name, default, nullable = true))
}

object SchemaInferrer {
  def apply(default: DataType, first: DataTypeRule, rest: DataTypeRule*): SchemaInferrer =
    apply(default, first +: rest)
  def apply(default: DataType, rules: Seq[DataTypeRule]): SchemaInferrer =
    new BasicSchemaInferrer(default, rules)

  /** Read just the header line of `path` (one tiny driver-side read of
    * the first file's first line — metadata-scale, not a data scan) and
    * apply the inferrer to it. */
  def schemaFor(spark: SparkSession, inferrer: SchemaInferrer, path: String,
                delimiter: String = ","): StructType = {
    val first = spark.read.textFile(path).first()
    inferrer.struct(first.split(java.util.regex.Pattern.quote(delimiter), -1).toSeq)
  }
}

/** Everything-is-a-string inferrer (eel's `StringInferrer`). */
object StringInferrer extends BasicSchemaInferrer(StringType, Nil)
