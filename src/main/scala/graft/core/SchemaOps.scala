package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema superset-merge and eel-semantics value coercion.
  *
  * Reference semantics (NOT code):
  *   - eel-schema io/eels/schema/SchemaMerger.scala:4-14 — merge is a
  *     left fold of addFieldIfNotExists: later schemas append their
  *     new fields, a field present in both must be type-compatible,
  *     and appended fields are nullable (rows from schemas that lack
  *     them carry null).
  *   - eel-core io/eels/coercion/coercers.scala — per-type coercers
  *     whose rules deviate from Spark's `cast` in three places worth
  *     preserving: boolean-from-number is `== 1` (Spark: != 0),
  *     boolean-from-string accepts exactly "true" (Spark: t/y/yes/1…),
  *     and long↔timestamp is MILLIS (Spark cast: seconds).
  */
object SchemaOps {

  /** Superset of the given schemas (eel SchemaMerger): fields are
    * appended in first-seen order; a field present in several schemas
    * must be type-compatible (struct fields recurse); any field
    * missing from at least one input becomes nullable, since a merged
    * relation fills it with null for those rows.
    */
  def merge(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "merge of zero schemas")
    schemas.reduceLeft(merge2)
  }

  private def merge2(a: StructType, b: StructType): StructType = {
    val aNames = a.fieldNames.toSet
    val merged = a.fields.map { fa =>
      b.fields.find(_.name == fa.name) match {
        case Some(fb) =>
          StructField(fa.name, mergeType(fa.name, fa.dataType, fb.dataType),
            fa.nullable || fb.nullable, fa.metadata)
        case None => fa.copy(nullable = true) // absent from b → null-filled
      }
    }
    val appended = b.fields.filterNot(f => aNames.contains(f.name))
      .map(_.copy(nullable = true)) // absent from a → null-filled
    StructType(merged ++ appended)
  }

  private def mergeType(path: String, x: DataType, y: DataType): DataType = (x, y) match {
    case (a, b) if a == b => a
    case (a: StructType, b: StructType) => merge2(a, b)
    case (ArrayType(a, n1), ArrayType(b, n2)) =>
      ArrayType(mergeType(s"$path[]", a, b), n1 || n2)
    case (MapType(k1, v1, n1), MapType(k2, v2, n2)) if k1 == k2 =>
      MapType(k1, mergeType(s"$path{}", v1, v2), n1 || n2)
    // numeric widening beyond eel (which demands identical types):
    // parquet corpora legitimately widen int→long / float→double
    // across partitions, and refusing the merge helps nobody
    case (a: NumericType, b: NumericType) => widen(path, a, b)
    case (a, b) =>
      throw new IllegalArgumentException(
        s"incompatible types for field '$path': $a vs $b")
  }

  private val widthOrder: Seq[NumericType] =
    Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
  private def widen(path: String, a: NumericType, b: NumericType): NumericType = {
    val (ia, ib) = (widthOrder.indexOf(a), widthOrder.indexOf(b))
    if (ia < 0 || ib < 0)
      throw new IllegalArgumentException(
        s"no widening rule for field '$path': $a vs $b")
    widthOrder(math.max(ia, ib))
  }

  /** Union of heterogeneous-schema frames under the merged superset
    * schema: columns matched by name, missing columns null-filled,
    * types aligned to the merged type. The operational counterpart of
    * [[merge]] (what eel does when several sources feed one sink).
    */
  def mergedUnion(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "union of zero frames")
    val target = merge(dfs.map(_.schema))
    val aligned = dfs.map { df =>
      val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(target.fields.toIndexedSeq.map { f =>
        have.get(f.name) match {
          case Some(t) if t == f.dataType => col(f.name)
          case Some(_) => col(f.name).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }: _*)
    }
    aligned.reduce(_.union(_))
  }

  /** eel-rules coercion of a column with a statically-known source
    * type (take it from the frame's schema). Falls through to ANSI
    * `cast` where eel and Spark agree. */
  def coerce(c: Column, from: DataType, to: DataType): Column = (from, to) match {
    case (f, t) if f == t => c
    case (_: NumericType, BooleanType) => c === lit(1) // eel: == 1, Spark: != 0
    case (StringType, BooleanType) => c === lit("true") // eel: exactly "true"
    case (ByteType | ShortType | IntegerType | LongType, TimestampType) =>
      timestamp_millis(c.cast(LongType)) // eel: epoch MILLIS, Spark cast: seconds
    case (TimestampType, LongType) => unix_millis(c) // eel: getTime millis
    case _ => c.cast(to)
  }

  /** Coerce a named field of `df` to `to` in place. */
  def coerceField(df: DataFrame, field: String, to: DataType): DataFrame = {
    val from = df.schema(field).dataType
    df.withColumn(field, coerce(col(field), from, to))
  }
}
