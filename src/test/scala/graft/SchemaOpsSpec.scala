package graft

import graft.core.SchemaOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("merge appends new fields in first-seen order, nullable") {
    val a = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false)))
    val b = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("age", IntegerType, nullable = false)))
    val m = SchemaOps.merge(Seq(a, b))
    assert(m.fieldNames.toSeq == Seq("id", "name", "age"))
    assert(!m("id").nullable)          // present everywhere, never null
    assert(m("name").nullable)         // absent from b
    assert(m("age").nullable)          // absent from a
  }

  test("merge recurses into structs and widens numerics") {
    val a = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", IntegerType), StructField("y", StringType))))))
    val b = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", LongType), StructField("z", DoubleType))))))
    val m = SchemaOps.merge(Seq(a, b))
    val s = m("s").dataType.asInstanceOf[StructType]
    assert(s.fieldNames.toSeq == Seq("x", "y", "z"))
    assert(s("x").dataType == LongType) // int widened to long
  }

  test("merge rejects incompatible types") {
    val a = StructType(Seq(StructField("x", StringType)))
    val b = StructType(Seq(StructField("x", ArrayType(LongType))))
    intercept[IllegalArgumentException] { SchemaOps.merge(Seq(a, b)) }
  }

  test("mergedUnion aligns columns by name and null-fills") {
    val d1 = Seq((1L, "a")).toDF("id", "name")
    val d2 = Seq((2L, 30)).toDF("id", "age")
    val out = SchemaOps.mergedUnion(Seq(d1, d2)).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "name", "age"))
    val rows = out.collect()
    assert(rows(0).getString(1) == "a" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getInt(2) == 30)
  }

  test("coerce applies eel rules where they deviate from Spark cast") {
    val df = Seq((2L, "true", "t", 1500L)).toDF("n", "st", "sf", "ms")
    val r = df.select(
      SchemaOps.coerce(col("n"), LongType, BooleanType).as("nb"),
      SchemaOps.coerce(col("st"), StringType, BooleanType).as("sb"),
      SchemaOps.coerce(col("sf"), StringType, BooleanType).as("fb"),
      SchemaOps.coerce(col("ms"), LongType, TimestampType).cast(StringType).as("ts"))
      .head()
    assert(!r.getBoolean(0))          // eel: 2 != 1 → false (Spark cast: true)
    assert(r.getBoolean(1))           // "true" → true
    assert(!r.getBoolean(2))          // eel: "t" is NOT true (Spark cast: true)
    assert(r.getString(3) == "1970-01-01 00:00:01.5") // millis, not seconds
  }

  test("coerce round-trips timestamp to epoch millis") {
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("1970-01-01 00:00:02.25")))
      .toDF("ts")
    val ms = df.select(SchemaOps.coerce(col("ts"), TimestampType, LongType)).head().getLong(0)
    assert(ms == 2250L)
  }
}
