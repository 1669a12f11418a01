package graft

import graft.sources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SchemaInferrerSpec extends SparkSpec {
  import spark.implicits._

  test("first matching rule wins; unmatched headers get the default") {
    val inf = SchemaInferrer(StringType,
      DataTypeRule(".*_id", LongType, nullable = false),
      DataTypeRule("amount.*", DoubleType),
      DataTypeRule(".*", StringType)) // catch-all AFTER the specific rules
    assert(inf.infer("user_id") == StructField("user_id", LongType, nullable = false))
    assert(inf.infer("amount_usd") == StructField("amount_usd", DoubleType))
    assert(inf.infer("note") == StructField("note", StringType))
    val st = inf.struct(Seq("user_id", "amount_usd", "note"))
    assert(st.map(_.dataType) == Seq(LongType, DoubleType, StringType))
  }

  test("StringInferrer maps every header to a nullable string") {
    assert(StringInferrer.infer("anything") == StructField("anything", StringType))
  }

  test("CsvSource(inferrer=...) derives the schema from the header line") {
    val dir = Files.createTempDirectory("graft_inferrer").toString + "/out"
    CsvSink(dir, header = true).write(
      Seq((1L, 9.5, "x"), (2L, -1.0, "y")).toDF("order_id", "amount", "note"))
    val src = CsvSource(dir, header = true, inferrer = Some(SchemaInferrer(StringType,
      DataTypeRule(".*_id", LongType, nullable = false),
      DataTypeRule("amount", DoubleType))))
    val df = src.read(spark)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      Seq(("order_id", LongType), ("amount", DoubleType), ("note", StringType)))
    assert(df.agg(sum("amount")).head().getDouble(0) == 8.5)
  }
}
