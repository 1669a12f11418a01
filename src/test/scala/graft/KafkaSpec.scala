package graft

import graft.sources.{KafkaMapping, KafkaSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The kafka RECORD MAPPING is the testable half of the sink (the
  * produce itself needs a broker + connector jar, neither in this
  * image — see KafkaSources.scala). */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")

  test("toRecords: kafka sink schema, JSON value roundtrips the row") {
    val recs = KafkaMapping.toRecords(df, "events",
      key = Some(col("id").cast("string")))
    assert(recs.schema.map(f => (f.name, f.dataType)) == Seq(
      ("topic", StringType), ("key", BinaryType), ("value", BinaryType)))
    val back = recs
      .select(col("topic"), col("key").cast("string").as("k"),
        from_json(col("value").cast("string"), df.schema).as("row"))
      .select(col("topic"), col("k"), col("row.*"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    assert(back.toSet == Set(("events", "1", 1L, "a", 2.5), ("events", "2", 2L, "b", 3.5)))
  }

  test("toRecords: explicit partition and headers pass through typed") {
    val recs = KafkaMapping.toRecords(df, "t",
      partition = Some((col("id") % 2).cast("int")),
      headers = Some(array(struct(lit("src").as("key"),
        lit("graft").cast("binary").as("value")))))
    assert(recs.schema("partition").dataType == IntegerType)
    val parts = recs.select("partition").collect().map(_.getInt(0)).toSet
    assert(parts == Set(0, 1))
    val h = recs.select(expr("headers[0].key"), expr("CAST(headers[0].value AS STRING)"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(h == Set(("src", "graft")))
  }

  test("rowHashKey: deterministic across runs, distinct across rows") {
    val k1 = df.select(KafkaMapping.rowHashKey(df).as("k")).collect().map(_.getString(0)).toSeq
    val k2 = df.select(KafkaMapping.rowHashKey(df).as("k")).collect().map(_.getString(0)).toSeq
    assert(k1 == k2)
    assert(k1.distinct.size == 2)
  }

  test("write/writeStream fail only at DataSource dispatch (no connector in image)") {
    val e = intercept[Exception](KafkaSink.write(df, "t", "localhost:9092"))
    // the mapping planned fine; the failure is the missing kafka DataSource
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
