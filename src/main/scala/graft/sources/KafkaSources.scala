package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kafka sink surface, Spark-first.
  *
  * reference: eel-kafka .../component/kafka/KafkaSink.scala:71-93 —
  * eel maps each row through (KafkaKeyGen, KafkaRowConverter,
  * KafkaPartitioner) into a ProducerRecord and calls
  * `producer.send(record); producer.flush()` PER ROW at the driver
  * (KafkaSink.scala:88) — a single-connection, flush-per-message
  * bottleneck. The Spark re-expression keeps the same three degrees
  * of freedom but as COLUMN transforms: the whole corpus is mapped
  * map-side into the record schema Spark's kafka DataSource consumes
  * (topic / partition / key / value / headers), and the actual
  * produce is executor-parallel with batched, linger-controlled
  * producers managed by the connector.
  *
  * The produce step itself ([[KafkaSink.write]]/[[writeStream]]) is
  * service-bound: this image ships no broker and no
  * spark-sql-kafka connector jar, so dispatch fails at DataSource
  * lookup — the record MAPPING (all the logic eel implements in its
  * converter traits) is real and spec-tested; the dispatch is the
  * documented one-line format("kafka") call. */
object KafkaMapping {

  /** Spark's kafka-sink record schema: value required; key, topic,
    * partition, headers optional. Value/key serialized as JSON of the
    * full row by default (the schema-carrying choice; pass csv/custom
    * Columns to override — eel's KafkaRowConverter, as a Column). */
  def toRecords(df: DataFrame, topic: String,
                key: Option[Column] = None,
                value: Option[Column] = None,
                partition: Option[Column] = None,
                headers: Option[Column] = None): DataFrame = {
    val v = value.getOrElse(to_json(struct(df.columns.map(col): _*)))
    val cols = Seq(
      Some(lit(topic).as("topic")),
      key.map(_.cast("binary").as("key")),
      Some(v.cast("binary").as("value")),
      partition.map(_.cast("int").as("partition")),
      headers.map(_.as("headers"))).flatten
    df.select(cols: _*)
  }

  /** eel KafkaKeyGen.HashCodeKeyGen twin: a deterministic integral key
    * from the whole row — xxhash64 of the canonical JSON rather than
    * JVM hashCode (which is neither stable across runs nor portable). */
  def rowHashKey(df: DataFrame): Column =
    xxhash64(to_json(struct(df.columns.map(col): _*))).cast("string")
}

object KafkaSink {
  /** Batch produce: map to records and hand off to the kafka
    * DataSource (executor-parallel; requires the spark-sql-kafka
    * connector on the classpath and a reachable broker — neither is in
    * this image, so this is compile-checked only). */
  def write(df: DataFrame, topic: String, bootstrapServers: String,
            key: Option[Column] = None, value: Option[Column] = None): Unit =
    KafkaMapping.toRecords(df, topic, key, value)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .save()

  /** Streaming produce — the continuous twin (micro-batched, exactly
    * the shape a CDC/log-shipping pipeline runs). */
  def writeStream(df: DataFrame, topic: String, bootstrapServers: String,
                  checkpoint: String,
                  key: Option[Column] = None, value: Option[Column] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    KafkaMapping.toRecords(df, topic, key, value)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpoint)
}
