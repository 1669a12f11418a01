package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the batch operators.
  *
  * eel processes a `DataStream` as an in-process push pipeline
  * (reference: eel-core .../datastream/DataStreamPublisher.scala); the
  * Spark-native equivalent of "unbounded stream in, incremental result
  * out" is Structured Streaming: `readStream` → the same DataFrame
  * transforms → `writeStream` with watermarked state.
  */
object StreamOps {

  /** File-backed stream over a directory of parquet (the standard
    * replayable local source; swap for kafka on a real bus). */
  def parquetStream(spark: SparkSession, path: String, schema: StructType,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Watermarked tumbling-window count/sum per event_type — streaming
    * twin of TimeSeries.tumblingAgg. */
  def windowedAgg(events: DataFrame, tsCol: String, widthMinutes: Int,
                  watermarkMinutes: Int, groupCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, s"$watermarkMinutes minutes")
      .groupBy(window(col(tsCol), s"$widthMinutes minutes") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Drain a stream synchronously into an in-memory table and return
    * the batch result — test/verify harness helper. */
  def runToMemory(df: DataFrame, queryName: String, outputMode: String = "update"): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(queryName).outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }

  /** Continuous writer to partitioned parquet with checkpointing —
    * the production sink shape (exactly-once per epoch). */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
}
