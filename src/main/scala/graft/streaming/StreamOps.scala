package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
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
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))

  /** One sessionization event: key + event time (the watermarked
    * column must survive into the grouped Dataset, hence a real
    * timestamp field alongside the micros used by the state logic). */
  final case class KeyedEvent(key: Long, eventTime: java.sql.Timestamp, tsMicros: Long)
  /** Open-session state carried between micro-batches. */
  final case class SessionState(start: Long, last: Long, n: Long)
  /** A closed session. */
  final case class ClosedSession(key: Long, startMicros: Long, endMicros: Long, n_events: Long)

  /** Streaming gap sessionization via `flatMapGroupsWithState` — the
    * stateful twin of TimeSeries.sessionize. Sessions close when the
    * gap between consecutive events of a key exceeds `gapMinutes`
    * (emitted as soon as the closing event arrives) or when the
    * event-time watermark passes the open session's last event + gap
    * (timeout path, so idle keys still flush with bounded state).
    *
    * State per key is three longs — at 1000 executors the state store
    * holds |active keys| × 24 bytes, independent of event volume. */
  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
                       gapMinutes: Int, watermarkMinutes: Int): Dataset[ClosedSession] = {
    val gapMicros = gapMinutes * 60L * 1000000L
    implicit val keyEnc = Encoders.product[KeyedEvent]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val keyed = events
      .select(col(keyCol).cast("long").as("key"),
        col(tsCol).cast("timestamp").as("eventTime"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsMicros"))
      .withWatermark("eventTime", s"$watermarkMinutes minutes")
      .as[KeyedEvent]
      .groupByKey(_.key)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: Long, it: Iterator[KeyedEvent], state: GroupState[SessionState]) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        if (it.isEmpty && state.hasTimedOut) {
          state.getOption.foreach(s => out += ClosedSession(key, s.start, s.last, s.n))
          state.remove()
        } else {
          var cur = state.getOption.orNull
          it.toSeq.sortBy(_.tsMicros).foreach { e =>
            cur match {
              case null => cur = SessionState(e.tsMicros, e.tsMicros, 1)
              case s if e.tsMicros - s.last > gapMicros =>
                out += ClosedSession(key, s.start, s.last, s.n)
                cur = SessionState(e.tsMicros, e.tsMicros, 1)
              case s => cur = SessionState(s.start, math.max(s.last, e.tsMicros), s.n + 1)
            }
          }
          if (cur != null) {
            state.update(cur)
            state.setTimeoutTimestamp(cur.last / 1000L + gapMinutes * 60L * 1000L)
          }
        }
        out.iterator
      })
  }

  /** Streaming exact dedup: drop rows whose `idCols` were already seen
    * within the watermark horizon — the streaming twin of Dedup.exact.
    * State is bounded by the watermark (expired keys are evicted), so
    * this runs indefinitely on an unbounded stream. */
  def dedupStream(df: DataFrame, idCols: Seq[String], tsCol: String,
                  watermarkMinutes: Int): DataFrame =
    df.withWatermark(tsCol, s"$watermarkMinutes minutes")
      .dropDuplicatesWithinWatermark(idCols)

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
