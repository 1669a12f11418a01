package graft

import graft.operators.TimeSeries
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg over file source matches the batch result") {
    val events = Tables.events(spark, sfDir)
    // stage the events as a small directory of parquet files (a replayable stream)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString + "/events"
    events.repartition(4).write.parquet(dir)

    val stream = StreamOps.parquetStream(spark, dir, events.schema, maxFilesPerTrigger = 2)
    val agg = StreamOps.windowedAgg(stream, "ts", widthMinutes = 60,
      watermarkMinutes = 120, groupCols = Seq("event_type"))
    val streamed = StreamOps.runToMemory(agg, "win_agg", outputMode = "complete")
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))

    val batch = TimeSeries.tumblingAgg(events, "ts", 60, Seq("event_type"))

    val a = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
