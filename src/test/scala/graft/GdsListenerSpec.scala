package graft

import graft.core.{Gds, GdsListener}
import graft.sources.ParquetSink
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Gds.withListener (the Spark-native reshaping of eel's per-row
  * Listener) and the single-pass `to(sink)` row count. */
class GdsListenerSpec extends SparkSpec {

  private class Recorder extends GdsListener {
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    override def onComplete(action: String, rowsProcessed: Long, durationNs: Long): Unit =
      events += (action -> rowsProcessed)
  }

  test("withListener reports rows processed for count/collect/to") {
    val rec = new Recorder
    val gds = Gds(Tables.table(spark, sfDir, "region")).withListener(rec)
    assert(gds.count == 5)
    assert(gds.collect.size == 5)
    val written = gds.to(ParquetSink("/tmp/graft_listener_out"))
    assert(written == 5)
    assert(rec.events.toList == List("count" -> 5L, "collect" -> 5L, "to" -> 5L))
  }

  test("foreach listener counts side-effected rows via accumulator") {
    val rec = new Recorder
    Gds(Tables.table(spark, sfDir, "nation")).withListener(rec).foreach(_ => ())
    assert(rec.events.toList == List("foreach" -> 25L))
  }

  test("to(sink) is single-pass: one write job, count from write metrics") {
    val customer = Tables.table(spark, sfDir, "customer")
    val expected = customer.count() // before the job counter is attached
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val counter = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(counter)
    try {
      val n = Gds(customer).to(ParquetSink("/tmp/graft_to_single"))
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      assert(n == expected, "row count must come from the write job's metrics")
      assert(jobs.get == 1, s"write+count must be ONE job, saw ${jobs.get}")
    } finally spark.sparkContext.removeSparkListener(counter)
  }
}
