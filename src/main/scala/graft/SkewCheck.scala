package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import scala.collection.mutable

/** Per-stage task-time skew + resource evidence: runs named queries
  * (gate or perf twins) with a listener recording every task's
  * duration and metrics, then prints per-stage (tasks, median ms,
  * max ms, max/median, Σcpu, Σgc, spill, shuffle bytes) and flags
  * stages where one straggler holds the stage >2× the median — the
  * signal that a hot shuffle key defeated the operator's skew defense
  * (capped buckets, bounded-heap partial aggs, broadcasts) and
  * [[graft.operators.SkewJoin.hotKeyJoin]] salting is warranted.
  * Stages under `minStageMs` total or with <4 tasks are noise, not
  * skew — a straggler among 4 tiny tasks is scheduling jitter.
  *
  * The resource columns separate the two non-skew failure modes a
  * flat task histogram can hide: Σcpu ≪ Σwall with big spill/shuffle
  * bytes = I/O-bound (disk contention at high parallelism); Σgc
  * large = allocation pressure. Both matter when choosing local[k]
  * for a memory-bandwidth-bound host.
  */
object SkewCheck {
  private case class M(var cpuMs: Long = 0, var gcMs: Long = 0, var spillMB: Long = 0,
                       var shufReadMB: Long = 0, var shufWriteMB: Long = 0)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val minStageMs = 200L

    names.foreach { name =>
      val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
      val metrics = mutable.Map.empty[Int, M]
      val stageName = mutable.Map.empty[Int, String]
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
          taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
            t.taskInfo.duration
          val tm = t.taskMetrics
          if (tm != null) {
            val m = metrics.getOrElseUpdate(t.stageId, M())
            m.cpuMs += tm.executorCpuTime / 1000000L
            m.gcMs += tm.jvmGCTime
            m.spillMB += (tm.memoryBytesSpilled max tm.diskBytesSpilled) >> 20
            m.shufReadMB += tm.shuffleReadMetrics.totalBytesRead >> 20
            m.shufWriteMB += tm.shuffleWriteMetrics.bytesWritten >> 20
          }
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
          stageName(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n').take(60)
        }
      }
      val q = SparkEntry.queries.getOrElse(name, SparkEntry.perfQueries(name))
      q(spark, dir).count() // warm: JIT + codegen + master stores
      spark.catalog.clearCache()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain (no public flush)
      spark.sparkContext.removeSparkListener(listener)

      println(f"%n=== $name  wall=$wall%.2f s  n=$n")
      println(f"${"stage"}%-6s ${"tasks"}%5s ${"med ms"}%7s ${"max ms"}%7s ${"mx/md"}%6s ${"cpu s"}%7s ${"gc s"}%6s ${"spill"}%6s ${"sh-r"}%6s ${"sh-w"}%6s  flag")
      taskMs.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
        val sorted = ts.sorted
        val med = sorted(sorted.length / 2)
        val max = sorted.last
        val ratio = if (med > 0) max.toDouble / med else 0.0
        val skewed = ts.length >= 4 && ts.sum >= minStageMs && med > 0 && ratio > 2.0
        val m = metrics.getOrElse(sid, M())
        println(f"$sid%-6d ${ts.length}%5d $med%7d $max%7d $ratio%6.1f ${m.cpuMs / 1000.0}%7.1f ${m.gcMs / 1000.0}%6.1f ${m.spillMB}%5dM ${m.shufReadMB}%5dM ${m.shufWriteMB}%5dM  ${if (skewed) "SKEW" else ""}%s" +
          s"  ${stageName.getOrElse(sid, "")}")
      }
    }
    spark.stop()
  }
}
