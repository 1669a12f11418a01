package graft.sources

import org.apache.spark.sql.SparkSession

import scala.util.matching.Regex

/** eel `FilePattern` (reference:
  * eel-core/src/main/scala/io/eels/FilePattern.scala): a path, glob or
  * directory plus an optional filename filter, resolved to concrete
  * paths. On Spark the glob expansion itself is native to every
  * reader; this adds eel's regex/predicate filter on the file listing
  * (driver-side listing — file metadata, not data). */
final case class FilePattern(pattern: String, filter: String => Boolean = _ => true) {

  def withFilter(regex: Regex): FilePattern =
    copy(filter = name => regex.pattern.matcher(name).matches())
  def withFilter(fn: String => Boolean): FilePattern = copy(filter = fn)

  /** Resolve to concrete file paths (glob-expanded, filtered). */
  def toPaths(spark: SparkSession): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(pattern)
    val fs = path.getFileSystem(conf)
    val expanded = Option(fs.globStatus(path)).map(_.toSeq).getOrElse {
      // plain dir (or single file): list it
      if (fs.exists(path)) fs.listStatus(path).toSeq else Seq.empty
    }
    expanded.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }.map(_.getPath.toString).filter(p => filter(p.substring(p.lastIndexOf('/') + 1))).sorted
  }
}
