package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared filesystem protocol for the persisted stores (the postings
  * index in [[Search]] and the IVF index in [[Similarity]]): staged
  * batch appends that are CRASH-RETRY-SAFE.
  *
  * The problem both appends share: a bare parquet `Append` re-run
  * after a crash duplicates the delta's rows (double tf/df in the
  * postings → silently wrong BM25; double vectors in the IVF cells),
  * and nothing detects the half-applied state. The protocol here is
  * the classic staged-commit:
  *
  *   1. the delta lands under `_staging/<batchId>/` (underscore
  *      prefix → invisible to every parquet read of the store);
  *   2. its data files are RENAMED into the live relation dirs with a
  *      `b<batchId>-` name prefix (renames, never copies — and the
  *      prefix makes every moved file attributable to its batch);
  *   3. a `_commits/<batchId>` marker seals the batch;
  *   4. the staging dir is dropped.
  *
  * Idempotence: a re-run of a COMMITTED batch sees the marker and
  * no-ops (exactly-once for Structured Streaming's stable batch ids).
  * A re-run after a crash finds the staging dir WITHOUT a marker,
  * deletes every live file carrying that batch's prefix (undoing the
  * half-applied move), restores any derived state (the postings store
  * recomputes its stats row — a pure function of the data), and
  * re-applies the batch from scratch. Batch ids therefore must not
  * contain `-` (the prefix terminator) or path separators —
  * [[requireBatchId]] pins the alphabet.
  *
  * All paths go through the filesystem OWNING the store path — never
  * the default FS (the Compact.scala / FilePattern.scala rule: a
  * store on s3a:// or hdfs:// with a file:// default would otherwise
  * run the protocol against the wrong filesystem). Note the rename
  * caveat: on object stores without atomic rename (raw S3), renames
  * are copies — run maintenance against an HDFS-compatible FS or an
  * S3 committer layer, as with every rename-based Spark committer.
  */
private[graft] object StoreProtocol {

  def fsOf(spark: org.apache.spark.sql.SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `-` terminates the file prefix (`b<batchId>-`), so a batch id
    * containing it could alias another batch's files; bare `.`/`..`
    * are path components — `_staging/..` resolves to the STORE ROOT,
    * and the replay branch's staging cleanup would recursively delete
    * the whole store. */
  def requireBatchId(batchId: String): Unit =
    require(batchId.matches("[A-Za-z0-9._]+") && batchId != "." && batchId != "..",
      s"batch id must match [A-Za-z0-9._]+ and not be '.'/'..' (got '$batchId')")

  /** Drop every commit marker EXCEPT the newest (by mtime; ties all
    * kept) — called from stop-the-world maintenance so the marker set
    * stays bounded over months of streaming (one marker per
    * micro-batch otherwise accumulates forever and every listing /
    * content summary pays for it). Safe because at most ONE batch can
    * be redelivered after a restart (foreachBatch checkpoints per
    * batch), and that is the newest; replay protection for OLDER
    * batch ids ends at the next maintenance — the single-writer,
    * no-writer-during-maintenance contract. */
  def pruneCommitMarkers(fs: FileSystem, path: String): Unit = {
    val dir = new Path(s"$path/_commits")
    if (!fs.exists(dir)) return
    // only real markers: a ChecksumFileSystem writes .<name>.crc
    // sidecars whose mtimes must neither count as "newest" nor be
    // deleted out from under their marker (fs.delete of the marker
    // drops its crc itself)
    val markers = fs.listStatus(dir).filter(s => s.isFile &&
      !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
    if (markers.length > 1) {
      val newest = markers.map(_.getModificationTime).max
      markers.filter(_.getModificationTime < newest)
        .foreach(m => fs.delete(m.getPath, false))
    }
  }

  def stagingDir(path: String, batchId: String): Path =
    new Path(s"$path/_staging/$batchId")

  def commitMarker(path: String, batchId: String): Path =
    new Path(s"$path/_commits/$batchId")

  def isCommitted(fs: FileSystem, path: String, batchId: String): Boolean =
    fs.exists(commitMarker(path, batchId))

  def markCommitted(fs: FileSystem, path: String, batchId: String): Unit = {
    fs.mkdirs(new Path(s"$path/_commits"))
    fs.create(commitMarker(path, batchId), true).close()
  }

  /** Staged batches, committed or not — the repair worklist. */
  def stagedBatches(fs: FileSystem, path: String): Seq[String] = {
    val root = new Path(s"$path/_staging")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Rename every data file under `staging` into `live`, mirroring
    * partition subdirectories (`name=value`) and prefixing each file
    * with `b<batchId>-`. Metadata files (`_SUCCESS`, dot-files) are
    * skipped. Rename failures throw — a silent skip would lose rows. */
  def moveStagedFiles(fs: FileSystem, staging: Path, live: Path, batchId: String): Unit = {
    if (!fs.exists(staging)) return
    fs.mkdirs(live)
    fs.listStatus(staging).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.contains("="))
        moveStagedFiles(fs, s.getPath, new Path(live, n), batchId)
      else if (s.isFile && !n.startsWith("_") && !n.startsWith(".")) {
        val dst = new Path(live, s"b$batchId-$n")
        if (fs.exists(dst)) fs.delete(dst, true) // same-run retry debris
        if (!fs.rename(s.getPath, dst))
          throw new java.io.IOException(s"append: rename ${s.getPath} -> $dst failed")
      }
    }
  }

  /** Delete every live file carrying `batchId`'s prefix under `dir`
    * (recursing through partition subdirectories). Returns true when
    * anything was deleted — the signal that the crashed batch had
    * progressed past staging and derived state must be recomputed. */
  def deleteBatchFiles(fs: FileSystem, dir: Path, batchId: String): Boolean = {
    if (!fs.exists(dir)) return false
    val prefix = s"b$batchId-"
    var touched = false
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.contains("="))
        touched = deleteBatchFiles(fs, s.getPath, batchId) || touched
      else if (s.isFile && n.startsWith(prefix)) {
        fs.delete(s.getPath, true)
        touched = true
      }
    }
    touched
  }
}
