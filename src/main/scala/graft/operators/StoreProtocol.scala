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
    * the whole store; a LEADING `.`/`_` would make the marker
    * invisible to (or collide with the `.crc` sidecars of) the
    * pruning filter below. */
  def requireBatchId(batchId: String): Unit =
    require(batchId.matches("[A-Za-z0-9][A-Za-z0-9._]*"),
      s"batch id must match [A-Za-z0-9][A-Za-z0-9._]* (got '$batchId')")

  /** Retention slack: markers within this window of the newest are
    * kept, so filesystem mtime granularity, small clock steps, and
    * rapid batches can never prune the genuinely-redeliverable batch's
    * marker (whose loss would turn its redelivery into a silent
    * double-apply — the exact failure markers exist to prevent). */
  val markerRetentionMs: Long = 60L * 60 * 1000

  /** Drop every commit marker older than the newest by more than
    * [[markerRetentionMs]] — called from maintenance entries
    * (append / delete / compact) so the marker set stays bounded over
    * months of streaming (one marker per micro-batch otherwise
    * accumulates forever and every listing / content summary pays for
    * it). Only batches not yet folded into the stream checkpoint can
    * be redelivered — the newest, by the per-batch-checkpoint
    * contract — and everything within the slack of it survives.
    * Replay protection for batch ids older than that ends here: a
    * RE-USED old id is not swallowed, it fails loudly at the file
    * move (see [[moveStagedFiles]]). */
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
      markers.filter(_.getModificationTime < newest - markerRetentionMs)
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
        // unreachable in the protocol (staged part names carry a fresh
        // write-job UUID, and a retry's repair deletes the batch's
        // prefixed files before the steps re-run) — defensive only
        if (fs.exists(dst))
          throw new java.io.IOException(s"append: $dst already exists")
        if (!fs.rename(s.getPath, dst))
          throw new java.io.IOException(s"append: rename ${s.getPath} -> $dst failed")
      }
    }
  }

  /** True when any live file under `dir` carries `batchId`'s prefix.
    * Used at append entry AFTER the marker check and the repair of
    * uncommitted batches: surviving prefixed files can then only
    * belong to a COMMITTED batch whose marker aged out of retention —
    * a re-used batch id (e.g. a reset stream checkpoint restarting at
    * batch 0). Staged part names carry fresh write-job UUIDs, so
    * without this guard the re-use would silently APPLY AGAIN
    * (duplicate rows) rather than collide. Fail loudly; recover by
    * rebuilding the store or restarting ids past the old range. */
  def hasBatchFiles(fs: FileSystem, dir: Path, batchId: String): Boolean = {
    if (!fs.exists(dir)) return false
    val prefix = s"b$batchId-"
    fs.listStatus(dir).exists { s =>
      val n = s.getPath.getName
      (s.isDirectory && n.contains("=") && hasBatchFiles(fs, s.getPath, batchId)) ||
        (s.isFile && n.startsWith(prefix))
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
