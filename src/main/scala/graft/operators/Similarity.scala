package graft.operators

import graft.functions.{TopKAggregate, VectorExpressions, VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is small and broadcast; the corpus is
  * streamed once; ranking is a bounded-heap partial aggregate
  * ([[graft.functions.TopKAggregate]]) so each map task emits at most
  * k rows per query into the shuffle — a window formulation would
  * shuffle every scored row. Ranking uses (rounded score, id) so
  * ordering is total and reproducible across engines/partitionings.
  */
object Similarity {

  /** groupBy(qid) -> bounded-heap topK -> explode to ranked rows.
    * Ids must be integral (the heap stores longs) — a silent cast of
    * string ids to null would drop every row, so reject up front. */
  private def rankTopK(scored: DataFrame, idCol: String, qidCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = scored.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"top-k ranking requires an integral id column, $idCol is $idType")
    scored
      .groupBy(col(qidCol))
      .agg(TopKAggregate.topK(col("score"), col(idCol).cast("long"), k).as("__top"))
      .select(col(qidCol), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col(qidCol), col("__e.id").cast(idType).as(idCol), col("__e.score").as("score"),
        (col("__r") + 1).cast("int").as("rank"))
  }

  /** Exact top-k by cosine for each query vector. `queries` must be
    * small (broadcast). Output: (qid, vec_id, score, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
    rankTopK(scored, idCol, qidCol, k)
  }

  /** LSH-bucketed ANN: score only corpus vectors sharing a bucket with
    * the query in ANY of `nTables` independent `nBits`-bit hash tables
    * (multi-table OR-probing — single-table sign-LSH recall decays as
    * cos^nBits). Cost ~ nTables * corpus/2^nBits per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qidCol: String, qvecCol: String,
              k: Int, dim: Int, nBits: Int = 8, nTables: Int = 8,
              planes: Option[Array[Double]] = None): DataFrame = {
    def buckets(v: org.apache.spark.sql.Column) = planes match {
      case Some(p) => VectorExpressions.lshBucketsWith(v, p, dim, nBits, nTables)
      case None    => V.lshBuckets(v, dim, nBits, nTables)
    }
    val cb = corpus.select(col(idCol), col(vecCol),
      posexplode(buckets(col(vecCol))).as(Seq("__table", "__bucket")))
    val qb = broadcast(queries.select(col(qidCol), col(qvecCol),
      posexplode(buckets(col(qvecCol))).as(Seq("__table", "__bucket"))))
    // score in place, then dedup multi-table hits on (qid, id): the
    // dedup shuffle carries 3 scalars, never the vectors
    val scored = cb.join(qb, Seq("__table", "__bucket"))
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
      .groupBy(col(qidCol), col(idCol)).agg(max(col("score")).as("score"))
    rankTopK(scored, idCol, qidCol, k)
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nCentroids`
    * deterministically hash-sampled corpus vectors partitions the
    * corpus into cells; each query probes its `nProbe` nearest cells
    * and scores only those vectors — cost ~ nProbe/nCentroids of
    * brute force.
    *
    * Scale shape: centroid selection is one tiny driver collect
    * (nCentroids vectors); assignment is a codegen'd map-side
    * expression (no shuffle); the probe is an equi-join on cell id
    * with the query side broadcast; ranking is the bounded-heap
    * partial aggregate. The cell relation can be written out
    * partitioned by `__cell` to make repeated query batches prune
    * whole files. */
  /** Deterministic "kmeans-lite" coarse quantizer: hash-sample
    * `nCentroids` corpus vectors (one tiny driver collect — the
    * sanctioned exception). `sampleKey` overrides the xxhash64
    * sampling order (the gate query passes an md5-of-id key so the
    * DuckDB oracle can derive the identical centroid set). Returns the
    * centroids flattened [c][dim] row-major. */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nCentroids: Int, seed: Long = 42L,
                      sampleKey: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None): Array[Double] = {
    val keyOf = sampleKey.getOrElse((id: org.apache.spark.sql.Column) => xxhash64(id, lit(seed)))
    val sampled = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(keyOf(col("__id")))
      .limit(nCentroids)
      .collect()
    val flat = new Array[Double](sampled.length * dim)
    sampled.zipWithIndex.foreach { case (r, ci) =>
      val v = r.getSeq[Double](1)
      var d = 0
      while (d < math.min(dim, v.length)) { flat(ci * dim + d) = v(d); d += 1 }
    }
    flat
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qidCol: String, qvecCol: String,
              k: Int, dim: Int, nCentroids: Int = 16, nProbe: Int = 4,
              seed: Long = 42L,
              sampleKey: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None): DataFrame = {
    val flat = sampleCentroids(corpus, idCol, vecCol, dim, nCentroids, seed, sampleKey)
    val c = flat.length / dim
    val cell1 = VectorExpressions.nearestCentroids(col(vecCol), flat, dim, c, 1)
    val cb = corpus.withColumn("__cell", element_at(cell1, 1))
    val scored = probeCells(cb, queries, idCol, vecCol, qidCol, qvecCol, flat, dim, nProbe)
    rankTopK(scored, idCol, qidCol, k)
  }

  private def probeCells(cells: DataFrame, queries: DataFrame, idCol: String,
                         vecCol: String, qidCol: String, qvecCol: String,
                         centroidsFlat: Array[Double], dim: Int, nProbe: Int): DataFrame = {
    val c = centroidsFlat.length / dim
    val qb = broadcast(queries.select(col(qidCol), col(qvecCol),
      explode(VectorExpressions.nearestCentroids(col(qvecCol), centroidsFlat, dim, c, nProbe)).as("__cell")))
    cells.join(qb, "__cell")
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
  }

  /** All-corpus kNN graph: for EVERY vector, its k nearest neighbors
    * among LSH-bucket candidates — the self-join generalization of
    * [[lshTopK]] (whose query side must be small enough to broadcast;
    * here the query set IS the corpus). The kNN graph is the input
    * relation for graph-based semantic dedup, cluster seeding, and
    * diversity sampling.
    *
    * Scale shape: candidate generation is the bucketed self-join from
    * [[Dedup.embeddingPairs]] — the exchange carries (id, table,
    * bucket) longs, never vectors, with per-bucket caps against skew;
    * each undirected candidate pair is scored once and emitted in both
    * directions (two 3-scalar rows); ranking is the bounded-heap
    * partial aggregate, k rows per vector per map task into the final
    * shuffle. Output: (qid, vec_id, score, rank). */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int, dim: Int,
               nBits: Int = 8, nTables: Int = 8, maxBucketSize: Int = 1000,
               planes: Option[Array[Double]] = None): DataFrame = {
    // threshold -2 < any cosine: keep every candidate pair
    val pairs = Dedup.embeddingPairs(corpus, idCol, vecCol, dim, threshold = -2.0,
      nBits, nTables, maxBucketSize, planes)
    val directed = pairs
      .select(col("id_l").as("qid"), col("id_r").as("vec_id"), col("cosine").as("score"))
      .union(pairs.select(col("id_r").as("qid"), col("id_l").as("vec_id"),
        col("cosine").as("score")))
      .filter(!isnan(col("score")))
    rankTopK(directed, "vec_id", "qid", k)
  }

  /** Materialize the IVF index as parquet PARTITIONED BY cell id:
    * at 100 TB the corpus is assigned once (map-side codegen'd
    * expression, no shuffle) and every later query batch reads ONLY
    * its probed cells — the broadcast cell join plants a dynamic
    * partition-pruning filter on the scan, so ~nProbe/nCentroids of
    * the files are touched (proven via the scan's numFiles metric in
    * SimilaritySpec). Returns the flattened centroids; persist them
    * next to the index for query-time reuse. */
  def buildIvfIndex(corpus: DataFrame, path: String, idCol: String, vecCol: String,
                    dim: Int, nCentroids: Int = 16, seed: Long = 42L,
                    sampleKey: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None): Array[Double] = {
    val flat = sampleCentroids(corpus, idCol, vecCol, dim, nCentroids, seed, sampleKey)
    val c = flat.length / dim
    val cell1 = VectorExpressions.nearestCentroids(col(vecCol), flat, dim, c, 1)
    corpus.withColumn("__cell", element_at(cell1, 1))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("__cell").parquet(path)
    flat
  }

  /** Append a delta batch to a persisted IVF index (see
    * [[buildIvfIndex]]) — the nightly shape of an embedding store:
    * the coarse quantizer is FROZEN (standard IVF maintenance — only
    * the inverted lists grow; re-clustering is a rebuild, not an
    * append), so the delta is assigned map-side against the stored
    * centroids and lands in the same cell partitions. Because
    * assignment depends only on (vector, centroids), the appended
    * index is bit-identical to a fresh build of old ∪ delta under the
    * same centroids — query results cannot tell them apart
    * (spec-pinned; gated as sim_ivf_append). Old vectors are never
    * re-read or re-written: the append costs O(delta).
    *
    * CRASH-RETRY-SAFE via the [[StoreProtocol]] staged commit (the
    * appendPostingsIndex shape): the delta stages under
    * `_staging/<batchId>/`, files rename into the live cells with a
    * `b<batchId>-` prefix, a `_commits/<batchId>` marker seals.
    * Re-running a committed batch is a no-op (the streaming twin is
    * exactly-once on the store); a retry after a crash first deletes
    * the batch's half-moved prefixed files, then applies it once —
    * a bare parquet `Append` would instead duplicate the vectors. */
  def appendIvfIndex(delta: DataFrame, path: String, centroidsFlat: Array[Double],
                     vecCol: String, dim: Int, batchId: String,
                     streamBatch: Boolean = false): Unit = {
    StoreProtocol.requireBatchId(batchId)
    // numeric id space is reserved for the stream twins (the
    // appendPostingsIndex rationale: one manual numeric append can
    // wedge a live stream via the ledger's high-water rule)
    if (!streamBatch) StoreProtocol.requireManualBatchId(batchId)
    val spark = delta.sparkSession
    val fs = StoreProtocol.fsOf(spark, path)
    if (StoreProtocol.isCommitted(fs, path, batchId)) {
      // replay no-op — after verifying the redelivered content matches
      // what the marker sealed (the appendPostingsIndex discipline)
      StoreProtocol.requireSameReplay(fs, path, batchId,
        StoreProtocol.contentFingerprint(delta))
      fs.delete(StoreProtocol.stagingDir(path, batchId), true)
      return
    }
    repairIvfAppends(spark, path)
    // bound the marker set on the append-only path, and fail loudly
    // on a re-used batch id whose marker aged out (the
    // appendPostingsIndex discipline — see StoreProtocol): the
    // `_applied` ledger (folded before any pruning) keeps the guard
    // loud even after a cell-rewriting delete folded away the
    // batch's prefixed files; the file probe stays as defense-in-depth
    StoreProtocol.pruneCommitMarkers(fs, path)
    if (StoreProtocol.wasApplied(fs, path, batchId) ||
        StoreProtocol.hasBatchFiles(fs, new org.apache.hadoop.fs.Path(path), batchId))
      throw new java.io.IOException(s"append: batch id '$batchId' was already applied " +
        "under a since-pruned marker; re-using old batch ids is not supported")
    appendIvfSteps(delta, path, centroidsFlat, vecCol, dim, batchId).foreach(_._2())
  }

  /** The IVF append protocol as named steps — package-visible so the
    * crash-property spec can kill the run at every step boundary. */
  private[graft] def appendIvfSteps(delta: DataFrame, path: String,
                                    centroidsFlat: Array[Double], vecCol: String,
                                    dim: Int, batchId: String): Seq[(String, () => Unit)] = {
    val fs = StoreProtocol.fsOf(delta.sparkSession, path)
    val c = centroidsFlat.length / dim
    val cell1 = VectorExpressions.nearestCentroids(col(vecCol), centroidsFlat, dim, c, 1)
    val stage = StoreProtocol.stagingDir(path, batchId)
    Seq(
      "stage-delta" -> (() =>
        delta.withColumn("__cell", element_at(cell1, 1))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("__cell").parquet(stage.toString)),
      "move-cells" -> (() => StoreProtocol.moveStagedFiles(fs, stage,
        new org.apache.hadoop.fs.Path(path), batchId)),
      "mark-commit" -> (() => StoreProtocol.markCommitted(fs, path, batchId,
        Some(StoreProtocol.contentFingerprint(delta)))),
      "clean-staging" -> (() => { fs.delete(stage, true); () }),
    )
  }

  /** Undo every half-applied (staged but uncommitted) IVF append —
    * delete the batch's prefixed files from the live cells, drop the
    * staging; committed batches' leftover staging is dropped. Runs at
    * every maintenance entry (append/delete). No derived state to
    * recompute: the index IS the data files. */
  private[graft] def repairIvfAppends(spark: org.apache.spark.sql.SparkSession,
                                      path: String): Unit = {
    val fs = StoreProtocol.fsOf(spark, path)
    StoreProtocol.stagedBatches(fs, path).foreach { batchId =>
      if (!StoreProtocol.isCommitted(fs, path, batchId))
        StoreProtocol.deleteBatchFiles(fs, new org.apache.hadoop.fs.Path(path), batchId)
      fs.delete(StoreProtocol.stagingDir(path, batchId), true)
    }
  }

  /** Delete vectors from a persisted IVF index without a rebuild —
    * the retire third of embedding-store maintenance ([[buildIvfIndex]]
    * / [[appendIvfIndex]] / ivfIndexStream cover build/append/stream):
    * when dedup retraction or a takedown drops documents, their
    * vectors must leave the index while the quantizer stays frozen.
    *
    * Scale shape: touched cells are discovered from an (id, cell)-only
    * projection (two columns off the columnar scan, vectors never
    * read) semi-joined with the broadcast delete set — the touched
    * list is ≤ nCentroids values, a by-construction-tiny collect (the
    * queryIvfIndex probed-cells contract). Survivors of ONLY those
    * cells are anti-joined and rewritten through a staging dir, then
    * each touched cell partition is swapped in with delete+rename —
    * the dynamic-partition-overwrite shape made explicit, because a
    * cell EMPTIED by the delete writes no staging partition and
    * dynamic overwrite would silently keep its old files; here absence
    * = drop. Untouched cells are never read and never written: cost is
    * O(touched cells), not O(index).
    *
    * Idempotent at-least-once (the appendIvfIndex contract):
    * re-running the same delete finds no surviving target ids in pass
    * 2 (no touched cells, no-op), and a crash at ANY point is
    * repaired at the next delete's ENTRY (property-pinned: the spec
    * kills the protocol at every step boundary) — cell dirs are
    * renamed aside (`_old__cell=N`) before being replaced, never
    * deleted first. While an `_old` lingers, a root read fails LOUDLY
    * on the conflicting partition name (never silently resurrects);
    * [[ivfStoreStats]] stays readable and surfaces it as
    * pending_cell_swaps. Entry repair disambiguates a leftover by the
    * staging dir the crashed run left behind (staging outlives every
    * per-cell swap by construction): a survivor cell (staging holds
    * its replacement) rolls BACK — the re-run re-touches it; an
    * EMPTIED cell (no staged replacement — absence is the delete)
    * rolls FORWARD, completing the drop, so a later UNRELATED delete
    * can never resurrect the dead vectors. Rename failures throw
    * instead of silently losing a cell. delete ∘ append == rebuild of
    * the surviving set under the same centroids — spec-pinned, and
    * gated (sim_ivf_delete) against the sim_ivf_topk oracle over the
    * filtered corpus. Returns the number of touched cells. */
  def deleteFromIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         deleteIds: DataFrame, idCol: String): Int = {
    val fs = StoreProtocol.fsOf(spark, path)
    repairIvfAppends(spark, path)
    repairIvfDelete(fs, path)
    // the store's stop-the-world window: bound the commit-marker set
    // (the compactPostingsIndex discipline — only the newest streamed
    // batch can ever be redelivered)
    StoreProtocol.pruneCommitMarkers(fs, path)
    val (touched, steps) = deleteFromIvfSteps(spark, path, deleteIds, idCol)
    steps.foreach(_._2())
    touched.length
  }

  /** Roll half-finished per-cell swaps to a consistent state — see
    * [[deleteFromIvfIndex]] for the staging-presence disambiguation.
    * Clears any stale staging afterwards (a re-run stages afresh). */
  private[graft] def repairIvfDelete(fs: org.apache.hadoop.fs.FileSystem,
                                     path: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + "__delstage")
    val stagingExists = fs.exists(staging)
    if (fs.exists(base)) fs.listStatus(base).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("_old__cell=")) {
        val cell = n.stripPrefix("_old")
        val live = new org.apache.hadoop.fs.Path(base, cell)
        if (fs.exists(live)) { fs.delete(s.getPath, true); () } // completed swap leftover
        else if (stagingExists && !fs.exists(new org.apache.hadoop.fs.Path(staging, cell))) {
          // crashed mid-drop of an EMPTIED cell: complete the drop —
          // restoring would resurrect the deleted vectors
          fs.delete(s.getPath, true); ()
        } else { fs.rename(s.getPath, live); () } // survivor cell: roll back, re-run re-touches
      }
    }
    if (stagingExists) { fs.delete(staging, true); () }
  }

  /** The delete protocol as named steps (the crash-property surface):
    * one staging write, then per touched cell aside → swap-in (absent
    * for emptied cells) → drop-old, staging cleanup last — staging
    * must outlive every swap, it is what entry repair disambiguates
    * with. Returns (touched cells, steps). */
  private[graft] def deleteFromIvfSteps(spark: org.apache.spark.sql.SparkSession,
                                        path: String, deleteIds: DataFrame, idCol: String)
      : (Array[Int], Seq[(String, () => Unit)]) = {
    val fs = StoreProtocol.fsOf(spark, path)
    val idx = spark.read.parquet(path)
    val dels = broadcast(deleteIds.select(col(idCol)).distinct())
    val touched = idx.select(col(idCol), col("__cell"))
      .join(dels, Seq(idCol), "left_semi")
      .select(col("__cell")).distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return (touched, Seq.empty)
    val staging = path + "__delstage"
    val stageStep = "stage-survivors" -> (() =>
      idx.filter(col("__cell").isin(touched.map(Int.box): _*))
        .join(dels, Seq(idCol), "left_anti")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("__cell").parquet(staging))
    val cellSteps = touched.toSeq.flatMap { c =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/__cell=$c")
      val old = new org.apache.hadoop.fs.Path(s"$path/_old__cell=$c")
      val src = new org.apache.hadoop.fs.Path(s"$staging/__cell=$c")
      Seq(
        s"cell-$c-aside" -> (() => {
          if (fs.exists(dst) && !fs.rename(dst, old))
            throw new java.io.IOException(s"ivf delete: rename $dst -> $old failed")
        }),
        s"cell-$c-swap-in" -> (() => {
          // no staging dir = cell emptied: dropping old IS the delete
          if (fs.exists(src) && !fs.rename(src, dst)) {
            fs.rename(old, dst) // best-effort restore
            throw new java.io.IOException(s"ivf delete: rename $src -> $dst failed")
          }
        }),
        s"cell-$c-drop-old" -> (() => { if (fs.exists(old)) { fs.delete(old, true) }; () }),
      )
    }
    val cleanStep = "clean-staging" -> (() => {
      fs.delete(new org.apache.hadoop.fs.Path(staging), true); ()
    })
    (touched, (stageStep +: cellSteps) :+ cleanStep)
  }

  /** One-row health report for a persisted IVF index — the
    * postingsStoreStats twin: row/file counts come from parquet
    * metadata and directory listings, never a vector scan. Output:
    * (n_vectors, n_cells, n_files, bytes, uncommitted_batches,
    * pending_cell_swaps, replay_hw, replay_named) — the last two
    * surface the `_applied` replay ledger (the postingsStoreStats
    * columns: what an operator checks before resetting a stream
    * checkpoint). */
  def ivfStoreStats(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val fs = StoreProtocol.fsOf(spark, path)
    val base = new org.apache.hadoop.fs.Path(path)
    val cellDirs = fs.listStatus(base).filter(_.getPath.getName.startsWith("__cell="))
    val pendingOld = fs.listStatus(base).count(_.getPath.getName.startsWith("_old__cell="))
    val nFiles = cellDirs.map(d => fs.listStatus(d.getPath)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))).sum
    val bytes = fs.getContentSummary(base).getLength
    val uncommitted = StoreProtocol.stagedBatches(fs, path)
      .count(b => !StoreProtocol.isCommitted(fs, path, b))
    // count from the LIVE cell dirs explicitly (basePath keeps the
    // partition column): a root read would trip over a pending
    // _old__cell dir's conflicting partition name — the health report
    // must stay readable in exactly the state it exists to surface
    val nVectors =
      if (cellDirs.isEmpty) 0L
      else spark.read.option("basePath", path)
        .parquet(cellDirs.map(_.getPath.toString).toSeq: _*).count()
    val (replayHw, replayIds) = StoreProtocol.readLedger(fs, path)
    spark.createDataFrame(Seq((nVectors,
        cellDirs.length.toLong, nFiles.toLong, bytes, uncommitted.toLong,
        pendingOld.toLong, replayHw, replayIds.size.toLong)))
      .toDF("n_vectors", "n_cells", "n_files", "bytes",
        "uncommitted_batches", "pending_cell_swaps", "replay_hw", "replay_named")
  }

  /** Query a persisted IVF index (see [[buildIvfIndex]]). The probed
    * cell set (≤ nQueries × nProbe values — tiny by the small-query-
    * batch contract, one driver collect like the centroids) is applied
    * as a STATIC partition filter on the index scan, so only those
    * cells' files are read (`PartitionFilters` in the plan — proven
    * via numFiles in the spec). Static beats relying on dynamic
    * partition pruning here: DPP's cost heuristic can decline exactly
    * when the batch is small, which is the common case. */
  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    centroidsFlat: Array[Double], queries: DataFrame,
                    idCol: String, vecCol: String, qidCol: String, qvecCol: String,
                    k: Int, dim: Int, nProbe: Int = 4): DataFrame = {
    val c = centroidsFlat.length / dim
    val probed = queries
      .select(explode(VectorExpressions.nearestCentroids(col(qvecCol), centroidsFlat, dim, c, nProbe)).as("__cell"))
      .distinct().collect().map(_.getInt(0))
    val cells = spark.read.parquet(path).filter(col("__cell").isin(probed.map(Int.box): _*))
    val scored = probeCells(cells, queries, idCol, vecCol, qidCol, qvecCol,
      centroidsFlat, dim, nProbe)
    rankTopK(scored, idCol, qidCol, k)
  }

  /** IVF+PQ ANN — the memory-bounded composition every large vector
    * store runs: the index holds only (id, cell, m PQ codes) — ~5 B/
    * vector instead of 4·dim — so a 100 TB float corpus compresses to
    * an index that fits cluster memory. Query = IVF probe (broadcast
    * equi-join on cell) → approximate scoring against the PQ-DECODED
    * candidate vectors (a map-side transform with the codebooks
    * inlined as literals — no lookup join) → top-`rescore` candidates
    * fetched by id from the full-precision corpus (the only touch of
    * the raw vectors, |queries|·rescore rows) → exact top-k.
    *
    * Recall loss comes only from quantization distortion inside the
    * probed cells; `rescore ≥ 4·k` recovers most of it (spec measures
    * recall vs [[bruteForceTopK]] on clustered data). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, qidCol: String, qvecCol: String,
                k: Int, dim: Int, nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 4, codes: Int = 16, rescore: Int = 20,
                seed: Long = 42L,
                sampleKey: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None): DataFrame = {
    val flat = sampleCentroids(corpus, idCol, vecCol, dim, nCentroids, seed, sampleKey)
    val c = flat.length / dim
    val cbs = Quantize.pqCodebooks(corpus, idCol, vecCol, dim, m, codes,
      iters = 2, seed = seed, sampleKey = sampleKey)
    // the compressed index relation: (id, cell, codes)
    val index = Quantize.pqEncode(corpus, idCol, vecCol, dim, cbs)
      .join(corpus.select(col(idCol),
        element_at(VectorExpressions.nearestCentroids(col(vecCol), flat, dim, c, 1), 1)
          .as("__cell")), idCol)
    val qb = broadcast(queries.select(col(qidCol), col(qvecCol),
      explode(VectorExpressions.nearestCentroids(col(qvecCol), flat, dim, c, nProbe))
        .as("__cell")))
    val approx = Quantize.pqDecodeCol(index.join(qb, "__cell"), "codes", cbs, dim)
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col("__dec"), col(qvecCol)).as("score"))
    val shortlist = rankTopK(approx, idCol, qidCol, rescore)
      .select(col(qidCol), col(idCol))
    // exact rescore: fetch full-precision vectors ONLY for the shortlist
    val exact = shortlist
      .join(corpus.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), qidCol)
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
    rankTopK(exact, idCol, qidCol, k)
  }

  /** ANN quality evaluation: per-query recall@k of an approximate
    * top-k result against the exact (brute-force) top-k — the metric
    * that decides whether an LSH/IVF parameterization is usable
    * before pointing it at the full corpus. Both inputs are (qid, id)
    * relations from [[lshTopK]]/[[ivfTopK]]/[[bruteForceTopK]].
    *
    * Scale shape: both sides are ≤ k·|queries| rows by construction
    * (tiny — the corpus never appears), one left join + one
    * partial-agg groupBy on the qid. hits and truth_k are exact
    * integers; recall is one rounded division.
    * Output: (qid, truth_k, hits, recall). */
  def recallAtK(ann: DataFrame, truth: DataFrame,
                qidCol: String, idCol: String): DataFrame =
    truth.select(col(qidCol), col(idCol))
      .join(ann.select(col(qidCol), col(idCol), lit(1L).as("__hit")),
        Seq(qidCol, idCol), "left")
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("truth_k"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .withColumn("recall", round(col("hits").cast("double") / col("truth_k"), 6))
}
