package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark filter join"),
    (2L, "spark join join window window window"),
    (3L, "filter scan merge sort"),
    (4L, "spark window"),
  ).toDF("doc_id", "text")

  test("termFrequencies builds exact postings with doc length") {
    val tf = Search.termFrequencies(docs, "doc_id", "text", Seq("spark", "window"))
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("doc_len"))).toMap
    assert(tf(("spark", 1L)) == (3L, 5L))
    assert(tf(("spark", 2L)) == (1L, 6L))
    assert(tf(("window", 2L)) == (3L, 6L))
    assert(tf(("window", 4L)) == (1L, 2L))
    assert(!tf.contains(("spark", 3L))) // no posting for absent term
  }

  test("searchTopK ranks by tf desc with id tie-break and carries df") {
    val out = Search.searchTopK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Int]("rank")))
    // df=3 (docs 1,2,4); top-2: doc1 tf=3, then tf=1 tie -> smaller id 2
    assert(out.toSeq == Seq((1L, 3L, 3L, 1), (2L, 1L, 3L, 2)))
  }

  test("bm25 prefers higher tf and rarer terms, rank order is total") {
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("spark", "filter"), k = 4)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    // within 'spark' (df=3): doc1 (tf=3, dl=5) outranks doc2 (tf=1, dl=6)
    assert(out(("spark", 1L))._2 == 1)
    assert(out(("spark", 1L))._1 > out(("spark", 2L))._1)
    // 'filter' (df=2) is rarer than 'spark' (df=3): at equal tf=1 and
    // shorter-or-equal doc length the rarer term scores higher
    // (doc3 'filter' dl=4 vs doc2 'spark' dl=6)
    assert(out(("filter", 3L))._1 > out(("spark", 2L))._1)
  }

  test("scores are reproducible across partitionings") {
    def run(parts: Int) =
      Search.bm25TopK(docs.repartition(parts), "doc_id", "text",
        Seq("spark", "window"), k = 3)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    assert(run(1) == run(5))
  }

  test("keyphrases: tf·idf ranking, stopword cut, short-term filter, ties by term") {
    // 4 docs; "spark" appears in 3 (df·2 > 4 → stopword-cut), "join"
    // in 2 (kept, idf = 4·1024/2 = 2048), singletons get idf 4096
    val kp = Seq(
      (1L, "spark join join merge"),
      (2L, "spark join window"),
      (3L, "spark scan xy"),   // "xy" is below the 3-char term floor
      (4L, "sort sort sort sort")).toDF("doc_id", "text")
    val out = Search.keyphrases(kp, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: join tf=2·2048=4096 beats merge 1·4096=4096 — exact tie,
    // term ASC puts "join" first
    assert(out((1L, 1)) == ("join", 2L, 2L, 4096L))
    assert(out((1L, 2)) == ("merge", 1L, 1L, 4096L))
    // doc 3: "xy" dropped by the length floor; scan is the only phrase
    assert(out((3L, 1)) == ("scan", 1L, 1L, 4096L))
    assert(!out.exists { case ((d, _), (t, _, _, _)) => t == "xy" || t == "spark" })
    // doc 4: tf 4 on a singleton
    assert(out((4L, 1)) == ("sort", 4L, 1L, 16384L))
    // deterministic across partitionings
    val re = Search.keyphrases(kp.repartition(5), "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(re == out)
  }

  test("phraseSearch: exact adjacent-in-order matches, overlaps, repeated slots") {
    val pd = Seq(
      (1L, "hash join beats sort merge join"),      // one match at 0
      (2L, "join hash and hash join again"),        // reversed no, real at 3
      (3L, "hash hash join"),                       // match at 1 only
      (4L, "hash and also join"),                   // both terms, never adjacent
      (5L, "sort merge only")).toDF("doc_id", "text")
    def hits(df: org.apache.spark.sql.DataFrame, phrase: Seq[String]) =
      Search.phraseSearch(df, "doc_id", "text", phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits(pd, Seq("hash", "join")) == Set((1L, 0L), (2L, 3L), (3L, 1L)))
    // overlapping occurrences of a self-adjacent phrase all surface
    val rep = Seq((9L, "go go go stop go go")).toDF("doc_id", "text")
    assert(hits(rep, Seq("go", "go")) == Set((9L, 0L), (9L, 1L), (9L, 4L)))
    // one term filling two slots (the … the) matches only the full triple
    val tri = Seq(
      (11L, "the data the rest"), (12L, "the data lake the")).toDF("doc_id", "text")
    assert(hits(tri, Seq("the", "data", "the")) == Set((11L, 0L)))
    // 3-gram and partition invariance
    val p3 = Seq("sort", "merge", "join")
    assert(hits(pd, p3) == Set((1L, 3L)))
    assert(hits(pd.repartition(7), p3) == hits(pd, p3))
    // substring prefilter must not fake token matches ("joined" != join)
    val sub = Seq((21L, "hash joined stream")).toDF("doc_id", "text")
    assert(hits(sub, Seq("hash", "join")) == Set.empty)
  }

  test("proximityWindow: minimal covering window, all-terms-only, partition-invariant") {
    val pd = Seq(
      (1L, "spark keeps join near window now"),     // cover [0..4] = 5
      (2L, "spark join window"),                    // adjacent: 3
      (3L, "window stuff stuff spark more join"),   // [0..5] = 6
      (4L, "spark join spark window join spark"),   // best = spark(2),window(3),join(4): [2..4] = 3
      (5L, "spark join only"),                      // missing "window" -> absent
      (6L, "sparky joined windows")).toDF("doc_id", "text") // substrings only -> absent
    def run(df: org.apache.spark.sql.DataFrame, ts: Seq[String]) =
      Search.proximityWindow(df, "doc_id", "text", ts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = run(pd, Seq("spark", "join", "window"))
    assert(out == Map(1L -> 5L, 2L -> 3L, 3L -> 6L, 4L -> 3L))
    assert(run(pd.repartition(7), Seq("spark", "join", "window")) == out)
    // single term: every containing doc has window 1
    assert(run(pd, Seq("join")) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("postings index: query == bm25TopK, bucket pruning, append == rebuild") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val terms = Seq("spark", "join", "window")
    val path = java.nio.file.Files.createTempDirectory("graft_post").toString + "/pidx"
    Search.buildPostingsIndex(corpus, path, "doc_id", "text", nBuckets = 16)

    // the index path is pruning-only: bit-identical to the scorer
    val fromIndex = Search.queryPostingsIndex(spark, path, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    val scratch = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(_.toSeq).toSet
    assert(fromIndex == scratch)

    // static bucket filter: a 1-term query lists fewer postings files
    // than the full index holds (the persisted-IVF numFiles proof)
    def postingsFiles(df: DataFrame): Long = {
      df.collect()
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
        case s: FileSourceScanExec => Seq(s)
        case q: QueryStageExec => scans(q.plan)
        case _ => Nil
      }
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val ps = scans(finalPlan).filter(_.metadata.get("Location").exists(_.contains("pidx")))
      assert(ps.nonEmpty, "expected the postings file scan in the plan")
      ps.map(_.metrics("numFiles").value).sum
    }
    val allFiles = postingsFiles(spark.read.parquet(s"$path/postings"))
    val pruned = postingsFiles(Search.queryPostingsIndex(spark, path, "doc_id",
      Seq("spark"), k = 10))
    assert(pruned < allFiles, s"expected pruned ($pruned) < full ($allFiles)")

    // append O(batch): index built on half, other half appended ==
    // fresh build of the whole corpus (stats advance exactly)
    val oldHalf = corpus.filter(col("doc_id") % 2 === 0)
    val delta = corpus.filter(col("doc_id") % 2 === 1)
    val grown = java.nio.file.Files.createTempDirectory("graft_post2").toString + "/pidx"
    Search.buildPostingsIndex(oldHalf, grown, "doc_id", "text", nBuckets = 16)
    Search.appendPostingsIndex(delta, grown, "doc_id", "text", batchId = "grow1")
    val fromGrown = Search.queryPostingsIndex(spark, grown, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    assert(fromGrown == scratch)
    val st = spark.read.parquet(s"$grown/stats").collect()(0)
    val stFull = spark.read.parquet(s"$path/stats").collect()(0)
    assert(st.getAs[Long]("n_docs") == stFull.getAs[Long]("n_docs"))
    assert(st.getAs[Long]("total_tokens") == stFull.getAs[Long]("total_tokens"))

    // positional paths: phrase and proximity served from the stored
    // occurrences equal the tokenize-at-query-time operators, on the
    // full index and on the appended one
    val phrase = Seq("hash", "join")
    def phr(p: String) = Search.phraseSearchIndexed(spark, p, "doc_id", phrase)
      .collect().map(_.toSeq).toSet
    val phraseScratch = Search.phraseSearch(corpus, "doc_id", "text", phrase)
      .collect().map(_.toSeq).toSet
    assert(phr(path) == phraseScratch && phr(grown) == phraseScratch)
    def prox(p: String) = Search.proximityWindowIndexed(spark, p, "doc_id", terms)
      .collect().map(_.toSeq).toSet
    val proxScratch = Search.proximityWindow(corpus, "doc_id", "text", terms)
      .collect().map(_.toSeq).toSet
    assert(prox(path) == proxScratch && prox(grown) == proxScratch)

    // tombstone delete: query == fresh build of the survivors (exact
    // integer N/avgdl/df corrections), idempotent re-delete, and
    // compact folds the tombstones in physically without changing
    // results
    val dels = corpus.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
    val n1 = Search.deleteFromPostingsIndex(spark, path, dels, "doc_id")
    assert(n1 > 0)
    assert(Search.deleteFromPostingsIndex(spark, path, dels, "doc_id") == 0)
    val survivorsIdx = java.nio.file.Files.createTempDirectory("graft_post3").toString + "/pidx"
    Search.buildPostingsIndex(corpus.filter(col("doc_id") % 3 =!= 0), survivorsIdx,
      "doc_id", "text", nBuckets = 16)
    def q(p: String) = Search.queryPostingsIndex(spark, p, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    val tombstoned = q(path)
    assert(tombstoned == q(survivorsIdx))
    // positional queries respect tombstones too
    assert(phr(path) == phr(survivorsIdx) && prox(path) == prox(survivorsIdx))
    val before = spark.read.parquet(s"$path/postings").count()
    val beforePos = spark.read.parquet(s"$path/positions").count()
    Search.compactPostingsIndex(spark, path)
    assert(q(path) == tombstoned) // compact changes bytes, not results
    assert(phr(path) == phr(survivorsIdx) && prox(path) == prox(survivorsIdx))
    assert(spark.read.parquet(s"$path/postings").count() < before)
    assert(spark.read.parquet(s"$path/positions").count() < beforePos)
    assert(!new java.io.File(s"$path/deleted").exists())
    val stC = spark.read.parquet(s"$path/stats").collect()(0)
    val stS = spark.read.parquet(s"$survivorsIdx/stats").collect()(0)
    assert(stC.getAs[Long]("n_docs") == stS.getAs[Long]("n_docs"))
    assert(stC.getAs[Long]("total_tokens") == stS.getAs[Long]("total_tokens"))
    // compact on a clean index is a no-op
    Search.compactPostingsIndex(spark, path)
    assert(q(path) == tombstoned)
  }

  test("postings index crash recovery: half-swapped dirs roll back, stale tombstones cannot double-subtract") {
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val terms = Seq("spark", "join", "window")
    val path = java.nio.file.Files.createTempDirectory("graft_crash").toString + "/cidx"
    Search.buildPostingsIndex(corpus, path, "doc_id", "text", nBuckets = 16)
    val dels = corpus.filter(col("doc_id") % 4 === 0).select(col("doc_id"))
    Search.deleteFromPostingsIndex(spark, path, dels, "doc_id")
    val survivorsIdx = java.nio.file.Files.createTempDirectory("graft_crash2").toString + "/cidx"
    Search.buildPostingsIndex(corpus.filter(col("doc_id") % 4 =!= 0), survivorsIdx,
      "doc_id", "text", nBuckets = 16)
    def q(p: String) = Search.queryPostingsIndex(spark, p, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    val want = q(survivorsIdx)

    // crash simulation 1: between the two swap renames — live dir
    // gone, preserved __old copy present; compact's entry repair must
    // roll it back and the compaction then complete normally
    val f = new java.io.File(s"$path/postings")
    assert(f.renameTo(new java.io.File(s"$path/postings__old")))
    Search.compactPostingsIndex(spark, path)
    assert(q(path) == want)
    assert(!new java.io.File(s"$path/postings__old").exists())
    assert(!new java.io.File(s"$path/postings__staging").exists())
    assert(!new java.io.File(s"$path/deleted").exists())

    // crash simulation 2: after every swap but before the tombstone
    // clear — re-running compact with the already-applied tombstones
    // must not double-subtract (stats recomputed from data, and the
    // anti-join of compacted postings is a no-op)
    corpus.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), lit(1L).as("doc_len")) // doc_len value is irrelevant to the rerun
      .write.parquet(s"$path/deleted")
    Search.compactPostingsIndex(spark, path)
    assert(q(path) == want)
    val a = spark.read.parquet(s"$path/stats").collect()(0)
    val b = spark.read.parquet(s"$survivorsIdx/stats").collect()(0)
    assert(a.getAs[Long]("n_docs") == b.getAs[Long]("n_docs"))
    assert(a.getAs[Long]("total_tokens") == b.getAs[Long]("total_tokens"))
  }

  test("postings index contract: NULL-text docs sit outside the index corpus, empty-text docs inside") {
    val docs = Seq(
      (1L, "spark join spark"),
      (2L, null.asInstanceOf[String]),   // unindexable — no tokens to store
      (3L, "spark window pad pad"),
      (4L, "")                            // indexes via its single empty token
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_nulldoc").toString + "/idx"
    Search.buildPostingsIndex(docs, path, "doc_id", "text", nBuckets = 4)
    val st = spark.read.parquet(s"$path/stats").collect()(0)
    assert(st.getAs[Long]("n_docs") == 3L) // docs 1, 3, 4 — not the NULL doc
    // the index answers exactly as the scorer over the NON-NULL corpus
    // (bm25TopK over a corpus holding NULL-text rows counts them in N;
    // an index cannot see them — the documented divergence)
    val q = Search.queryPostingsIndex(spark, path, "doc_id", Seq("spark", "window"), k = 5)
      .collect().map(_.toSeq).toSet
    val want = Search.bm25TopK(docs.filter(col("text").isNotNull), "doc_id", "text",
      Seq("spark", "window"), k = 5).collect().map(_.toSeq).toSet
    assert(q == want)
  }

  test("rankedTopKIndexed: bit-identical to rankedTopK, respects tombstones") {
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val terms = Seq("spark", "join", "window")
    val path = java.nio.file.Files.createTempDirectory("graft_ranked_idx").toString + "/idx"
    Search.buildPostingsIndex(corpus, path, "doc_id", "text", nBuckets = 16)
    def scratch(docs: org.apache.spark.sql.DataFrame) =
      Search.rankedTopK(docs, "doc_id", "text", terms, k = 10)
        .collect().map(_.toSeq).toSet
    val fromIndex = Search.rankedTopKIndexed(spark, path, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    assert(fromIndex == scratch(corpus))
    // tombstoned store answers as a fresh ranking of the survivors
    Search.deleteFromPostingsIndex(spark, path,
      corpus.filter(col("doc_id") % 3 === 0).select(col("doc_id")), "doc_id")
    val afterDelete = Search.rankedTopKIndexed(spark, path, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet
    assert(afterDelete == scratch(corpus.filter(col("doc_id") % 3 =!= 0)))
  }

  test("hybridTopK: RRF fusion semantics — both-source docs win, single-source ties break by id") {
    val docs = Seq(
      // text: three query-term docs; vectors: e0-aligned for 1 and 4
      (1L, "spark join window pad", Seq(1f, 0f, 0f)),    // text hit + vector hit
      (2L, "spark spark join join window", Seq(0f, 1f, 0f)), // text hit only
      (3L, "scan merge sort", Seq(0.9f, 0.1f, 0f)),      // vector hit only
      (4L, "filter scan pad pad", Seq(0.8f, 0.2f, 0f)),  // vector hit only
      (5L, "sort scan pad", Seq(0f, 0f, 1f)),            // neither top-2... vector rank 4
    ).toDF("doc_id", "text", "vec")
    val qv = Seq(Tuple1(Seq(1f, 0f, 0f))).toDF("qvec")
    val terms = Seq("spark", "join", "window")
    val out = Search.hybridTopK(docs, "doc_id", "text", "vec", qv, terms,
      k = 5, poolK = 2, rrfK = 60)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    // text pool (ranked): docs {1, 2}; vector pool: {1, 3} (cos: 1 -> 1.0,
    // 3 -> .9938, 4 -> .9701, 5 -> 0). Doc 1 is in both -> must rank 1.
    val txtRank = Search.rankedTopK(docs, "doc_id", "text", terms, k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    assert(txtRank.keySet == Set(1L, 2L))
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._2 == 1)
    // exact RRF recomposition: 1/(60+tr) + 1/(60+vr)
    val expect1 = 1.0 / (60 + txtRank(1L)) + 1.0 / (60 + 1)
    assert(out(1L)._1 == expect1)
    assert(out(2L)._1 == 1.0 / (60 + txtRank(2L)))
    assert(out(3L)._1 == 1.0 / (60 + 2))
    // symmetric single-source tie (same rank, different source) breaks
    // to the smaller id
    if (txtRank(2L) == 2) assert(out(2L)._1 == out(3L)._1 && out(2L)._2 < out(3L)._2)
    // partition invariance
    val re = Search.hybridTopK(docs.repartition(7), "doc_id", "text", "vec", qv,
      terms, k = 5, poolK = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    assert(re == out)
  }

  test("hybridTopK parameterization: weights and rank constant steer the fusion exactly; guards reject misuse") {
    val docs = Seq(
      (1L, "spark join window pad", Seq(1f, 0f, 0f)),
      (2L, "spark spark join join window", Seq(0f, 1f, 0f)),
      (3L, "scan merge sort", Seq(0.9f, 0.1f, 0f)),
      (4L, "filter scan pad pad", Seq(0.8f, 0.2f, 0f)),
      (5L, "sort scan pad", Seq(0f, 0f, 1f)),
    ).toDF("doc_id", "text", "vec")
    val qv = Seq(Tuple1(Seq(1f, 0f, 0f))).toDF("qvec")
    val terms = Seq("spark", "join", "window")
    def fuse(rrfK: Int, tw: Double, vw: Double) =
      Search.hybridTopK(docs, "doc_id", "text", "vec", qv, terms,
        k = 5, poolK = 2, rrfK = rrfK, textWeight = tw, vecWeight = vw)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    val txtRank = Search.rankedTopK(docs, "doc_id", "text", terms, k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    // exact recomposition for ANY (rrfK, weights): w/(k+r) is one
    // correctly-rounded IEEE division per source, fixed two-term tree
    Seq((60, 1.0, 1.0), (10, 1.0, 1.0), (60, 2.5, 0.5), (7, 0.25, 4.0)).foreach {
      case (rk, tw, vw) =>
        val out = fuse(rk, tw, vw)
        assert(out(1L)._1 == tw / (rk + txtRank(1L)) + vw / (rk + 1),
          s"(rrfK=$rk, tw=$tw, vw=$vw) doc 1 score mismatch")
        assert(out(2L)._1 == tw / (rk + txtRank(2L)), s"doc 2 @ ($rk,$tw,$vw)")
        assert(out(3L)._1 == vw / (rk + 2), s"doc 3 @ ($rk,$tw,$vw)")
    }
    // weights steer the ranking: text-heavy puts the text-only doc 2
    // above the vector-only doc 3 (equal pool ranks), vector-heavy flips
    val textHeavy = fuse(60, 10.0, 1.0)
    val vecHeavy = fuse(60, 1.0, 10.0)
    assert(textHeavy(2L)._2 < textHeavy(3L)._2)
    assert(vecHeavy(3L)._2 < vecHeavy(2L)._2)
    // guards: non-positive tuning values and multi-row query vectors
    intercept[IllegalArgumentException] { fuse(0, 1.0, 1.0) }
    intercept[IllegalArgumentException] { fuse(60, 0.0, 1.0) }
    intercept[IllegalArgumentException] { fuse(60, 1.0, -1.0) }
    val twoQv = Seq(Tuple1(Seq(1f, 0f, 0f)), Tuple1(Seq(0f, 1f, 0f))).toDF("qvec")
    intercept[IllegalArgumentException] {
      Search.hybridTopK(docs, "doc_id", "text", "vec", twoQv, terms, k = 5, poolK = 2)
    }
    // internal-name isolation: a corpus already carrying __graft_qv /
    // score columns, with the queryVec column named like a corpus
    // column, still binds each side correctly
    val trapped = docs.withColumn("__graft_qv", col("vec")).withColumn("score", lit(9.9))
    val trappedQv = Seq(Tuple1(Seq(1f, 0f, 0f))).toDF("vec")
    assert(Search.hybridTopK(trapped, "doc_id", "text", "vec", trappedQv, terms,
        k = 5, poolK = 2).collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap ==
      fuse(60, 1.0, 1.0))
  }

  test("hybridTopKIndexed: exhaustive probe (nProbe = nCentroids) is bit-identical to the scratch hybrid") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val corpus = docs.join(emb, "doc_id")
    val terms = Seq("spark", "join", "window")
    val qv = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val root = java.nio.file.Files.createTempDirectory("graft_hybrid").toString
    Search.buildPostingsIndex(corpus, s"$root/post", "doc_id", "text", nBuckets = 16)
    val centroids = graft.operators.Similarity.buildIvfIndex(corpus.select(col("doc_id"),
        col("embedding")), s"$root/ivf", "doc_id", "embedding", dim = 64, nCentroids = 8)
    val scratch = Search.hybridTopK(corpus, "doc_id", "text", "embedding", qv,
      terms, k = 10).collect().map(_.toSeq).toSet
    // probing every cell makes the IVF side exhaustive == brute force,
    // so the whole indexed composition must equal the scratch hybrid
    val indexed = Search.hybridTopKIndexed(spark, s"$root/post", s"$root/ivf",
      centroids, qv, "doc_id", "embedding", terms, k = 10, dim = 64, nProbe = 8)
      .collect().map(_.toSeq).toSet
    assert(indexed == scratch)
  }

  // --- store crash properties: kill the protocol at EVERY step -------

  private def tinyCorpus = Seq(
    (1L, "spark join window scan"),
    (2L, "spark spark filter"),
    (3L, "join window join"),
    (4L, "merge sort scan"),
    (5L, "spark window window"),
    (6L, "filter join spark"),
    (7L, "sort spark join"),
    (8L, "window merge filter"),
  ).toDF("doc_id", "text")

  private def copyStore(src: String, dst: String): Unit =
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(src), new java.io.File(dst))

  private def qSet(p: String, terms: Seq[String]) =
    Search.queryPostingsIndex(spark, p, "doc_id", terms, k = 10)
      .collect().map(_.toSeq).toSet

  private def postingsSet(p: String) =
    spark.read.parquet(s"$p/postings")
      .select("term", "doc_id", "doc_len", "tf").collect().map(_.toSeq).toSet

  test("append crash property: the retry converges at every step boundary; committed replay is a no-op") {
    val terms = Seq("spark", "join")
    val base = tinyCorpus.filter(col("doc_id") % 2 === 0)
    val delta = tinyCorpus.filter(col("doc_id") % 2 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft_appcrash").toString
    val basePath = s"$root/base"
    Search.buildPostingsIndex(base, basePath, "doc_id", "text", nBuckets = 4)
    val fullPath = s"$root/full"
    Search.buildPostingsIndex(tinyCorpus, fullPath, "doc_id", "text", nBuckets = 4)
    val want = qSet(fullPath, terms)
    val wantPostings = postingsSet(fullPath)
    val wantStats = spark.read.parquet(s"$fullPath/stats")
      .select("n_docs", "total_tokens").collect()(0)

    // step count probed on a scratch copy (construction reads stats)
    val probe = s"$root/probe"; copyStore(basePath, probe)
    val nSteps = Search.appendPostingsSteps(delta, probe, "doc_id", "text", "b1").length

    (0 to nSteps).foreach { k =>
      val p = s"$root/k$k"; copyStore(basePath, p)
      // crash after the first k protocol steps...
      Search.appendPostingsSteps(delta, p, "doc_id", "text", "b1").take(k).foreach(_._2())
      // ...then the at-least-once retry of the SAME batch
      Search.appendPostingsIndex(delta, p, "doc_id", "text", batchId = "b1")
      assert(qSet(p, terms) == want, s"crash at step $k: query diverged")
      assert(postingsSet(p) == wantPostings, s"crash at step $k: postings diverged (duplicates?)")
      val st = spark.read.parquet(s"$p/stats").collect()(0)
      assert(st.getAs[Long]("n_docs") == wantStats.getAs[Long]("n_docs") &&
        st.getAs[Long]("total_tokens") == wantStats.getAs[Long]("total_tokens"),
        s"crash at step $k: stats diverged")
      assert(spark.read.parquet(s"$p/docs").count() == st.getAs[Long]("n_docs"))
      assert(!new java.io.File(s"$p/_staging/b1").exists(), s"crash at step $k: staging leaked")
      assert(new java.io.File(s"$p/_commits/b1").exists(), s"crash at step $k: no commit marker")
      // committed replay (exactly-once): nothing changes
      Search.appendPostingsIndex(delta, p, "doc_id", "text", batchId = "b1")
      assert(postingsSet(p) == wantPostings, s"replay after crash at step $k duplicated rows")
    }
  }

  test("compact crash property: recovery at every step boundary, and the interim store stays READ-correct") {
    val terms = Seq("spark", "join")
    val root = java.nio.file.Files.createTempDirectory("graft_cmpcrash").toString
    val basePath = s"$root/base"
    Search.buildPostingsIndex(tinyCorpus, basePath, "doc_id", "text", nBuckets = 4)
    Search.deleteFromPostingsIndex(spark, basePath,
      tinyCorpus.filter(col("doc_id") % 3 === 0).select(col("doc_id")), "doc_id")
    val survPath = s"$root/surv"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") % 3 =!= 0), survPath,
      "doc_id", "text", nBuckets = 4)
    val want = qSet(survPath, terms)
    val wantStats = spark.read.parquet(s"$survPath/stats")
      .select("n_docs", "total_tokens").collect()(0)

    val probe = s"$root/probe"; copyStore(basePath, probe)
    val nSteps = Search.compactPostingsSteps(spark, probe).length

    (0 to nSteps).foreach { k =>
      val p = s"$root/k$k"; copyStore(basePath, p)
      Search.compactPostingsSteps(spark, p).take(k).foreach(_._2())
      // a query that SUCCEEDS at the crash point must already be
      // correct — in particular the stats-swapped-but-tombstones-not-
      // cleared window, where the epoch filter keeps stale tombstones
      // from double-subtracting N/avgdl (the silent-wrong-BM25 class)
      val interim = try Some(qSet(p, terms)) catch { case _: Throwable => None }
      interim.foreach(got => assert(got == want, s"interim query at step $k is WRONG"))
      Search.compactPostingsIndex(spark, p)
      assert(qSet(p, terms) == want, s"crash at step $k: recovery diverged")
      val st = spark.read.parquet(s"$p/stats").collect()(0)
      assert(st.getAs[Long]("n_docs") == wantStats.getAs[Long]("n_docs") &&
        st.getAs[Long]("total_tokens") == wantStats.getAs[Long]("total_tokens"),
        s"crash at step $k: stats diverged")
      assert(!new java.io.File(s"$p/deleted").exists(), s"crash at step $k: tombstones not cleared")
      Seq("postings", "positions", "docs", "stats").foreach { rel =>
        assert(!new java.io.File(s"$p/${rel}__old").exists() &&
          !new java.io.File(s"$p/${rel}__staging").exists(),
          s"crash at step $k: $rel swap debris leaked")
      }
    }
  }

  test("compact crash property under CONCURRENT staging: every subset of the staging group converges") {
    // compactPostingsIndex runs stage-postings/positions/docs from a
    // thread group (guide §2.6); a crash mid-group can leave ANY subset
    // of the three staged — states the sequential prefix-kill test
    // cannot reach (it only produces prefixes). Pin: from every subset,
    // the retry converges to the no-crash result with no debris.
    val terms = Seq("spark", "join")
    val root = java.nio.file.Files.createTempDirectory("graft_cmpconc").toString
    val basePath = s"$root/base"
    Search.buildPostingsIndex(tinyCorpus, basePath, "doc_id", "text", nBuckets = 4)
    Search.deleteFromPostingsIndex(spark, basePath,
      tinyCorpus.filter(col("doc_id") % 3 === 0).select(col("doc_id")), "doc_id")
    val survPath = s"$root/surv"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") % 3 =!= 0), survPath,
      "doc_id", "text", nBuckets = 4)
    val want = qSet(survPath, terms)
    val group = Seq("stage-postings", "stage-positions", "stage-docs")
    (1 until (1 << group.length)).foreach { mask =>
      val names = group.zipWithIndex.collect { case (n, i) if (mask & (1 << i)) != 0 => n }
      val p = s"$root/m$mask"; copyStore(basePath, p)
      val byName = Search.compactPostingsSteps(spark, p).toMap
      names.foreach(n => byName(n)())
      Search.compactPostingsIndex(spark, p)
      assert(qSet(p, terms) == want, s"crash with staged=$names: recovery diverged")
      assert(!new java.io.File(s"$p/deleted").exists(), s"staged=$names: tombstones not cleared")
      Seq("postings", "positions", "docs", "stats").foreach { rel =>
        assert(!new java.io.File(s"$p/${rel}__old").exists() &&
          !new java.io.File(s"$p/${rel}__staging").exists(),
          s"staged=$names: $rel swap debris leaked")
      }
    }
  }

  test("batch ids that alias path components are rejected before any filesystem op") {
    val path = java.nio.file.Files.createTempDirectory("graft_badid").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus, path, "doc_id", "text", nBuckets = 4)
    val delta = tinyCorpus.limit(0)
    // '..' would resolve _staging/.. to the store root — the replay
    // branch's staging cleanup would recursively delete the store;
    // leading '.'/'_' would hide the marker from (or collide it with
    // the .crc sidecars of) the pruning filter
    Seq("..", ".", "a-b", "a/b", "", "_x", ".b1.crc").foreach { bad =>
      intercept[IllegalArgumentException] {
        Search.appendPostingsIndex(delta, path, "doc_id", "text", batchId = bad)
      }
    }
    assert(new java.io.File(s"$path/postings").exists())
  }

  test("a re-used batch id whose marker aged out fails LOUDLY instead of silently double-applying") {
    val path = java.nio.file.Files.createTempDirectory("graft_reuse").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 6), path,
      "doc_id", "text", nBuckets = 4)
    val d1 = tinyCorpus.filter(col("doc_id") === 7)
    Search.appendPostingsIndex(d1, path, "doc_id", "text", batchId = "b1")
    val before = postingsSet(path)
    // simulate the marker aging out of retention
    assert(new java.io.File(s"$path/_commits/b1").delete())
    new java.io.File(s"$path/_commits/.b1.crc").delete()
    val e = intercept[java.io.IOException] {
      Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
        "doc_id", "text", batchId = "b1")
    }
    assert(e.getMessage.contains("re-using old batch ids"))
    assert(postingsSet(path) == before) // nothing applied, nothing lost
  }

  test("replay protection survives marker pruning AND compaction: the applied ledger stays loud") {
    val path = java.nio.file.Files.createTempDirectory("graft_ledger").toString + "/idx"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 5), path,
      "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 6), path,
      "doc_id", "text", batchId = "1", streamBatch = true)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 7), path,
      "doc_id", "text", batchId = "2", streamBatch = true)
    // age batch 1's marker past retention; compact prunes it AND folds
    // the b1- prefixed files into unprefixed rewrites — after which the
    // old file-probe guard has nothing left to detect the reuse with
    assert(new java.io.File(s"$path/_commits/1").setLastModified(
      System.currentTimeMillis() - 2 * graft.operators.StoreProtocol.markerRetentionMs))
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") === 1).select(col("doc_id")), "doc_id")
    Search.compactPostingsIndex(spark, path)
    assert(!new java.io.File(s"$path/_commits/1").exists(), "marker should be pruned")
    assert(Seq("positions", "postings", "docs").forall(rel => !graft.operators.StoreProtocol
        .hasBatchFiles(fs, new org.apache.hadoop.fs.Path(s"$path/$rel"), "1")),
      "compact should have folded away the prefixed files — the ledger is load-bearing here")
    // checkpoint-loss redelivery of the aged-out batch id: only the
    // ledger (folded from the marker before pruning) can refuse it
    val before = postingsSet(path)
    val e = intercept[java.io.IOException] {
      Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
        "doc_id", "text", batchId = "1", streamBatch = true)
    }
    assert(e.getMessage.contains("re-using old batch ids"))
    assert(postingsSet(path) == before)
    // a genuinely new id (past the high-water mark) still appends
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
      "doc_id", "text", batchId = "3", streamBatch = true)
    assert(postingsSet(path) != before)
    // the ledger survives a torn swap: with the live copy gone the
    // preserved __old still answers (markers are only pruned after a
    // COMPLETED fold, so no crash point loses evidence)
    assert(new java.io.File(s"$path/_applied").renameTo(
      new java.io.File(s"$path/_applied__old")))
    assert(graft.operators.StoreProtocol.wasApplied(fs, path, "1"))
    // a rebuild defines a fresh store: the ledger resets with _commits,
    // so a restarted stream's batch 0/1 applies again
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 5), path,
      "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 6), path,
      "doc_id", "text", batchId = "1", streamBatch = true)
  }

  test("committed replays are content-verified: re-batched redelivery and truncated markers fail loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft_fprint").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 5), path,
      "doc_id", "text", nBuckets = 4)
    val d6 = tinyCorpus.filter(col("doc_id") === 6)
    Search.appendPostingsIndex(d6, path, "doc_id", "text", batchId = "b1")
    val before = postingsSet(path)
    // identical replay: exactly-once no-op
    Search.appendPostingsIndex(d6, path, "doc_id", "text", batchId = "b1")
    assert(postingsSet(path) == before)
    // redelivery under the same id with MORE rows (the reset-checkpoint
    // re-batching case): the fingerprint the marker sealed refuses it —
    // a bare existence no-op would have silently dropped doc 7
    val e = intercept[java.io.IOException] {
      Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id").isin(6L, 7L)), path,
        "doc_id", "text", batchId = "b1")
    }
    assert(e.getMessage.contains("DIFFERENT content"))
    assert(postingsSet(path) == before)
    // a truncated marker (crash mid-write) refuses verification rather
    // than silently downgrading to the existence check
    val w = new java.io.FileWriter(s"$path/_commits/b1"); w.write("2\n123"); w.close()
    new java.io.File(s"$path/_commits/.b1.crc").delete()
    val e2 = intercept[java.io.IOException] {
      Search.appendPostingsIndex(d6, path, "doc_id", "text", batchId = "b1")
    }
    assert(e2.getMessage.contains("corrupt"))
    assert(postingsSet(path) == before)
  }

  test("a corrupt applied-batch ledger refuses appends loudly instead of silently dropping replay history") {
    val path = java.nio.file.Files.createTempDirectory("graft_ledgercorrupt").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 5), path,
      "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 6), path,
      "doc_id", "text", batchId = "1", streamBatch = true)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 7), path,
      "doc_id", "text", batchId = "2", streamBatch = true) // entry folds marker 1 -> ledger exists
    assert(new java.io.File(s"$path/_applied").exists())
    val w = new java.io.FileWriter(s"$path/_applied"); w.write("not a number"); w.close()
    new java.io.File(s"$path/.._applied.crc").delete()
    new java.io.File(s"$path/._applied.crc").delete()
    val e = intercept[java.io.IOException] {
      Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
        "doc_id", "text", batchId = "3", streamBatch = true)
    }
    assert(e.getMessage.contains("ledger") && e.getMessage.contains("corrupt"))
  }

  test("numeric batch ids form a monotone sequence: an out-of-order id is rejected as reuse") {
    val path = java.nio.file.Files.createTempDirectory("graft_mono").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 5), path,
      "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 6), path,
      "doc_id", "text", batchId = "10", streamBatch = true)
    // the next entry folds marker 10 into the ledger's high-water mark
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 7), path,
      "doc_id", "text", batchId = "20", streamBatch = true)
    // "5" was never appended, but a numeric id below the high-water
    // mark is indistinguishable from a reset checkpoint's reuse —
    // Structured Streaming ids are monotone, so reject loudly
    val e = intercept[java.io.IOException] {
      Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
        "doc_id", "text", batchId = "5", streamBatch = true)
    }
    assert(e.getMessage.contains("re-using old batch ids"))
    // non-numeric ids are tracked by name, not by the numeric mark:
    // a fresh alpha id is fine even though "5" was refused
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 8), path,
      "doc_id", "text", batchId = "crawlA")
  }

  test("append entry self-heals a compact crashed between stats aside and swap-in") {
    val terms = Seq("spark", "join")
    val path = java.nio.file.Files.createTempDirectory("graft_heal").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 6), path,
      "doc_id", "text", nBuckets = 4)
    // the crash window a pure-streaming store could previously never
    // escape: stats renamed aside, replacement never landed — every
    // subsequent append hard-failed at the statsRow read until an
    // operator manually re-ran compact
    assert(new java.io.File(s"$path/stats")
      .renameTo(new java.io.File(s"$path/stats__old")))
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 7), path,
      "doc_id", "text", batchId = "b1")
    assert(!new java.io.File(s"$path/stats__old").exists(), "swap debris repaired")
    val fresh = java.nio.file.Files.createTempDirectory("graft_heal2").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 7), fresh,
      "doc_id", "text", nBuckets = 4)
    assert(qSet(path, terms) == qSet(fresh, terms))
    // the delete entry gets the same self-heal
    assert(new java.io.File(s"$path/stats")
      .renameTo(new java.io.File(s"$path/stats__old")))
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") === 1).select(col("doc_id")), "doc_id")
    assert(!new java.io.File(s"$path/stats__old").exists())
  }

  test("rebuild-in-place defines a FRESH store: stale tombstones, commit markers and debris cleared") {
    val terms = Seq("spark", "join")
    val path = java.nio.file.Files.createTempDirectory("graft_rebuild").toString + "/idx"
    val half = tinyCorpus.filter(col("doc_id") % 2 === 0)
    val delta = tinyCorpus.filter(col("doc_id") % 2 === 1)
    Search.buildPostingsIndex(half, path, "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(delta, path, "doc_id", "text", batchId = "b1")
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") <= 3).select(col("doc_id")), "doc_id")
    val tombstoned = qSet(path, terms)
    // a build that FAILS before writing (unresolvable column) must
    // leave the old store fully intact: tombstones still applied,
    // replay protection still honored — clearing first would have
    // resurrected taken-down docs on a store that never got rebuilt
    intercept[org.apache.spark.sql.AnalysisException] {
      Search.buildPostingsIndex(half, path, "doc_id", "no_such_column", nBuckets = 4)
    }
    assert(qSet(path, terms) == tombstoned)
    assert(new java.io.File(s"$path/deleted").exists())
    assert(new java.io.File(s"$path/_commits/b1").exists())
    // re-crawl recovery: rebuild on the SAME path
    Search.buildPostingsIndex(half, path, "doc_id", "text", nBuckets = 4)
    // the rebuilt epoch CONTINUES past the prior store's, so stale
    // tombstones could not have matched even mid-build
    assert(spark.read.parquet(s"$path/stats").collect()(0).getAs[Long]("epoch") == 1L)
    // stale tombstones must not anti-join live docs out of the rebuilt
    // store (their epoch would have matched the reset epoch 0)
    val fresh = java.nio.file.Files.createTempDirectory("graft_rebuild2").toString + "/idx"
    Search.buildPostingsIndex(half, fresh, "doc_id", "text", nBuckets = 4)
    assert(qSet(path, terms) == qSet(fresh, terms))
    assert(!new java.io.File(s"$path/deleted").exists())
    // stale commit markers must not swallow a restarted stream's first
    // batch as a "replay" — b1 must APPLY on the rebuilt store
    Search.appendPostingsIndex(delta, path, "doc_id", "text", batchId = "b1")
    val full = java.nio.file.Files.createTempDirectory("graft_rebuild3").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus, full, "doc_id", "text", nBuckets = 4)
    assert(qSet(path, terms) == qSet(full, terms))
  }

  test("compaction bounds the commit-marker set: only the newest batch keeps replay protection") {
    val path = java.nio.file.Files.createTempDirectory("graft_markers").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus.filter(col("doc_id") <= 4), path,
      "doc_id", "text", nBuckets = 4)
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 5), path,
      "doc_id", "text", batchId = "b1")
    Search.appendPostingsIndex(tinyCorpus.filter(col("doc_id") === 6), path,
      "doc_id", "text", batchId = "b2")
    def markers() = new java.io.File(s"$path/_commits").list()
      .filterNot(_.startsWith(".")).toSet // LocalFileSystem .crc sidecars
    assert(markers() == Set("b1", "b2"))
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") === 1).select(col("doc_id")), "doc_id")
    Search.compactPostingsIndex(spark, path)
    // both markers sit inside the retention slack of the newest —
    // neither may be pruned (mtime granularity / clock steps must
    // never cost the redeliverable batch its replay protection)
    assert(markers() == Set("b1", "b2"))
    // age b1 past the retention slack; the next maintenance prunes it
    assert(new java.io.File(s"$path/_commits/b1").setLastModified(
      System.currentTimeMillis() - 2 * graft.operators.StoreProtocol.markerRetentionMs))
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") === 2).select(col("doc_id")), "doc_id")
    Search.compactPostingsIndex(spark, path)
    assert(markers() == Set("b2"))
  }

  test("postingsStoreStats stays readable mid-crash (half-swapped stats falls back to the preserved copy)") {
    val path = java.nio.file.Files.createTempDirectory("graft_statsup").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus, path, "doc_id", "text", nBuckets = 4)
    assert(new java.io.File(s"$path/stats")
      .renameTo(new java.io.File(s"$path/stats__old")))
    val s = Search.postingsStoreStats(spark, path).collect()(0)
    assert(s.getAs[Long]("live_docs") == 8L) // answers from the aside copy
  }

  test("delete victim discovery scans the docs sidecar, never the postings relation") {
    val path = java.nio.file.Files.createTempDirectory("graft_sidecar").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus, path, "doc_id", "text", nBuckets = 4)
    val rel = Search.victimRelation(spark, path)
    val scans = rel.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty &&
      scans.forall(_.metadata.get("Location").exists(_.contains("/docs"))),
      "victim relation must read the (id, doc_len) sidecar")
    assert(rel.columns.toSet == Set("doc_id", "doc_len"))
  }

  test("postingsStoreStats: tombstone pressure surfaces, compaction resets it and bumps the epoch") {
    val path = java.nio.file.Files.createTempDirectory("graft_pstats").toString + "/idx"
    Search.buildPostingsIndex(tinyCorpus, path, "doc_id", "text", nBuckets = 4)
    def stats() = Search.postingsStoreStats(spark, path).collect()(0)
    val s0 = stats()
    assert(s0.getAs[Long]("live_docs") == 8L && s0.getAs[Long]("tombstoned_docs") == 0L)
    assert(s0.getAs[Long]("epoch") == 0L && s0.getAs[Long]("uncommitted_batches") == 0L)
    assert(s0.getAs[Long]("bytes") > 0L)
    // a fresh store has no replay history
    assert(s0.getAs[Long]("replay_hw") == -1L && s0.getAs[Long]("replay_named") == 0L)
    Search.deleteFromPostingsIndex(spark, path,
      tinyCorpus.filter(col("doc_id") <= 2).select(col("doc_id")), "doc_id")
    val s1 = stats()
    assert(s1.getAs[Long]("live_docs") == 6L && s1.getAs[Long]("tombstoned_docs") == 2L)
    assert(s1.getAs[Double]("tombstone_fraction") == 0.25)
    // evidence-based policy: 0.25 tombstoned — above a 0.1 budget the
    // compact runs (epoch bumps), below a 0.5 budget it does not
    assert(!Search.compactIfNeeded(spark, path, maxTombstoneFraction = 0.5))
    assert(stats().getAs[Long]("tombstoned_docs") == 2L)
    assert(Search.compactIfNeeded(spark, path, maxTombstoneFraction = 0.1))
    val s2 = stats()
    assert(s2.getAs[Long]("live_docs") == 6L && s2.getAs[Long]("tombstoned_docs") == 0L)
    assert(s2.getAs[Double]("tombstone_fraction") == 0.0 && s2.getAs[Long]("epoch") == 1L)
    // clean store: nothing due
    assert(!Search.compactIfNeeded(spark, path, maxTombstoneFraction = 0.0))
    // the replay ledger surfaces once appends fold markers into it:
    // a numeric id advances the high-water mark, a named id counts by
    // name. Fold runs at each NEXT entry, so after these three appends
    // markers 7 and crawlA are folded (batch 8's own marker is not —
    // it folds at the next maintenance entry).
    Search.appendPostingsIndex(Seq((101L, "pad spark")).toDF("doc_id", "text"),
      path, "doc_id", "text", batchId = "7", streamBatch = true)
    Search.appendPostingsIndex(Seq((102L, "pad join")).toDF("doc_id", "text"),
      path, "doc_id", "text", batchId = "crawlA")
    Search.appendPostingsIndex(Seq((103L, "pad sort")).toDF("doc_id", "text"),
      path, "doc_id", "text", batchId = "8", streamBatch = true)
    val sr = stats()
    assert(sr.getAs[Long]("replay_hw") == 7L, "marker 7 folded at batch 8's entry")
    assert(sr.getAs[Long]("replay_named") == 1L, "crawlA folded by name")
  }

  test("rankedTopK: BM25 pivot × slop boost, no-window docs keep plain BM25") {
    val ts = Seq("spark", "join", "window")
    val pd = Seq(
      (1L, "spark join window pad pad pad pad pad pad"),      // window 3 -> boost 4/3
      (2L, "spark pad pad join pad pad pad pad window"),      // window 9 -> boost 10/9
      (3L, "spark join spark join spark join pad pad pad"),   // no 'window' -> boost 1
      (4L, "scan merge sort pad pad pad pad pad pad")).toDF("doc_id", "text")
    val out = Search.rankedTopK(pd, "doc_id", "text", ts, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    // doc 4 holds no query term -> absent; the others all surface
    assert(out.keySet == Set(1L, 2L, 3L))
    // expected = (Σ per-term BM25) × (1 + 1/window): recompose from the
    // gated halves (per-term scores are round-6 there, so tolerance 3e-6)
    val perTerm = Search.bm25TopK(pd, "doc_id", "text", ts, k = 10)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        r.getAs[Double]("score")).toMap
    val win = Search.proximityWindow(pd, "doc_id", "text", ts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L).foreach { d =>
      val bm25 = ts.map(t => perTerm.getOrElse((t, d), 0.0)).sum
      val expect = bm25 * (1.0 + win.get(d).map(1.0 / _).getOrElse(0.0))
      assert(math.abs(out(d)._1 - expect) < 3e-6, s"doc $d: ${out(d)._1} vs $expect")
    }
    // identical per-doc BM25 totals (same tf/dl per term) -> the tight
    // window outranks the scattered one
    assert(out(1L)._2 < out(2L)._2 && out(1L)._1 > out(2L)._1)
    // partition invariance
    val re = Search.rankedTopK(pd.repartition(7), "doc_id", "text", ts, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("rank"))).toMap
    assert(re == out)
  }
}
