package graft

/** Whole-stage-codegen tripwire. In r1/r2 the generated code for two
  * native expressions referenced nested-object Java names janino
  * cannot resolve; Spark SILENTLY fell back to interpreted eval and
  * the hot paths lost codegen with no test failing. With
  * `spark.sql.codegen.fallback=false` a compile failure throws
  * instead — so this spec fails loudly if any expression's doGenCode
  * regresses. Covers every query built on the native expressions. */
class CodegenGuardSpec extends SparkSpec {

  private val guarded = Seq(
    "dedup_minhash",      // MinHashBandHashes + ShingleHashes (verify)
    "dedup_simhash",      // SimHashSignature (md5 path)
    "dedup_ngram_jaccard",// StringShingles
    "dedup_embedding",    // LshSignBuckets
    "sim_bruteforce_topk",// CosineSimilarity + TopKAggregate
    "sim_ivf_topk",       // NearestCentroids
    "text_repetition",    // StringShingles
    "text_normalize",     // UnicodeNormalize
    "emb_pca",            // UpperTriProducts (r7)
    "sketch_hll",         // HllEstimate (r7)
    "corpus_overlap",     // KmvEstimate + KmvJaccard (r7)
  )

  test("native-expression queries execute with codegen fallback DISABLED") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      guarded.foreach { name =>
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        assert(n >= 0, s"$name failed under fallback=false")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("BpeEncodeWord codegen path compiles (direct projection, fallback DISABLED)") {
    // inside the bpe_encode query the expression sits under a
    // higher-order transform (interpreted), so the query-level guard
    // above never exercises its doGenCode — project it directly
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("lowest", "cat").toDF("w")
        .select(graft.functions.TextExpressions.bpeEncodeWord(
          org.apache.spark.sql.functions.col("w"),
          Seq(("l", "o"), ("lo", "w"))).as("s"))
        .collect().map(_.getSeq[String](0))
      assert(out(0) == Seq("low", "e", "s", "t") && out(1) == Seq("c", "a", "t"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
