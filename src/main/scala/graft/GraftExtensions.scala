package graft

import graft.functions.{HllEstimate, KmvEstimate, KmvJaccard, TextExpressions, TopKAggregate, VectorExpressions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL-surface registration: `spark.sql.extensions=graft.GraftExtensions`
  * (or `GraftSession.builder`, which wires it in) exposes the native
  * expressions to SQL:
  *
  *   graft_cosine(a, b)              — fused cosine similarity
  *   graft_dot(a, b)                 — fused dot product
  *   graft_topk(score, id, k)        — bounded-heap per-group top-k
  *   graft_shingles(norm_text, k)    — word k-shingle strings
  *   graft_shingle_hashes(norm_text, k) — 64-bit shingle hashes
  *   graft_minhash(norm_text, k, n)  — full n-wide MinHash signature
  *   graft_minhash_bands(norm_text, k, n, b) — LSH band hashes
  *   graft_simhash(norm_text)        — 64-bit SimHash (xxhash64 tokens)
  *   graft_unicode_normalize(text, form) — NFC/NFKC/NFD/NFKD normalization
  *   graft_upper_tri(codes)          — upper-triangular self-products (PCA moments)
  *   graft_hll_estimate(sketch)      — HLL distinct-count estimate
  *   graft_kmv_estimate(sketch)      — KMV distinct-count estimate
  *   graft_kmv_jaccard(a, b)         — KMV sketch Jaccard overlap
  *
  * (text arguments are expected pre-normalized — compose with
  * `trim(regexp_replace(lower(t), '\\s+', ' '))` in SQL, which is
  * exactly TextFunctions.normText.)
  *
  * This is the Spark-idiomatic analogue of eel registering its
  * components into a toolkit namespace: extension points, not a forked
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _: StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[VectorExpressions.CosineSimilarity]),
      (exprs: Seq[Expression]) => VectorExpressions.CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[VectorExpressions.DotProduct]),
      (exprs: Seq[Expression]) => VectorExpressions.DotProduct(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("graft_topk"),
      info("graft_topk", classOf[TopKAggregate]),
      (exprs: Seq[Expression]) =>
        TopKAggregate(exprs(0), exprs(1), intLit(exprs(2), "graft_topk k"))))

    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", classOf[TextExpressions.StringShingles]),
      (exprs: Seq[Expression]) =>
        TextExpressions.StringShingles(exprs(0), intLit(exprs(1), "graft_shingles k"))))

    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", classOf[TextExpressions.ShingleHashes]),
      (exprs: Seq[Expression]) =>
        TextExpressions.ShingleHashes(exprs(0), intLit(exprs(1), "graft_shingle_hashes k"))))

    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", classOf[TextExpressions.MinHashSignature]),
      (exprs: Seq[Expression]) => TextExpressions.MinHashSignature(exprs(0),
        intLit(exprs(1), "graft_minhash k"), intLit(exprs(2), "graft_minhash numHashes"))))

    ext.injectFunction((FunctionIdentifier("graft_minhash_bands"),
      info("graft_minhash_bands", classOf[TextExpressions.MinHashBandHashes]),
      (exprs: Seq[Expression]) => TextExpressions.MinHashBandHashes(exprs(0),
        intLit(exprs(1), "graft_minhash_bands k"),
        intLit(exprs(2), "graft_minhash_bands numHashes"),
        intLit(exprs(3), "graft_minhash_bands numBands"))))

    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", classOf[TextExpressions.SimHashSignature]),
      (exprs: Seq[Expression]) => TextExpressions.SimHashSignature(exprs(0), useMd5 = false)))

    ext.injectFunction((FunctionIdentifier("graft_unicode_normalize"),
      info("graft_unicode_normalize", classOf[TextExpressions.UnicodeNormalize]),
      (exprs: Seq[Expression]) => TextExpressions.UnicodeNormalize(exprs(0),
        strLit(exprs(1), "graft_unicode_normalize form"))))

    ext.injectFunction((FunctionIdentifier("graft_upper_tri"),
      info("graft_upper_tri", classOf[VectorExpressions.UpperTriProducts]),
      (exprs: Seq[Expression]) => VectorExpressions.UpperTriProducts(exprs(0))))

    ext.injectFunction((FunctionIdentifier("graft_hll_estimate"),
      info("graft_hll_estimate", classOf[HllEstimate]),
      (exprs: Seq[Expression]) => HllEstimate(exprs(0))))

    ext.injectFunction((FunctionIdentifier("graft_kmv_estimate"),
      info("graft_kmv_estimate", classOf[KmvEstimate]),
      (exprs: Seq[Expression]) => KmvEstimate(exprs(0))))

    ext.injectFunction((FunctionIdentifier("graft_kmv_jaccard"),
      info("graft_kmv_jaccard", classOf[KmvJaccard]),
      (exprs: Seq[Expression]) => KmvJaccard(exprs(0), exprs(1))))
  }
}
