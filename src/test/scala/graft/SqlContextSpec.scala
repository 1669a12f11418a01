package graft

import graft.core.Gds
import graft.sql.GraftSqlContext

class SqlContextSpec extends SparkSpec {
  import spark.implicits._

  test("register + sql runs Catalyst over registered frames") {
    val ctx = GraftSqlContext(spark)
    ctx.registerFrame("t", Gds(Seq((1, "a"), (2, "b"), (2, "c")).toDF("k", "v")))
    val out = ctx.sql("SELECT k, count(*) AS n FROM t GROUP BY k")
    assert(out.collect.map(r => (r.getInt(0), r.getLong(1))).toSet == Set((1, 1L), (2, 2L)))
  }

  test("graft extension functions are callable from SQL") {
    GraftSqlContext.withTables(spark, sfDir)
    val cos = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c, graft_dot(embedding, embedding) AS d FROM embeddings LIMIT 5")
      .collect()
    cos.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getDouble(1) > 0)
    }
    val topk = spark.sql(
      """SELECT label, graft_topk(graft_cosine(embedding, array(1.0,2.0,3.0)), vec_id, 3) AS top
         FROM embeddings GROUP BY label""").collect()
    assert(topk.nonEmpty)
    topk.foreach(r => assert(r.getSeq[org.apache.spark.sql.Row](1).length <= 3))
  }

  test("text extension functions match their Column-API twins from SQL") {
    GraftSqlContext.withTables(spark, sfDir)
    import graft.functions.{TextExpressions => X, TextFunctions => T}
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      """SELECT doc_id,
                graft_shingles(trim(regexp_replace(lower(text), '\\s+', ' ')), 3) AS sh,
                graft_minhash_bands(trim(regexp_replace(lower(text), '\\s+', ' ')), 3, 64, 16) AS bands,
                graft_simhash(trim(regexp_replace(lower(text), '\\s+', ' '))) AS sim
         FROM documents ORDER BY doc_id LIMIT 20""").collect()
    val viaApi = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), T.shingles(col("text"), 3).as("sh"),
        X.minhashBands(T.normText(col("text")), 3, 64, 16).as("bands"),
        X.simhashSignature(T.normText(col("text")), useMd5 = false).as("sim"))
      .orderBy("doc_id").limit(20).collect()
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getSeq[String](1) == b.getSeq[String](1))
      assert(a.getSeq[Long](2) == b.getSeq[Long](2))
      assert(a.getLong(3) == b.getLong(3))
    }
  }

  test("graft_upper_tri from SQL matches the Column API") {
    GraftSqlContext.withTables(spark, sfDir)
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_upper_tri(array(1, 2, 3)) AS p").head.getSeq[Long](0)
    assert(viaSql == Seq(1L, 2L, 3L, 4L, 6L, 9L))
  }

  test("sketch estimators callable from SQL, agree with the Column API") {
    GraftSqlContext.withTables(spark, sfDir)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sk = (0 until 500).map(_.toLong).toDF("v")
      .agg(graft.functions.HllAggregate.sketch(xxhash64(col("v"))).as("h"),
        graft.functions.KmvAggregate.sketch(xxhash64(col("v"))).as("m"))
    sk.createOrReplaceTempView("__sk")
    val row = spark.sql(
      """SELECT graft_hll_estimate(h) AS he, graft_kmv_estimate(m) AS ke,
                graft_kmv_jaccard(m, m) AS j FROM __sk""").head
    val direct = sk.select(
      graft.functions.HllAggregate.estimate(col("h")),
      graft.functions.KmvAggregate.estimate(col("m"))).head
    assert(row.getDouble(0) == direct.getDouble(0))
    assert(row.getDouble(1) == direct.getDouble(1) && row.getDouble(1) == 500.0)
    assert(row.getDouble(2) == 1.0)
  }

  test("withTables registers the whole corpus") {
    GraftSqlContext.withTables(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM region").head.getLong(0) == 5)
    assert(spark.sql(
      "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey").head.getLong(0) > 0)
  }
}
