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

  test("withTables registers the whole corpus") {
    GraftSqlContext.withTables(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM region").head.getLong(0) == 5)
    assert(spark.sql(
      "SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey").head.getLong(0) > 0)
  }
}
