package graft

import graft.core.Gds
import graft.operators.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile reports native-typed extrema (not lexicographic) and null counts") {
    // ADVICE r8 case: integers 2..10 — lexicographic min/max would be "10"/"9"
    val df = (2 to 10).map(i => (i, if (i % 3 == 0) null else s"v$i"))
      .toDF("n", "s")
    val out = Quality.profile(df, Seq("n", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("n").getAs[String]("min_s") == "2")
    assert(out("n").getAs[String]("max_s") == "10")
    assert(out("n").getAs[Long]("n_distinct") == 9L)
    assert(out("n").getAs[Long]("n_null") == 0L)
    assert(out("s").getAs[Long]("n_null") == 3L)
    assert(out("s").getAs[Long]("n_nonnull") == 6L)
  }

  test("profile default is approx-distinct with an Expand-free plan; exact opt-in uses Expand") {
    val df = (1 to 100).map(i => (i.toLong, s"u${i % 7}")).toDF("id", "u")
    val approxPlan = Quality.profile(df, Seq("id", "u"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"approx profile must not plan a multi-distinct Expand:\n$approxPlan")
    val exactPlan = Quality.profile(df, Seq("id", "u"), exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    // approx estimates are exact at these cardinalities' scale of error
    val est = Quality.profile(df, Seq("u"))
      .collect().head.getAs[Long]("n_distinct")
    assert(math.abs(est - 7L) <= 1)
  }

  test("profileNumeric mean is the exact decimal mean") {
    val df = Seq(1.5, 2.5, 3.5).toDF("x")
    val r = Quality.profileNumeric(df, Seq("x")).collect().head
    assert(r.getAs[Double]("mean_v") == 2.5)
    assert(r.getAs[Double]("min_v") == 1.5 && r.getAs[Double]("max_v") == 3.5)
  }

  test("checkConstraints counts NULL predicate results as violations") {
    val df = Seq[(java.lang.Integer, String)]((5, "a"), (null, "b"), (-1, "c"))
      .toDF("q", "s")
    val out = Quality.checkConstraints(df, Seq("q_pos" -> (col("q") > 0)))
      .collect().head
    // NULL q -> predicate NULL -> violation; -1 -> violation
    assert(out.getAs[Long]("n_violations") == 2L)
    assert(out.getAs[Long]("n_rows") == 3L)
    assert(!out.getAs[Boolean]("passed"))
  }

  test("checkConstraints on an empty relation reports 0 violations / passed") {
    val df = spark.emptyDataFrame.withColumn("q", lit(1))
      .filter(lit(false)).select(col("q"))
    val out = Quality.checkConstraints(df, Seq("any" -> (col("q") > 0))).collect().head
    assert(out.getAs[Long]("n_violations") == 0L)
    assert(out.getAs[Boolean]("passed"))
  }

  test("checkConstraints tolerates rule names with dots and backticks") {
    val df = Seq(1, 2).toDF("q")
    val out = Quality.checkConstraints(df,
      Seq("rule.one `odd`" -> (col("q") % 2 === 1))).collect().head
    assert(out.getAs[String]("rule") == "rule.one `odd`")
    assert(out.getAs[Long]("n_violations") == 1L)
  }

  test("referentialCheck counts orphan child keys") {
    val child = Seq(1L, 2L, 3L, 3L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.referentialCheck("fk", child, "fk", parent, "pk").collect().head
    assert(out.getAs[Long]("n_violations") == 1L) // the 9L row
    assert(out.getAs[Long]("n_rows") == 5L)
    assert(!out.getAs[Boolean]("passed"))
  }

  test("Rules constructors compose into one single-scan suite") {
    val df = Seq(
      (1, 5.0, "A", "a@x.io"),
      (2, -1.0, "Z", "bad"),
      (3, 50.0, "N", "c@y.io")).toDF("id", "q", "flag", "mail")
    val out = Quality.checkConstraints(df, Seq(
      Quality.Rules.notNull("id"),
      Quality.Rules.inRange("q", 0, 50),
      Quality.Rules.inSet("flag", Seq("A", "N", "R")),
      Quality.Rules.matches("mail", "^[^@]+@[^@]+$"),
      Quality.Rules.nonNegative("q")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(out("not_null(id)") == 0L)
    assert(out("in_range(q)") == 1L)
    assert(out("in_set(flag)") == 1L)
    assert(out("matches(mail)") == 1L)
    assert(out("non_negative(q)") == 1L)
  }

  test("uniqueCheck counts rows beyond the first of each key group") {
    val df = Seq((1, "x"), (1, "y"), (1, "z"), (2, "w"), (3, "v")).toDF("k", "v")
    val out = Quality.uniqueCheck("k_unique", df, Seq("k")).collect().head
    assert(out.getAs[Long]("n_violations") == 2L) // 3 rows of k=1 -> 2 extra
    assert(out.getAs[Long]("n_rows") == 5L)
    assert(!out.getAs[Boolean]("passed"))
    // unique key passes; empty relation passes with 0/0
    val uq = Quality.uniqueCheck("u", df.dropDuplicates("k"), Seq("k")).collect().head
    assert(uq.getAs[Boolean]("passed"))
    val emp = Quality.uniqueCheck("e", df.filter(lit(false)), Seq("k")).collect().head
    assert(emp.getAs[Long]("n_violations") == 0L && emp.getAs[Boolean]("passed"))
  }

  test("upsert: updates win on collision, target passes through, new keys insert") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "x")
    val updates = Seq((2L, "B", 200), (4L, "d", 40)).toDF("k", "v", "x")
    val out = Gds(target).upsert(Gds(updates), "k").toDF
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out == Map(1L -> ("a", 10), 2L -> ("B", 200), 3L -> ("c", 30), 4L -> ("d", 40)))
  }

  test("correlationMatrix: perfect/anti/zero correlation, constant column -> NULL") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("x", "y2", "neg", "const")
    val out = Quality.correlationMatrix(df, Seq("x", "y2", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(out(("x", "y2")).contains(1.0))     // y = 2x
    assert(out(("x", "neg")).contains(-1.0))   // y = -x
    assert(out(("x", "const")).isEmpty)        // zero variance -> NULL
    assert(out.size == 6)                      // 4 choose 2
    // partition-invariance: exact decimal moments make r bit-stable
    val re = Quality.correlationMatrix(df.repartition(5), Seq("x", "y2", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("corr"))).toMap
    assert(re == out)
  }

  test("histogramNumeric bins cover the range, counts sum to rows, max lands in last bin") {
    val df = (0 to 99).map(_.toDouble).toDF("x")
    val out = Quality.histogramNumeric(df, "x", bins = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out.keys.toSeq.sorted == (0L to 9L))
    assert(out.values.map(_._3).sum == 100L)
    assert(out(0L)._1 == 0.0 && out(9L)._2 == 99.0) // edges span min..max
    assert(out(9L)._3 == 10L) // 90..99, max clamps into the last bin
    // constant column: single bin holding everything
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    val c = Quality.histogramNumeric(const, "x", bins = 4).collect()
    assert(c.length == 1 && c.head.getLong(0) == 0L && c.head.getLong(3) == 3L)
  }

  test("profileDrift reports mean shift, distinct ratio, and widened ranges") {
    val before = Seq(1.0, 2.0, 3.0).toDF("x")
    val after = Seq(2.0, 4.0, 6.0, 8.0).toDF("x")
    val r = Quality.profileDrift(before, after, Seq("x"), exactDistinct = true)
      .collect().head
    assert(r.getAs[Long]("n_before") == 3L && r.getAs[Long]("n_after") == 4L)
    assert(r.getAs[Double]("mean_shift") == 3.0)        // 5.0 - 2.0
    assert(math.abs(r.getAs[Double]("distinct_ratio") - 1.333333) < 1e-9)
    assert(r.getAs[Boolean]("range_widened"))           // max 8 > 3
    val same = Quality.profileDrift(before, before, Seq("x"), exactDistinct = true)
      .collect().head
    assert(same.getAs[Double]("mean_shift") == 0.0)
    assert(!same.getAs[Boolean]("range_widened"))
  }

  test("schemaDiff reports added/removed/type/nullability drift, empty when identical") {
    val before = Seq((1L, "a", 1.5)).toDF("id", "name", "score")
    val after = Seq((1, "a", true)).toDF("id", "tag", "flag")
    val out = Quality.schemaDiff(before, after)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("id") == "type_changed")    // bigint -> int
    assert(out("name") == "removed")
    assert(out("score") == "removed")
    assert(out("tag") == "added")
    assert(out("flag") == "added")
    assert(Quality.schemaDiff(before, before).count() == 0)
  }

  test("upsertLatest resolves duplicate updates and rejects stale ones") {
    val target = Seq((1L, 100L, "cur"), (2L, 50L, "old")).toDF("k", "ver", "v")
    val updates = Seq(
      (1L, 90L, "stale"),            // older than stored -> must NOT win
      (2L, 60L, "mid"), (2L, 70L, "new"), // dup key -> newest wins, then beats stored
      (3L, 10L, "ins")).toDF("k", "ver", "v")
    val out = Gds(target).upsertLatest(Gds(updates), Seq("k"), Seq("ver")).toDF
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out == Map(1L -> (100L, "cur"), 2L -> (70L, "new"), 3L -> (10L, "ins")))
  }

  test("upsertLatest rejects key columns in orderCols and missing orderCols up front") {
    val target = Seq((1L, 100L, "cur")).toDF("k", "ver", "v")
    val updates = Seq((1L, 90L, "x")).toDF("k", "ver", "v")
    val e1 = intercept[IllegalArgumentException] {
      Gds(target).upsertLatest(Gds(updates), Seq("k"), Seq("k"))
    }
    assert(e1.getMessage.contains("not keys"))
    val e2 = intercept[IllegalArgumentException] {
      Gds(target).upsertLatest(Gds(updates), Seq("k"), Seq("nope"))
    }
    assert(e2.getMessage.contains("must exist"))
  }

  test("correlationMatrix survives column names containing dots") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.5)).toDF("a.x", "b.y")
    val out = Quality.correlationMatrix(df, Seq("a.x", "b.y")).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "a.x" && out.head.getString(1) == "b.y")
    assert(math.abs(out.head.getDouble(2) - 1.0) < 0.01) // near-perfectly correlated
  }

  test("embeddingDrift: identity snapshot scores cosine 1.0; a shifted snapshot registers") {
    val base = (1 to 100).map { i =>
      (i.toLong, Array.tabulate(8)(d => (math.sin(i * 13 + d * 7) * 0.5).toFloat).toSeq)
    }.toDF("id", "v")
    val same = Quality.embeddingDrift(base, base, "v").collect().head
    assert(same.getLong(0) == 100L && same.getLong(1) == 100L)
    assert(same.getDouble(4) == 1.0)
    assert(same.getDouble(2) == same.getDouble(3)) // identical spread

    // shift every vector along dimension 0: centroid turns, norms grow
    val shifted = base.select(col("id"),
      transform(col("v"), (x, i) => when(i === 0, x + lit(3.0f)).otherwise(x)).as("v"))
    val drift = Quality.embeddingDrift(base, shifted, "v").collect().head
    assert(drift.getDouble(4) < 0.9, s"cosine ${drift.getDouble(4)} should drop")
    assert(drift.getDouble(3) > drift.getDouble(2)) // mean |x|^2 grew
  }

  test("upsert is idempotent: applying the same updates twice changes nothing") {
    val target = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val updates = (40L to 60L).map(i => (i, s"U$i")).toDF("k", "v")
    val once = Gds(target).upsert(Gds(updates), "k")
    val twice = once.upsert(Gds(updates), "k")
    val a = once.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = twice.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.size == 60) // 50 originals, 10 of them overwritten, 10 inserted
    assert(a.contains((45L, "U45")) && a.contains((10L, "v10")))
  }

  test("contentProfile: script dominance + PII incidence, one row per metric") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello plain english text"),
      (2L, "привет мир привет"),                 // cyrillic-dominant
      (3L, "contact a@b.com now"),               // latin + email
      (4L, "pay 4111111111111111 today"),        // 16 digits > 8 letters -> digit; Luhn-valid
      (5L, "... !!!")                            // no script at all -> none
    ).toDF("id", "text")
    val p = graft.operators.Quality.contentProfile(docs, "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(p("script:latin") == (5L, 2L, 0.4))
    assert(p("script:cyrillic") == (5L, 1L, 0.2))
    assert(p("script:digit") == (5L, 1L, 0.2))
    assert(p("script:none") == (5L, 1L, 0.2))
    assert(p("pii:email") == (5L, 1L, 0.2))
    assert(p("pii:phone")._2 == 0L && p("pii:ip")._2 == 0L)
    assert(p("pii:card_valid") == (5L, 1L, 0.2))
    // drift compare: a card-leaking batch moves exactly that rate
    val batch = Seq((10L, "pay 4111111111111111 today"),
      (11L, "pay 4012888888881881 now")).toDF("id", "text")
    val d = graft.operators.Quality.contentDriftFromProfiles(
      graft.operators.Quality.contentProfile(docs, "text"),
      graft.operators.Quality.contentProfile(batch, "text"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rate_shift")).toMap
    assert(d("pii:card_valid") == 0.8) // 0.2 -> 1.0
    assert(d("pii:email") == -0.2)
  }
}
