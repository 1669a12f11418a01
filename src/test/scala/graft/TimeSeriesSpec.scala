package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize starts a new session when the gap exceeds threshold") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")), // 80 min gap -> new session
      (2L, ts("2024-01-01 10:05:00")),
    ).toDF("user_id", "t")
    val out = TimeSeries.sessionize(events, "user_id", "t", gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.filter(_._1 == 1L).sortBy(_._2.getTime).map(_._3).toSeq == Seq(1L, 1L, 2L))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq(1L))
  }

  test("asofJoin picks most recent right row at or before left ts, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"),
    ).toDF("sym", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:10"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 101.0), // exactly at t2 -> matches
      (2L, ts("2024-01-01 10:00:11"), 55.0),  // after t3 -> no match
    ).toDF("sym", "qt", "price")
    val out = TimeSeries.asofJoin(trades, quotes, "sym", "t", "qt", Seq("price"))
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[java.lang.Double]("price"))).toMap
    assert(out("t1").contains(99.0))
    assert(out("t2").contains(101.0))
    assert(out("t3").isEmpty)
  }

  test("asofJoin: a matched row with NULL payload yields null, not an older value") {
    val trades = Seq((1L, ts("2024-01-01 10:00:15"), "t1")).toDF("sym", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(99.0)),
      (1L, ts("2024-01-01 10:00:10"), None), // most recent match, null price
    ).toDF("sym", "qt", "price")
    val out = TimeSeries.asofJoin(trades, quotes, "sym", "t", "qt", Seq("price")).head()
    assert(out.isNullAt(out.fieldIndex("price")))
  }

  test("asofJoin ties on (key, ts): winner is deterministic across partitionings") {
    // two right rows with IDENTICAL (key, ts) — without a content
    // tie-break last() picks a partition-order-dependent winner
    val trades = Seq((1L, ts("2024-01-01 10:00:15"), "t1")).toDF("sym", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:10"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 200.0), // tie!
    ).toDF("sym", "qt", "price")
    // the winner must be the same whatever the input partitioning /
    // row order — run across several layouts and demand one answer
    val winners = (1 to 8).flatMap { n =>
      Seq(quotes.repartition(n), quotes.repartition(n).orderBy(desc("price"))).map { q =>
        TimeSeries.asofJoin(trades, q, "sym", "t", "qt", Seq("price"))
          .head().getAs[Double]("price")
      }
    }
    assert(winners.distinct.length == 1, s"nondeterministic tie winner: $winners")
  }

  test("asofJoin tolerance nulls out stale matches") {
    val trades = Seq((1L, ts("2024-01-01 10:10:00"), "t1"),
                     (1L, ts("2024-01-01 10:00:05"), "t2")).toDF("sym", "t", "trade")
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 99.0)).toDF("sym", "qt", "price")
    val out = TimeSeries.asofJoin(trades, quotes, "sym", "t", "qt", Seq("price"),
      toleranceSeconds = Some(60))
      .collect().map(r => r.getAs[String]("trade") -> Option(r.getAs[java.lang.Double]("price"))).toMap
    assert(out("t2").contains(99.0)) // 5s old: within tolerance
    assert(out("t1").isEmpty)        // 600s old: stale
  }

  test("tumblingAgg buckets by window width") {
    val events = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0), (ts("2024-01-01 10:55:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "a", 4.0),
    ).toDF("t", "event_type", "value")
    val out = TimeSeries.tumblingAgg(events, "t", 60, Seq("event_type"))
      .orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("n_events") == 2)
    assert(out.last.getAs[Double]("sum_value") == 4.0)
  }

  test("funnel counts ordered stage completion with a conversion window") {
    // u1 completes view->click->buy in order & in window;
    // u2 clicks BEFORE its first view (out of order);
    // u3 clicks 2h after view (outside the 1h window)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"), (1L, ts("2024-01-01 10:10:00"), "click"),
      (1L, ts("2024-01-01 10:20:00"), "buy"),
      (2L, ts("2024-01-01 09:00:00"), "click"), (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view"), (3L, ts("2024-01-01 10:00:00"), "click"),
    ).toDF("user_id", "t", "event_type")
    val out = TimeSeries.funnel(events, "user_id", "t", "event_type",
      Seq("view", "click", "buy"), withinSeconds = Some(3600L))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "buy" -> 1L))
    // without the window, u3's late click (and no buy) counts at stage 2
    val open = TimeSeries.funnel(events, "user_id", "t", "event_type",
      Seq("view", "click", "buy"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(open == Map("view" -> 3L, "click" -> 2L, "buy" -> 1L))
  }

  test("multiTouchAttribution splits value equally over in-window views") {
    val purchases = Seq(
      (100L, 1L, ts("2024-01-05 12:00:00"), 30.0),
      (101L, 2L, ts("2024-01-05 12:00:00"), 8.0)).toDF("event_id", "user_id", "t", "value")
    val views = Seq(
      (1L, ts("2024-01-03 09:00:00")), // in window (2d before)
      (1L, ts("2024-01-05 11:00:00")), // in window
      (1L, ts("2024-01-05 11:30:00")), // in window, same hour as above
      (1L, ts("2024-01-01 09:00:00")), // OUT: 4 days before
      (2L, ts("2024-01-05 10:00:00")), // user 2, in window
      (3L, ts("2024-01-05 10:00:00"))  // other user: never credited
    ).toDF("user_id", "view_ts")
    val out = TimeSeries.multiTouchAttribution(purchases, views,
        "event_id", "user_id", "t", "view_ts", "value", lookbackDays = 3)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    // purchase 100: 3 views → 10 each; 11:00 hour holds two credits
    assert(out == Set(
      ("2024-01-03 09:00:00.0", 1L, 10.0),
      ("2024-01-05 11:00:00.0", 2L, 20.0),
      ("2024-01-05 10:00:00.0", 1L, 8.0)))
    // repartition-stable (decimal credit sums are order-free)
    val re = TimeSeries.multiTouchAttribution(purchases.repartition(4),
        views.repartition(3), "event_id", "user_id", "t", "view_ts", "value", 3)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(re == out)
  }

  test("activityTrend: exact OLS slope on a hand-built ramp, flat series slopes 0") {
    // type "up": counts 1,2,3 on days 0,1,2 → slope exactly 1
    // type "flat": 2,2,2 → slope 0; type "one": single day → den 0 → 0
    def at(day: Int, n: Int, t: String) =
      (0 until n).map(i => (t, ts(f"2024-01-0${day + 1}%d 12:00:0$i%d")))
    val events = (at(0, 1, "up") ++ at(1, 2, "up") ++ at(2, 3, "up") ++
      at(0, 2, "flat") ++ at(1, 2, "flat") ++ at(2, 2, "flat") ++
      at(1, 3, "one")).toDF("event_type", "t")
    val out = TimeSeries.activityTrend(events, "event_type", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // up: n=3 Σt=3 Σy=6 Σty=1·0+2·1+3·2=8 Σt²=5 → num 24−18=6, den 15−9=6
    assert(out("up") == ((3L, 6L, 6L, 6L, 1.0)))
    assert(out("flat") == ((3L, 6L, 0L, 6L, 0.0)))
    // single-day series: denominator 0 → slope defined as 0
    assert(out("one") == ((1L, 3L, 0L, 0L, 0.0)))
    // re-based per segment: shifting one series' days never changes it
    val re = TimeSeries.activityTrend(events.repartition(5), "event_type", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(re == out)
  }

  test("retention builds the cohort x offset activity matrix") {
    // u1 first active day 0, returns day 1; u2 first active day 1 only
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")), // same period
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-02 09:00:00")),
    ).toDF("user_id", "t")
    val out = TimeSeries.retention(events, "user_id", "t", periodDays = 1)
      .collect().map(r => (r.getAs[Long]("cohort_week") - 19723L, // 2024-01-01 epoch day
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  test("activityAnomaly flags the spike day against exact integer moments") {
    // u1: 6 days of activity 2,2,2,2,2,12 -> day 6 is a clear spike
    // (a single outlier among n days z-scores at sqrt(n-1) = sqrt(5));
    // u2: only 2 active days (below minPeriods);
    // u3: constant activity (zero variance)
    def day(d: Int, n: Int, u: Long) =
      (1 to n).map(i => (u, ts(f"2024-01-0$d 10:${i}%02d:00")))
    val events = (
      (1 to 5).flatMap(d => day(d, 2, 1L)) ++ day(6, 12, 1L)
        ++ day(1, 9, 2L) ++ day(2, 1, 2L)
        ++ day(1, 3, 3L) ++ day(2, 3, 3L) ++ day(3, 3, 3L)
      ).toDF("user_id", "t")
    val out = TimeSeries.activityAnomaly(events, "user_id", "t")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day") - 19723L) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("z"))).toMap
    assert(out.keySet == Set((1L, 5L))) // only u1's spike day
    val (n, z) = out((1L, 5L))
    assert(n == 12L)
    // exact moments: n=6, s=22, ssq=164 -> z = sqrt(5) rounded 6dp
    assert(z == 2.236068)
  }

  test("activityAnomaly is invariant under repartitioning") {
    val events = (1 to 200).map { i =>
      (i % 7L, ts(f"2024-01-${i % 9 + 1}%02d ${i % 24}%02d:00:00"))
    }.toDF("user_id", "t")
    def run(p: Int) = TimeSeries.activityAnomaly(events.repartition(p), "user_id", "t")
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(6))
  }

  test("transitions counts consecutive pairs per user, id-tie-broken") {
    val events = Seq(
      // user 1: a -> b -> b ; the two 10:01:00 rows tie on ts and are
      // ordered by event_id (2 before 3)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:01:00"), 3L, "b"),
      // user 2: b -> a
      (2L, ts("2024-01-01 09:00:00"), 4L, "b"),
      (2L, ts("2024-01-01 09:30:00"), 5L, "a"),
      // user 3: single event, no transition
      (3L, ts("2024-01-01 08:00:00"), 6L, "a"),
    ).toDF("user_id", "t", "event_id", "etype")
    def run(p: Int) = TimeSeries.transitions(events.repartition(p), "user_id", "t", "etype", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val out = run(1)
    assert(out == Map(("a", "b") -> 1L, ("b", "b") -> 1L, ("b", "a") -> 1L))
    assert(run(5) == out)
  }

  test("topPaths: first-N path per user, counted and ranked") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"), (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "a"), (2L, ts("2024-01-01 10:05:00"), 4L, "b"),
      (2L, ts("2024-01-01 10:06:00"), 5L, "c"), // beyond pathLen=2 -> truncated
      (3L, ts("2024-01-01 10:00:00"), 6L, "b"),
    ).toDF("user_id", "t", "event_id", "etype")
    val out = TimeSeries.topPaths(events, "user_id", "t", "etype", "event_id",
      pathLen = 2, k = 10).collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("a>b" -> 2L, "b" -> 1L)) // ranked count desc
  }

  test("conversionLag buckets first-from to first-to latency, strict order") {
    val events = Seq(
      // user 1: view 10:00, purchases 09:00 (before -> ignored) and 11:30 -> lag 90min, bucket 1
      (1L, ts("2024-01-01 10:00:00"), "view"), (1L, ts("2024-01-01 09:00:00"), "purchase"),
      (1L, ts("2024-01-01 11:30:00"), "purchase"),
      // user 2: view 10:00, purchase 10:20 -> bucket 0
      (2L, ts("2024-01-01 10:00:00"), "view"), (2L, ts("2024-01-01 10:20:00"), "purchase"),
      // user 3: purchase with no prior view -> excluded entirely
      (3L, ts("2024-01-01 10:00:00"), "purchase"),
      // user 4: view, never purchases -> excluded
      (4L, ts("2024-01-01 10:00:00"), "view"),
    ).toDF("user_id", "t", "etype")
    val out = TimeSeries.conversionLag(events, "user_id", "t", "etype", "view", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L))
  }

  test("rollingActive counts day-distinct and trailing-window-distinct users") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")), // same day once
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
    ).toDF("user_id", "t")
    val out = TimeSeries.rollingActive(events, "user_id", "t", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    // Jan 1: dau 2 (u1, u2), wau(window Dec30-Jan1) 2
    // Jan 3: dau 1 (u1), wau(Jan1-3) 2 (u1 and u2's Jan 1 still in window)
    assert(out == Map("2024-01-01" -> (2L, 2L), "2024-01-03" -> (1L, 2L)))
    // Jan 2 has no direct activity -> not emitted
    assert(!out.contains("2024-01-02"))
  }

  test("churn reports users absent in the following period") {
    val d0 = ts("1970-01-01 12:00:00") // period 0 under 7-day epoch div
    def plusDays(t: Timestamp, d: Int) = new Timestamp(t.getTime + d * 86400000L)
    val events = Seq(
      (1L, d0), (2L, d0),            // period 0: u1, u2
      (1L, plusDays(d0, 7)),         // period 1: u1 only -> u2 churned at 0
      (3L, plusDays(d0, 8)),         //           u3 appears
    ).toDF("user_id", "t")
    val out = TimeSeries.churn(events, "user_id", "t", periodDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) == (2L, 1L, 0.5))   // u2 gone
    assert(out(1L) == (2L, 2L, 1.0))   // final period: full churn by construction
  }

  test("scd2History collapses runs and emits validity intervals") {
    val ev = Seq(
      (1L, "free", ts("2024-01-01 00:00:00"), 1L),
      (1L, "free", ts("2024-01-02 00:00:00"), 2L), // repeat -> collapsed
      (1L, "pro", ts("2024-01-03 00:00:00"), 3L),
      (1L, "free", ts("2024-01-04 00:00:00"), 4L), // back to free: NEW run
      (2L, "pro", ts("2024-01-01 00:00:00"), 5L),
    ).toDF("k", "state", "t", "id")
    val out = TimeSeries.scd2History(ev, "k", "state", "t", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    val u1 = out.filter(_._1 == 1L).sortBy(_._3.getTime)
    assert(u1.map(_._2).toSeq == Seq("free", "pro", "free"))
    assert(u1(0)._4.contains(ts("2024-01-03 00:00:00"))) // valid_to = next run start
    assert(u1(1)._4.contains(ts("2024-01-04 00:00:00")))
    assert(u1(2)._4.isEmpty && u1(2)._5)                 // current run open-ended
    assert(out.filter(_._1 == 2L).head._5)
  }

  test("scd2History same-ts ties break by tieCol and NULL states are first-class") {
    // two state changes at the SAME timestamp: tie column orders them
    val tied = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 10L),
      (1L, "b", ts("2024-01-01 00:00:00"), 20L), // same ts, higher tie -> later
      (1L, "b", ts("2024-01-02 00:00:00"), 30L),
    ).toDF("k", "state", "t", "id")
    val t1 = TimeSeries.scd2History(tied, "k", "state", "t", "id")
      .collect().map(r => (r.getString(1), Option(r.getTimestamp(3))))
    assert(t1.length == 2) // a then b; the day-2 b collapses into the run
    assert(t1.toMap.apply("a").contains(ts("2024-01-01 00:00:00")))

    // NULL-state histories (the ADVICE r8 case): A -> NULL -> NULL -> B,
    // and a key whose FIRST state is NULL
    val nul = Seq(
      (1L, Some("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, None, ts("2024-01-02 00:00:00"), 2L),
      (1L, None, ts("2024-01-03 00:00:00"), 3L), // repeat NULL -> collapsed
      (1L, Some("B"), ts("2024-01-04 00:00:00"), 4L),
      (2L, None, ts("2024-01-01 00:00:00"), 5L), // first row NULL state
    ).toDF("k", "state", "t", "id")
    val n1 = TimeSeries.scd2History(nul, "k", "state", "t", "id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    val k1 = n1.filter(_._1 == 1L).sortBy(_._3.getTime)
    assert(k1.map(_._2).toSeq == Seq(Some("A"), None, Some("B")))
    assert(k1(0)._4.contains(ts("2024-01-02 00:00:00"))) // A ends when NULL run starts
    assert(k1(1)._4.contains(ts("2024-01-04 00:00:00"))) // NULL run ends at B
    val k2 = n1.filter(_._1 == 2L)
    assert(k2.length == 1 && k2.head._2.isEmpty && k2.head._4.isEmpty)
  }

  test("asofNearest picks the closer side and breaks equal distance backward") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:10"), "L1"), // back@09:59:50 d=20s, fwd@10:00:25 d=15s -> fwd
      (1L, ts("2024-01-01 10:00:00"), "L2"), // back@09:59:50 d=10s, fwd@10:00:25 d=25s -> back
      (2L, ts("2024-01-01 10:00:00"), "L3"), // only forward exists
      (3L, ts("2024-01-01 10:00:00"), "L4"), // no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:59:50"), 1.0),
      (1L, ts("2024-01-01 10:00:25"), 2.0),
      (2L, ts("2024-01-01 10:00:30"), 3.0),
    ).toDF("k", "t", "v")
    val out = TimeSeries.asofNearest(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(out("L1").contains(2.0))
    assert(out("L2").contains(1.0))
    assert(out("L3").contains(3.0))
    assert(out("L4").isEmpty)

    // exact equal distance: 10s either way -> backward wins
    val l2 = Seq((1L, ts("2024-01-01 10:00:10"), "E")).toDF("k", "t", "tag")
    val r2 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:20"), 20.0),
    ).toDF("k", "t", "v")
    val e = TimeSeries.asofNearest(l2, r2, "k", "t", "t", Seq("v")).collect().head
    assert(e.getAs[Double]("v") == 10.0)

    // simultaneous right row: distance 0 backward beats any forward
    val l3 = Seq((1L, ts("2024-01-01 10:00:00"), "Z")).toDF("k", "t", "tag")
    val r3 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 10:00:01"), 6.0),
    ).toDF("k", "t", "v")
    val z = TimeSeries.asofNearest(l3, r3, "k", "t", "t", Seq("v")).collect().head
    assert(z.getAs[Double]("v") == 5.0)
  }

  test("pointInTime returns the state valid AT each probe timestamp") {
    val ev = Seq(
      (1L, "free", ts("2024-01-01 00:00:00"), 1L),
      (1L, "pro", ts("2024-01-10 00:00:00"), 2L),
      (1L, "free", ts("2024-01-20 00:00:00"), 3L),
    ).toDF("k", "state", "t", "id")
    val hist = TimeSeries.scd2History(ev, "k", "state", "t", "id")
    val probes = Seq(
      (1L, ts("2023-12-31 00:00:00"), "before"), // before first run -> null
      (1L, ts("2024-01-05 00:00:00"), "mid1"),   // inside free run
      (1L, ts("2024-01-10 00:00:00"), "atChange"), // exactly at change -> new state
      (1L, ts("2024-01-15 00:00:00"), "mid2"),
      (1L, ts("2024-02-01 00:00:00"), "open"),   // inside the open run
      (2L, ts("2024-01-05 00:00:00"), "nokey"),  // key with no history
    ).toDF("k", "t", "tag")
    val out = TimeSeries.pointInTime(hist, probes, "k", "t")
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("state"))).toMap
    assert(out("before").isEmpty)
    assert(out("mid1").contains("free"))
    assert(out("atChange").contains("pro"))
    assert(out("mid2").contains("pro"))
    assert(out("open").contains("free"))
    assert(out("nokey").isEmpty)
  }

  test("asofNearest tolerance disqualifies far candidates before the pick") {
    val left = Seq(
      (1L, ts("2024-01-01 12:00:00"), "A"), // back 3h stale, fwd 10min in-budget -> fwd
      (2L, ts("2024-01-01 12:00:00"), "B"), // both beyond budget -> null
      (3L, ts("2024-01-01 12:00:00"), "C"), // both in budget: fwd 2min beats back 5min
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0), (1L, ts("2024-01-01 12:10:00"), 2.0),
      (2L, ts("2024-01-01 09:00:00"), 3.0), (2L, ts("2024-01-01 15:00:00"), 4.0),
      (3L, ts("2024-01-01 11:55:00"), 5.0), (3L, ts("2024-01-01 12:02:00"), 6.0),
    ).toDF("k", "t", "v")
    val out = TimeSeries.asofNearest(left, right, "k", "t", "t", Seq("v"),
      toleranceSeconds = Some(1800))
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(out("A").contains(2.0))
    assert(out("B").isEmpty)
    assert(out("C").contains(6.0))
  }

  test("scd2History intervals partition each key's timeline (property)") {
    // randomized-but-deterministic change stream: every key's history
    // must start at its first event, chain valid_to == next valid_from,
    // and end with exactly one open (is_current) run
    val rnd = new scala.util.Random(42)
    val ev = (1 to 500).map { i =>
      val k = rnd.nextInt(7).toLong
      val state = if (rnd.nextInt(10) == 0) null else s"s${rnd.nextInt(3)}"
      (k, state, new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), i.toLong)
    }.toDF("k", "state", "t", "id")
    val hist = TimeSeries.scd2History(ev, "k", "state", "t", "id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    val firstEvent = ev.groupBy(col("k")).agg(min(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    hist.groupBy(_._1).foreach { case (k, runs) =>
      val sorted = runs.toSeq.sortBy(_._3.getTime)
      assert(sorted.head._3 == firstEvent(k), s"key $k must start at first event")
      assert(sorted.count(_._5) == 1 && sorted.last._4.isEmpty,
        s"key $k must end with exactly one open run")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), s"key $k: valid_to must chain to next valid_from")
          assert(a._2 != b._2, s"key $k: consecutive runs must differ in state")
        case _ => ()
      }
    }
  }

  test("asofNearest forward candidate avoids the O(n²) unbounded-following frame") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:01"), 1.0)).toDF("k", "t", "v")
    val plan = TimeSeries.asofNearest(left, right, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    // both window frames must be RUNNING (unboundedpreceding..currentrow);
    // an unboundedfollowing frame re-scans to partition end per row
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      s"asofNearest plan still contains an unbounded-following frame:\n$plan")
  }
}
