package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators (batch forms; streaming variants in
  * graft.streaming). All partition by the entity key — per-key sorted
  * windows, never a global sort, so they scale linearly with
  * executors.
  */
object TimeSeries {

  /** Tumbling-window aggregation: count/sum per (window, group). */
  def tumblingAgg(events: DataFrame, tsCol: String, widthMinutes: Int,
                  groupCols: Seq[String]): DataFrame = {
    // cast("double") keeps microsecond fraction (unix_timestamp truncates)
    val bucket = (floor(col(tsCol).cast("double") / (widthMinutes * 60)) * (widthMinutes * 60))
      .cast("timestamp").as("window_start")
    events.groupBy(bucket +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        // decimal accumulation: order-independent, oracle-stable
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapMinutes`. Emits each
    * event with its session ordinal (1-based per key). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val gap = col(tsCol).cast("double") - lag(col(tsCol), 1).over(byKey).cast("double")
    val isNew = when(gap.isNull || gap > gapMinutes * 60, 1).otherwise(0)
    events
      .withColumn("session_seq",
        sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** As-of join: for each left row, the most recent right row with
    * `rightTs <= leftTs` within the same key, optionally within
    * `toleranceSeconds` (older matches are nulled out, like pandas
    * merge_asof / kdb aj with a window).
    *
    * Physical shape: union both sides tagged, one window pass
    * partitioned by key ordered by (ts, side) carrying the right
    * side's payload forward with last(ignoreNulls) — a single shuffle
    * on the key, no per-row probing, no range-join explosion.
    *
    * Why not a custom SparkPlan: a dedicated AsOfJoinExec would also
    * have to co-partition both sides by key and sort by ts — the exact
    * exchange+sort this plan already produces; the only delta is the
    * window operator's state vs a hand-rolled merge, which is not the
    * bottleneck. Composition wins (see SparkEntry plan checks).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val carryLeft = left.columns.filterNot(c => c == keyCol || c == leftTs).toSeq
    val lhs = left.select(
      col(keyCol).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (carryLeft.map(col) ++
          payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rhs = right.select(
      col(keyCol).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(col)): _*)
    // Deterministic tie-break: two right rows with identical (key, ts)
    // would otherwise leave last() picking a partition-order-dependent
    // winner — guaranteed to occur at scale. xxhash64 over the payload
    // makes the winner a pure function of row content (greatest hash
    // wins), identical across engines, partitionings and reruns. Left
    // rows get a constant: their relative order among themselves never
    // affects the frame they see (all right rows with ts <= theirs
    // sort before them via __side).
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ts+payloads as ONE struct so a matched row whose payload is
    // legitimately NULL yields null (a bare last(payload, ignoreNulls)
    // would skip past it to an older row's value)
    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("__mts") +: payloadCols.map(col): _*))
    val carried = lhs.unionByName(rhs)
      .withColumn("__tb",
        when(col("__side") === 0, xxhash64(payloadCols.map(col): _*)).otherwise(lit(0L)))
      .withColumn("__m", last(rightStruct, ignoreNulls = true).over(w))
    val extracted = payloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__m")(c))
    }.withColumn("__match_ts", col("__m")("__mts"))
    val tolApplied = toleranceSeconds.fold(extracted) { tol =>
      val stale = col("__match_ts").isNull ||
        (col("__ts").cast("double") - col("__match_ts").cast("double")) > tol
      payloadCols.foldLeft(extracted) { (df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
      }
    }
    tolApplied.filter(col("__side") === 1)
      .withColumnRenamed("__key", keyCol).withColumnRenamed("__ts", leftTs)
      .drop("__side", "__match_ts", "__m", "__tb")
  }

  /** Ordered conversion funnel: how many users reached each stage IN
    * ORDER — stage i counts users with an event of type stages(i)
    * strictly after their stage-(i-1) entry time (first-touch
    * attribution), optionally within `withinSeconds` of it (the
    * conversion window — without one, any sufficiently long event
    * history trivially completes every funnel). Window arithmetic is
    * integer epoch-microseconds, so the stage sets are engine-exact.
    *
    * Physical shape: one filtered groupBy per stage, each joined to
    * the (small, shrinking) reached-set of the previous stage — every
    * shuffle is keyed on the user and carries (user, ts) only. The
    * per-stage aggregates reuse the same hash partitioning, and the
    * final counts are single-row aggregates unioned together. No
    * windows over the full event stream, no collect.
    * Output: (stage_idx, stage, n_users), one row per stage. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = stages.tail.foldLeft(List(stages.head -> first)) { case (acc, st) =>
      val prev = acc.head._2
      val inWindow = withinSeconds.fold(lit(true)) { w =>
        unix_micros(col(tsCol)) - unix_micros(col("__pt")) <= w * 1000000L
      }
      val nxt = events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("__t").as("__pt")), userCol)
        .filter(col(tsCol) > col("__pt") && inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      (st -> nxt) :: acc
    }.reverse
    reached.zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by their first active period
    * (cohort), counted in every later period they were active. Filter
    * the event stream first to define "active" (e.g. purchases only).
    * Period ids are epoch-microsecond integer divisions — all-integer
    * arithmetic, so the matrix is engine-exact and stable under
    * repartitioning.
    *
    * Physical shape: distinct (user, period) — one shuffle on the
    * user — then the per-user min-period cohort aggregate reuses that
    * partitioning, and the final (cohort, offset) count is an
    * aggregate over the already-small active-periods relation.
    * Output: (cohort_week, week_offset, n_users). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodDays: Int = 7): DataFrame = {
    val periodUs = periodDays.toLong * 86400L * 1000000L
    val uw = events
      .select(col(userCol).as("__u"), expr(s"unix_micros($tsCol) div $periodUs").as("__w"))
      .distinct()
    val cohort = uw.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    uw.join(cohort, "__u")
      .groupBy(col("__cw").as("cohort_week"), (col("__w") - col("__cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Activity-spike detection: each user's daily event counts z-scored
    * against that user's own mean/std across their active days; emits
    * the (user, day) cells with |z| > `zThreshold`. Users with fewer
    * than `minPeriods` active days or zero variance are skipped (their
    * z is undefined).
    *
    * Engine-exact by construction: daily counts, n, Σc and Σc² are
    * integers (no float accumulation anywhere), so mean and variance
    * derive from EXACT integer moments — z = (c·n − Σc) / (n·√((n·Σc²
    * − (Σc)²)/n²)) is a fixed chain of correctly-rounded double ops on
    * identical inputs, hence bit-identical across engines and
    * partitionings; only the emitted z is rounded (6dp).
    *
    * Scale shape: one partial-aggregated groupBy on (user, day), one
    * on user (3 longs per user), then a join back on user — AQE
    * broadcasts the per-user stats when they fit; no windows, no
    * global sort. */
  /** Event-type transition matrix (first-order Markov counts): each
    * consecutive (from → to) pair in every user's event sequence,
    * counted corpus-wide. The per-user order is (ts, event id) — the
    * id tie-break makes same-timestamp neighbors deterministic under
    * any partitioning (the evt_asof lesson).
    *
    * Scale shape: ONE window partitioned by user (each user's slice
    * sorts independently — no global sort), then a partial-agg
    * groupBy on the (from, to) pair, whose cardinality is
    * |event types|² regardless of corpus size.
    * Output: (from_type, to_type, n_transitions). */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Top-k user journeys: each user's first `pathLen` event types
    * ((ts, id)-ordered), concatenated into a path, counted corpus-wide,
    * top k paths returned — the product-analytics "common flows" view.
    *
    * Scale shape: ONE window partitioned by user (row_number + filter
    * rn ≤ pathLen — each user's slice sorts independently), the
    * per-user path built by sorting ≤pathLen structs inside the group
    * aggregate (the dedup_lines reconstruction pattern), then a
    * path-keyed partial-agg count; the global top-k is a limit (Spark
    * executes it as partial top-k + single reduce, never a full sort).
    * Output: (path, n_users), ranked (n_users desc, path asc). */
  def topPaths(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
               idCol: String, pathLen: Int = 5, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val firstN = events.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
    val paths = firstN.groupBy(col(userCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn").as("r"), col(typeCol).as("t")))),
        e => e.getField("t")), ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Conversion-lag histogram: time from each user's FIRST `fromType`
    * event to their first `toType` event strictly after it, bucketed
    * by `bucketSeconds`. All arithmetic is integer epoch-microseconds
    * (first-touch min, strict > filter, integer division) — the
    * histogram is engine-exact.
    *
    * Scale shape: two filtered partial-agg groupBys keyed on the user
    * (shuffles carry (user, ts) only), one join on the user, then an
    * aggregate over |buckets| rows. No windows, no global sort.
    * Output: (lag_bucket, n_users). */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String, toType: String,
                    bucketSeconds: Long = 3600L): DataFrame = {
    val starts = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(unix_micros(col(tsCol))).as("__t0"))
    val firstConv = events.filter(col(typeCol) === toType)
      .select(col(userCol), unix_micros(col(tsCol)).as("__t1"))
      .join(starts, userCol)
      .filter(col("__t1") > col("__t0"))
      .groupBy(col(userCol), col("__t0")).agg(min(col("__t1")).as("__t1"))
    firstConv
      .select(expr(s"(__t1 - __t0) div ${bucketSeconds * 1000000L}").as("lag_bucket"))
      .groupBy(col("lag_bucket")).agg(count(lit(1)).as("n_users"))
  }

  def activityAnomaly(events: DataFrame, userCol: String, tsCol: String,
                      minPeriods: Int = 3, zThreshold: Double = 2.0,
                      periodDays: Int = 1): DataFrame = {
    val periodUs = periodDays.toLong * 86400L * 1000000L
    val daily = events
      .select(col(userCol), expr(s"unix_micros($tsCol) div $periodUs").as("day"))
      .groupBy(col(userCol), col("day")).agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col(userCol)).agg(
      count(lit(1)).as("__n"), sum(col("n_events")).as("__s"),
      sum(col("n_events") * col("n_events")).as("__ssq"))
    val z = (col("n_events") * col("__n") - col("__s")).cast("double") /
      (col("__n").cast("double") *
        sqrt((col("__n") * col("__ssq") - col("__s") * col("__s")).cast("double") /
          (col("__n") * col("__n")).cast("double")))
    daily.join(stats, userCol)
      .filter(col("__n") >= minPeriods &&
        col("__n") * col("__ssq") - col("__s") * col("__s") > 0)
      .withColumn("__z", z)
      .filter(abs(col("__z")) > zThreshold)
      .select(col(userCol), col("day"), col("n_events"), round(col("__z"), 6).as("z"))
  }

  /** Cohort lifetime value: users grouped by first-activity period,
    * revenue accumulated per (cohort, period-offset) cell. Metrics are
    * exact decimal sums; the running total is a window over the
    * ALREADY-AGGREGATED (cohort × offset) relation — cohorts² cells,
    * not events — ordered by the integer offset, so the cumsum is
    * order-free and engine-exact. Same integer epoch-µs periods as
    * [[retention]].
    * Output: (cohort_period, period_offset, n_users, revenue, cum_revenue). */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String, periodDays: Int = 7): DataFrame = {
    val periodUs = periodDays.toLong * 86400L * 1000000L
    val ue = events.select(col(userCol).as("__u"),
      expr(s"unix_micros($tsCol) div $periodUs").as("__p"),
      col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("__v"))
    val cohort = ue.groupBy(col("__u")).agg(min(col("__p")).as("__cw"))
    val cells = ue.join(cohort, "__u")
      .groupBy(col("__cw").as("cohort_period"), (col("__p") - col("__cw")).as("period_offset"))
      .agg(countDistinct(col("__u")).as("n_users"), sum(col("__v")).as("__rev"))
    val w = Window.partitionBy(col("cohort_period")).orderBy(col("period_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.select(col("cohort_period"), col("period_offset"), col("n_users"),
      round(col("__rev"), 2).cast("double").as("revenue"),
      round(sum(col("__rev")).over(w), 2).cast("double").as("cum_revenue"))
  }

  /** RFM (recency / frequency / monetary) user segmentation. One
    * partial-agg'd groupBy(user) builds the three exact metrics
    * (integer last-activity µs, integer count, exact decimal sum),
    * then three ntile(5) windows rank them — each ORDER BY ends in
    * the user id, so quintile boundaries cannot flip under
    * repartitioning (the evt_asof tie lesson). Windows are
    * un-partitioned (a global sort of ONE ROW PER USER — the already-
    * aggregated relation, not the event stream; at 1B users that is a
    * sort of 1B short rows, the standard price of exact quantile
    * ranks).
    * Output: (user, recency_us, frequency, monetary, r/f/m quintiles). */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String, buckets: Int = 5): DataFrame = {
    val m = events.groupBy(col(userCol))
      .agg(max(expr(s"unix_micros($tsCol)")).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("__mon"))
    val u = col(userCol)
    m.select(u, col("last_us"), col("frequency"),
        round(col("__mon"), 2).cast("double").as("monetary"),
        ntile(buckets).over(Window.orderBy(col("last_us"), u)).as("r_quintile"),
        ntile(buckets).over(Window.orderBy(col("frequency"), u)).as("f_quintile"),
        ntile(buckets).over(Window.orderBy(col("__mon"), u)).as("m_quintile"))
  }

  /** Daily actives + trailing `windowDays`-day actives. Spark has no
    * COUNT(DISTINCT) OVER a range window, and a per-day self-join is
    * O(days²) scans — instead every distinct (user, day) cell fans out
    * to ≤ windowDays (user, window_day) rows carrying two scalars
    * (never the event payload), and both counts are plain
    * partial-agg'd groupBys. Only days with direct activity are
    * emitted (inner join), so phantom trailing windows past the corpus
    * end never appear.
    * Output: (day, dau, wau). */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    val daily = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d")).distinct()
    // ONE pass: min window-offset per (user, window_day) recovers both
    // counts — offset 0 ⇔ active that exact day (dau), any offset ⇔
    // active in the trailing window (wau). A dau ⋈ wau two-branch form
    // would scan + distinct the events twice (Spark does not reuse
    // common subplans without an explicit cache).
    daily
      .select(col("__u"), explode(expr(s"sequence(0, ${windowDays - 1})")).as("__i"), col("__d"))
      .groupBy(col("__u"), expr("date_add(__d, __i)").as("day"))
      .agg(min(col("__i")).as("__mi"))
      .groupBy(col("day"))
      .agg(sum(when(col("__mi") === 0, 1L).otherwise(0L)).as("dau"),
        count(lit(1)).as("wau"))
      .filter(col("dau") > 0) // trailing windows past the corpus end
  }

  /** Period-over-period churn: users active in period p with no
    * activity in p+1. Periods are integer epoch-µs divisions (same
    * origin-free arithmetic as [[retention]] — engine-exact, no
    * calendar-week-start semantics). One distinct (user, period)
    * relation anti-joined against its own shifted self — shuffles
    * carry (user, long) pairs only, partial-agg'd counts after. The
    * corpus' final period reports full churn by construction (p+1
    * doesn't exist); callers drop it if unwanted.
    * Output: (period, active, churned, churn_rate 6dp). */
  def churn(events: DataFrame, userCol: String, tsCol: String,
            periodDays: Int = 7): DataFrame = {
    val periodUs = periodDays.toLong * 86400L * 1000000L
    val um = events
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol) div $periodUs").as("__p"))
      .distinct()
    // churned at p ⇔ the user's NEXT active period isn't p+1 — a
    // per-user lead window over the distinct relation (each user's
    // slice sorts independently), not an anti-join against a second
    // scan+distinct of the events
    val w = Window.partitionBy(col("__u")).orderBy(col("__p"))
    um.withColumn("__churned",
        when(lead(col("__p"), 1).over(w) === col("__p") + 1, 0L).otherwise(1L))
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("active"), sum(col("__churned")).as("churned"))
      .select(col("__p").as("period"), col("active"), col("churned"),
        round(col("churned").cast("double") / col("active"), 6).as("churn_rate"))
  }

  /** Per-segment activity trend: ordinary-least-squares slope of the
    * daily event count over time, per `segCol` (event type, cohort,
    * source…) — the growth/decay detector behind "is this segment
    * trending". The OLS moments (n, Σt, Σy, Σty, Σt²) are EXACT
    * integer sums over the already-aggregated (segment × day) counts,
    * and the slope's numerator n·Σty − Σt·Σy / denominator
    * n·Σt² − (Σt)² are exact BIGINT cross-multiplications — the only
    * float op is the final division, a single correctly-rounded op on
    * identical integers in any engine (rounded 6dp). Days are
    * re-based to the segment's own first day so the integer products
    * stay small (t < corpus days, y < segment daily events:
    * n·Σty ≲ days²·events — far inside 2^63 at any corpus age).
    *
    * Scale shape: one partial-agg'd (segment, day) count, one
    * partial-agg'd per-segment moments fold — two map-combined
    * shuffles carrying integers; no window, no sort, no collect.
    * Output: (segCol, n_days, total, slope_num, slope_den, slope). */
  def activityTrend(events: DataFrame, segCol: String, tsCol: String,
                    periodDays: Int = 1): DataFrame = {
    val periodUs = periodDays.toLong * 86400L * 1000000L
    val daily = events
      .select(col(segCol), expr(s"unix_micros($tsCol) div $periodUs").as("__d"))
      .groupBy(col(segCol), col("__d")).agg(count(lit(1)).as("__y"))
    val based = daily
      .groupBy(col(segCol)).agg(min(col("__d")).as("__d0"))
      .join(daily, segCol)
      .select(col(segCol), (col("__d") - col("__d0")).as("__t"), col("__y"))
    based.groupBy(col(segCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__y")).as("total"),
        sum(col("__t")).as("__st"), sum(col("__y") * col("__t")).as("__sty"),
        sum(col("__t") * col("__t")).as("__stt"))
      .select(col(segCol), col("n_days"), col("total"),
        (col("n_days") * col("__sty") - col("__st") * col("total")).as("slope_num"),
        (col("n_days") * col("__stt") - col("__st") * col("__st")).as("slope_den"),
        round(when(col("n_days") * col("__stt") - col("__st") * col("__st") === 0L, lit(0.0))
          .otherwise((col("n_days") * col("__sty") - col("__st") * col("total")).cast("double") /
            (col("n_days") * col("__stt") - col("__st") * col("__st")).cast("double")), 6)
          .as("slope"))
  }

  /** Linear multi-touch attribution: every view in the `lookbackDays`
    * window before a purchase gets an equal share value/n of it (the
    * position-free counterpart of as-of last-touch — see
    * evt_attribution). Touches and conversions pair inside one
    * user-keyed equi-join with a bounded range predicate (per-user
    * fan-out is events-per-user × window — corpus-rate-bounded, never
    * quadratic in the corpus); the per-purchase touch count is a
    * partial-agg'd groupBy rejoined on the purchase id, NOT a
    * window over the pair relation (no sort). Credit = value/n per
    * row (IEEE-identical across engines), summed via the exact
    * decimal-sum recipe. `purchases`/`views` need (idCol, userCol,
    * tsCol[, valueCol]) columns.
    * Output: (view_hour, n_credits, revenue). */
  def multiTouchAttribution(purchases: DataFrame, views: DataFrame,
                            idCol: String, userCol: String, tsCol: String,
                            viewTsCol: String, valueCol: String,
                            lookbackDays: Int = 3): DataFrame = {
    val j = purchases.join(views, Seq(userCol))
      .filter(col(viewTsCol) <= col(tsCol) &&
        col(viewTsCol) >= col(tsCol) - expr(s"INTERVAL $lookbackDays DAYS"))
      .select(col(idCol), col(valueCol), col(viewTsCol))
    val n = j.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    j.join(n, Seq(idCol))
      .groupBy(date_trunc("hour", col(viewTsCol)).as("view_hour"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum((col(valueCol) / col("__n")).cast(DecimalType(18, 6))), 2)
          .cast("double").as("revenue"))
  }

  /** Slowly-changing-dimension type-2 history from a change stream:
    * collapse consecutive repeats of `stateCol` per key, then emit one
    * row per state RUN with its validity interval — `valid_from` = the
    * run's first event, `valid_to` = the next run's start (NULL while
    * current). The standard dimension-table build for "what was this
    * user's segment ON date X" point-in-time joins.
    *
    * Two key-partitioned windows (lag to find change points, lead on
    * the much smaller change relation for the interval end) — per-key
    * sorted, never a global sort. Ties on `tsCol` are broken by
    * `tieCol` (pass a unique id) so the history is a pure function of
    * the data at any partitioning.
    * Output: key, state, valid_from, valid_to, is_current. */
  def scd2History(events: DataFrame, keyCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    // Null-safe change detection: `__prev <=> state` treats NULL states
    // as ordinary values (NULL→NULL is a repeat, A→NULL a change), and
    // the row_number guard keeps each key's FIRST row even when its
    // state is NULL (lag's no-previous-row NULL would otherwise be
    // <=>-equal to a NULL first state and drop the run).
    val changes = events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(stateCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time dimension lookup — the query side of
    * [[scd2History]]: each probe row gets the state that was valid AT
    * its timestamp. Runs tile each key's timeline from its first
    * event, so the covering interval IS the backward as-of row on
    * `valid_from` (no valid_to predicate needed); probes before a
    * key's first run get NULL state. A thin composition over
    * [[asofJoin]] — one key exchange, the same scale shape.
    *
    * History must be unique per (key, valid_from) — [[scd2History]]
    * output is, whenever the underlying change stream has one row per
    * (key, ts); dedup simultaneous changes first otherwise. */
  def pointInTime(history: DataFrame, probes: DataFrame, keyCol: String,
                  probeTs: String): DataFrame =
    asofJoin(probes,
      history.select(col(keyCol), col("valid_from"), col("state")),
      keyCol, probeTs, "valid_from", Seq("state"))

  /** Nearest-event as-of join: each left row gets the right-side
    * payload of the CLOSEST right event for its key — backward or
    * forward, ties to backward (so an exactly-simultaneous right row
    * always wins). The backward-only variant is [[asofJoin]]; nearest
    * is the sensor-fusion/log-alignment semantic where a reading just
    * after the probe is as good as one just before.
    *
    * Same union-once shape as [[asofJoin]]: one key-partitioned sort
    * computes BOTH candidates (backward = last right row over the
    * preceding frame, forward = first over the following frame) — two
    * window frames over one exchange, never two joins. Distances
    * compare in exact integer microseconds. Right-side ties at one
    * timestamp resolve by content hash (backward frame: greatest hash
    * wins, as in [[asofJoin]]; forward frame: smallest) — deterministic
    * pure functions of row content either way.
    *
    * `toleranceSeconds` disqualifies a candidate FARTHER than the
    * budget before the nearest-pick (so a stale backward reading
    * loses to an in-budget forward one, and a row with neither in
    * budget gets NULL payload — the [[asofJoin]] tolerance semantic,
    * symmetric). */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTs: String, rightTs: String,
                  payloadCols: Seq[String],
                  toleranceSeconds: Option[Long] = None): DataFrame = {
    val carryLeft = left.columns.filterNot(c => c == keyCol || c == leftTs).toSeq
    val lhs = left.select(
      col(keyCol).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        (carryLeft.map(col) ++
          payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rhs = right.select(
      col(keyCol).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        (carryLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(col)): _*)
    // Order right rows BEFORE left rows at equal ts: a same-ts right
    // row lands in the backward frame with distance 0 and wins any tie.
    val ord = Seq(col("__ts").asc, col("__side").asc, col("__tb").asc)
    val wBack = Window.partitionBy(col("__key")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward candidate via the REVERSE-ordered running frame: a
    // first(...) over (currentRow, unboundedFollowing) would execute
    // with UnboundedFollowingWindowFunctionFrame — a rescan to
    // partition end for EVERY row, O(n²) per key. Flipping all three
    // sort keys and running last(...) over unboundedPreceding..current
    // visits the exact reversed sequence incrementally: same key
    // exchange, one extra in-partition sort, O(n log n).
    val wFwd = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").desc, col("__side").desc, col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightStruct = when(col("__side") === 0,
      struct(col("__ts").as("__mts") +: payloadCols.map(col): _*))
    val carried = lhs.unionByName(rhs)
      .withColumn("__tb",
        when(col("__side") === 0, xxhash64(payloadCols.map(col): _*)).otherwise(lit(0L)))
      .withColumn("__b", last(rightStruct, ignoreNulls = true).over(wBack))
      .withColumn("__f", last(rightStruct, ignoreNulls = true).over(wFwd))
    val dB = unix_micros(col("__ts")) - unix_micros(col("__b")("__mts"))
    val dF = unix_micros(col("__f")("__mts")) - unix_micros(col("__ts"))
    // candidate validity: present AND (no budget | within budget)
    val tolMicros = toleranceSeconds.map(_ * 1000000L)
    val bOk = col("__b").isNotNull && tolMicros.map(t => dB <= t).getOrElse(lit(true))
    val fOk = col("__f").isNotNull && tolMicros.map(t => dF <= t).getOrElse(lit(true))
    val pick = when(!bOk && !fOk, lit(null))
      .when(!fOk, col("__b"))
      .when(!bOk, col("__f"))
      .when(dB <= dF, col("__b"))
      .otherwise(col("__f"))
    val picked = carried.withColumn("__m", pick)
    val extracted = payloadCols.foldLeft(picked) { (df, c) =>
      df.withColumn(c, col("__m")(c))
    }
    extracted.filter(col("__side") === 1)
      .withColumnRenamed("__key", keyCol).withColumnRenamed("__ts", leftTs)
      .drop("__side", "__m", "__b", "__f", "__tb")
  }
}
