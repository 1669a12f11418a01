package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality operators: column profiling and declarative constraint
  * checking — the Deequ/"expectations" capability a 100 TB ingest
  * pipeline runs before (and after) every load. Both are single-pass
  * by construction: every metric for every column/rule is computed in
  * ONE aggregation over the relation, then pivoted to one row per
  * column/rule driver-side (the aggregate row is tiny by construction).
  *
  * No eel counterpart — eel predates the data-quality-gate pattern;
  * the closest reference surface is SchemaInferrer's type rules
  * (reference: eel-core .../component/csv/CsvSource.scala schema
  * inference), which validate structure, not content.
  */
object Quality {

  /** Generic column profile: one row per profiled column with
    * null/distinct/min/max/length statistics. Extrema are computed on
    * the NATIVE column type (integer columns get numeric extrema, not
    * lexicographic) and cast to string only for the unified output
    * shape — profile double columns with [[profileNumeric]] instead,
    * double→string formatting is not portable across engines.
    *
    * Scale shape: ONE aggregation pass. The 100 TB default estimates
    * distinct counts with `approx_count_distinct` (a mergeable HLL
    * partial aggregate — no plan expansion); `exactDistinct = true`
    * opts into exact `count(distinct)`, whose multi-distinct plan
    * expands the scan `m`× map-side (Spark's Expand) — affordable on
    * gate-scale relations, not on a corpus. Either way only partial
    * aggregates shuffle and the output is `m` rows from a 1-row
    * aggregate — nothing corpus-sized ever reaches the driver. */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    def dist(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__n_$i"),
        (count(lit(1)) - count(col(c))).as(s"__null_$i"),
        dist(c).as(s"__dist_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"),
        round(avg(length(col(c).cast("string")).cast("long")), 6).as(s"__len_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__n_$i").as("n_nonnull"),
        col(s"__null_$i").as("n_null"), col(s"__dist_$i").as("n_distinct"),
        col(s"__min_$i").as("min_s"), col(s"__max_$i").as("max_s"),
        col(s"__len_$i").as("avg_len"))
    }
    one.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** Numeric column profile: exact decimal mean (order-free — the
    * money-sum discipline), min/max/distinct. One pass, same
    * approx-default/exact-opt-in distinct contract as [[profile]]. */
  def profileNumeric(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileNumeric requires at least one column")
    def dist(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__n_$i"),
        dist(c).as(s"__dist_$i"),
        min(col(c)).cast("double").as(s"__min_$i"),
        max(col(c)).cast("double").as(s"__max_$i"),
        // exact decimal sum → double ÷ count → 6dp: partition-order-free
        round(sum(col(c).cast(DecimalType(18, 6))).cast("double") / count(col(c)), 6)
          .as(s"__mean_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__n_$i").as("n_nonnull"),
        col(s"__dist_$i").as("n_distinct"), col(s"__min_$i").as("min_v"),
        col(s"__max_$i").as("max_v"), col(s"__mean_$i").as("mean_v"))
    }
    one.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** Declarative row-level constraint suite: each rule is a boolean
    * Column; the result is one row per rule with its violation count
    * against the relation's row count. ALL rules are evaluated in ONE
    * scan (a `sum(CASE)` per rule inside a single aggregate) — adding
    * a rule costs a map-side expression, never another pass. */
  def checkConstraints(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints requires at least one rule")
    // violation = NOT (pred IS TRUE): a NULL rule result counts as a
    // violation (the row failed to positively satisfy the constraint).
    // Internal columns are indexed by rule POSITION (rule names may
    // contain dots/backticks — they appear only as literals), and the
    // sums are coalesced so an empty relation reports 0 violations /
    // passed = true rather than NULL.
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L)).as(s"__v_$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"),
        col("__total").as("n_rows"))
    }
    one.select(explode(array(stacked: _*)).as("__p"))
      .select(col("__p.*"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Named row-level rule constructors — the Deequ-style declarative
    * vocabulary over [[checkConstraints]]'s (name, Column) pairs. Each
    * is a plain boolean Column, so composed suites still evaluate in
    * ONE scan. */
  object Rules {
    def notNull(c: String): (String, Column) =
      s"not_null($c)" -> col(c).isNotNull
    def inRange(c: String, lo: Double, hi: Double): (String, Column) =
      s"in_range($c)" -> (col(c) >= lo && col(c) <= hi)
    def inSet(c: String, values: Seq[String]): (String, Column) =
      s"in_set($c)" -> col(c).isin(values: _*)
    def matches(c: String, regex: String): (String, Column) =
      s"matches($c)" -> col(c).rlike(regex)
    def nonNegative(c: String): (String, Column) =
      s"non_negative($c)" -> (col(c) >= 0)
  }

  /** Key-uniqueness rule as the (rule, n_violations, n_rows, passed)
    * row shape: a violation is every row BEYOND the first of its key
    * group (so n_violations = rows − distinct keys — 0 iff the key is
    * unique). One partial-agg'd groupBy on the key columns; the
    * shuffle carries (key, count) pairs only. Like [[referentialCheck]]
    * this genuinely needs its own exchange, so it is a separate
    * relation unioned onto [[checkConstraints]]'s single-scan output. */
  def uniqueCheck(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "uniqueCheck requires at least one key column")
    val dup = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
    val tot = df.agg(count(lit(1)).as("n_rows"))
    dup.crossJoin(tot).select(lit(name).as("rule"), col("n_violations"),
      col("n_rows"), (col("n_violations") === 0L).as("passed"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns from ONE
    * scan: every moment (Σx, Σx², Σxy) is an EXACT decimal sum (the
    * money-sum discipline — order-free under any partitioning), and
    * the r formula is then a fixed IEEE expression over those exact
    * moments, so the result is bit-deterministic across engines and
    * reruns. m columns cost m(m+1)/2 map-side products in the single
    * aggregate — no shuffle beyond the 1-row partial agg, nothing
    * corpus-sized anywhere. Output: (col_a, col_b, corr) for a < b,
    * corr rounded 6dp (NULL when a column is constant). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix requires at least two columns")
    // positional (__s_$i) aliases, never raw column names, and backtick-
    // quoted input references — names with dots would otherwise parse as
    // nested-field access (same hazard profile/checkConstraints guard)
    def d(c: String): Column =
      col("`" + c.replace("`", "``") + "`").cast(DecimalType(18, 6))
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (i, j)
    val aggs =
      count(lit(1)).as("__n") +:
      (cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(d(c)).cast("double").as(s"__s_$i"),
          sum(d(c) * d(c)).cast("double").as(s"__ss_$i"))
      } ++ pairs.zipWithIndex.map { case ((i, j), k) =>
        sum(d(cols(i)) * d(cols(j))).cast("double").as(s"__sp_$k")
      })
    val one = df.agg(aggs.head, aggs.tail: _*)
    val n = col("__n").cast("double")
    val stacked = pairs.zipWithIndex.map { case ((i, j), k) =>
      val cov = n * col(s"__sp_$k") - col(s"__s_$i") * col(s"__s_$j")
      val va = n * col(s"__ss_$i") - col(s"__s_$i") * col(s"__s_$i")
      val vb = n * col(s"__ss_$j") - col(s"__s_$j") * col(s"__s_$j")
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("corr"))
    }
    one.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** Fixed-width numeric histogram: one tiny global min/max aggregate
    * (broadcast as a 1-row scalar — the sanctioned q22/importance
    * pattern), then a map-side bin expression + partial-agg'd count —
    * two scans, zero corpus-sized shuffles. The bin expression is a
    * fixed IEEE tree ((x−mn)·bins/(mx−mn), floored, clamped), so bin
    * assignment is bit-deterministic across engines; the max value
    * lands exactly on `bins` and clamps to the last bin.
    * Output: (bin, bin_lo, bin_hi, cnt), edges rounded 6dp. */
  def histogramNumeric(df: DataFrame, c: String, bins: Int = 16): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val stats = df.agg(min(col(c).cast("double")).as("__mn"),
      max(col(c).cast("double")).as("__mx"))
    val binned = df.filter(col(c).isNotNull).crossJoin(broadcast(stats))
      .select(
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            floor((col(c).cast("double") - col("__mn")) * lit(bins) /
              (col("__mx") - col("__mn"))).cast("long"),
            lit(bins - 1L))).as("bin"))
    binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(stats))
      .select(col("bin"),
        round(col("__mn") + col("bin").cast("double") * (col("__mx") - col("__mn"))
          / lit(bins.toDouble), 6).as("bin_lo"),
        round(col("__mn") + (col("bin") + 1).cast("double") * (col("__mx") - col("__mn"))
          / lit(bins.toDouble), 6).as("bin_hi"),
        col("cnt"))
  }

  /** Numeric data-drift report between two loads (yesterday vs today,
    * train vs serve): per profiled column the count/mean/distinct/range
    * movement, from ONE [[profileNumeric]] pass per side joined on the
    * (tiny, m-row) profile outputs. `mean_shift` subtracts the rounded
    * profile means (deterministic on both engines); `distinct_ratio`
    * is after/before; `range_widened` flags new extremes — the cheap
    * "did the distribution move" gate before any expensive divergence
    * test. */
  def profileDrift(before: DataFrame, after: DataFrame, cols: Seq[String],
                   exactDistinct: Boolean = false): DataFrame =
    driftFromProfiles(profileNumeric(before, cols, exactDistinct),
      profileNumeric(after, cols, exactDistinct))

  /** The compare half of [[profileDrift]], over two ALREADY-COMPUTED
    * [[profileNumeric]] relations — so a fixed baseline profile can be
    * computed once and compared against many loads (the per-micro-batch
    * shape of [[graft.streaming.StreamOps.profileDriftStream]]: the
    * baseline corpus is scanned once, ever, not once per batch). Both
    * inputs are m-row profile relations — the join is driver-trivial. */
  def driftFromProfiles(beforeProfile: DataFrame, afterProfile: DataFrame): DataFrame = {
    val b = beforeProfile.select(
      col("col_name"), col("n_nonnull").as("n_before"),
      col("n_distinct").as("dist_before"), col("min_v").as("min_before"),
      col("max_v").as("max_before"), col("mean_v").as("mean_before"))
    val a = afterProfile.select(
      col("col_name"), col("n_nonnull").as("n_after"),
      col("n_distinct").as("dist_after"), col("min_v").as("min_after"),
      col("max_v").as("max_after"), col("mean_v").as("mean_after"))
    b.join(a, "col_name").select(
      col("col_name"), col("n_before"), col("n_after"),
      col("mean_before"), col("mean_after"),
      round(col("mean_after") - col("mean_before"), 6).as("mean_shift"),
      round(col("dist_after") / col("dist_before"), 6).as("distinct_ratio"),
      (col("min_after") < col("min_before") || col("max_after") > col("max_before"))
        .as("range_widened"))
  }

  /** Content-composition profile of a document set — the batch half
    * of the script/PII monitor (the incident it exists for: a crawl
    * source flipping to mojibake, or starting to leak card-bearing
    * pages — both show up as composition shifts long before any
    * per-doc gate fires). One row per metric: the per-script
    * dominant-doc counts ([[graft.functions.TextFunctions.scriptCounts]]
    * incl. the all-empty 'none' bucket) and PII incidence (docs with
    * ≥1 email / phone / IP / Luhn-VALID card —
    * [[graft.functions.PiiFunctions]]; the checksum, not a regex
    * guess).
    *
    * Scale shape: the per-doc structs are codegen'd map-side
    * expressions; everything aggregates in ONE partial-agg'd pass to
    * a 1-row conditional-count aggregate, stacked to metric rows
    * driver-trivially (the [[profile]] recipe). Counts are exact
    * integers; rate is one integer-derived division, round 6.
    * Output: (metric, n_docs, n_hit, rate). */
  def contentProfile(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val scripts = graft.functions.TextFunctions.scriptRanges.map(_._1) :+ "none"
    val base = docs.select(
      graft.functions.TextFunctions.scriptCounts(t).getField("main_script").as("__script"),
      graft.functions.PiiFunctions.piiStruct(t).as("__pii"),
      (graft.functions.PiiFunctions.cardStruct(t).getField("n_valid") > 0).as("__card"))
    val hits: Seq[(String, Column)] =
      scripts.map(s => s"script:$s" -> (col("__script") === s)) ++ Seq(
        "pii:email" -> (col("__pii.n_emails") > 0),
        "pii:phone" -> (col("__pii.n_phones") > 0),
        "pii:ip" -> (col("__pii.n_ips") > 0),
        "pii:card_valid" -> col("__card"))
    val aggs = count(lit(1)).as("__n") +: hits.zipWithIndex.map { case ((_, p), i) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__h_$i") }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stacked = hits.zipWithIndex.map { case ((m, _), i) =>
      struct(lit(m).as("metric"), col("__n").as("n_docs"),
        col(s"__h_$i").as("n_hit"),
        round(col(s"__h_$i").cast("double") / col("__n"), 6).as("rate"))
    }
    one.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** The compare half of the content monitor, over two ALREADY-COMPUTED
    * [[contentProfile]] relations (the [[driftFromProfiles]] contract:
    * a fixed baseline profile is computed once, ever, and compared
    * against many batches — both sides are metric-count rows, the join
    * is driver-trivial). rate_shift subtracts the round-6 rates —
    * deterministic on every engine. */
  def contentDriftFromProfiles(baselineProfile: DataFrame,
                               batchProfile: DataFrame): DataFrame = {
    val b = baselineProfile.select(col("metric"),
      col("n_docs").as("n_docs_base"), col("n_hit").as("n_hit_base"),
      col("rate").as("rate_base"))
    val a = batchProfile.select(col("metric"),
      col("n_docs").as("n_docs_batch"), col("n_hit").as("n_hit_batch"),
      col("rate").as("rate_batch"))
    b.join(a, "metric").select(
      col("metric"), col("n_docs_base"), col("n_hit_base"), col("rate_base"),
      col("n_docs_batch"), col("n_hit_batch"), col("rate_batch"),
      round(col("rate_batch") - col("rate_base"), 6).as("rate_shift"))
  }

  /** Schema-drift report between two relations (yesterday's load vs
    * today's): one row per column that was added, removed, or changed
    * type/nullability — the ingest-gate companion to
    * [[checkConstraints]]. Pure schema metadata — no scan, no job;
    * the result is a tiny driver-built relation. */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.schema.map(f => f.name -> f).toMap
    val a = after.schema.map(f => f.name -> f).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.sorted.map { c =>
        (c, "removed", b(c).dataType.simpleString, null: String) } ++
      (a.keySet -- b.keySet).toSeq.sorted.map { c =>
        (c, "added", null: String, a(c).dataType.simpleString) } ++
      (b.keySet & a.keySet).toSeq.sorted.flatMap { c =>
        if (b(c).dataType != a(c).dataType)
          Some((c, "type_changed", b(c).dataType.simpleString, a(c).dataType.simpleString))
        else if (b(c).nullable != a(c).nullable)
          Some((c, "nullability_changed",
            s"nullable=${b(c).nullable}", s"nullable=${a(c).nullable}"))
        else None
      }
    import before.sparkSession.implicits._
    rows.toDF("col_name", "status", "before", "after")
  }

  /** Referential-integrity rule as the same (rule, n_violations,
    * n_rows, passed) row shape: child keys with no parent. The anti
    * join ships only the key columns of both sides into the exchange;
    * at 100 TB this is the one rule that genuinely needs a shuffle, so
    * it is a separate relation unioned onto [[checkConstraints]]'s
    * single-scan output. */
  /** Embedding-space drift between two snapshots — the vector-space
    * member of the drift family (profileDrift covers scalar columns):
    * detects embedding-model version skew or corpus shift before an
    * ANN index rebuild is attempted. Metrics:
    *   - centroid_cosine: cosine between the per-dimension SUM vectors
    *     (scale-invariant, so sums stand in for means with no division
    *     — and the sums are exact: each element cast to DECIMAL(18,6),
    *     summed order-free, products in (18,6)×(18,6) = (37,12), the
    *     quality_correlation recipe)
    *   - mean_sq_norm per side: spread movement (per-row |x|² is a
    *     deterministic sequential double fold, then the decimal-sum
    *     mean recipe)
    * One explode + per-dim partial agg per side (dim rows out of each
    * map task), a dim-row join, and three 1-row scalar broadcasts —
    * nothing row-count-sized ever shuffles.
    *
    * Cast-boundary safety (the text_bm25 measurement discipline,
    * ADVICE r10): the per-row casts below round arbitrary
    * float-derived doubles at 6dp, the class where Spark (HALF_UP on
    * the shortest-repr string, error < 5.5e-17 from the double) and
    * DuckDB (the binary value) can disagree — but only for a value
    * within repr-error of a .xxxxxx5 boundary. Measured exactly
    * (decimal module, exact binary expansions) over every embedding
    * element and every |x|² fold at sf0.001/0.01/0.1: min element
    * boundary distance 5.96e-13 / 3.05e-11 / 4.29e-12 (≥4 orders
    * above repr error), min fold distance ≥2.6e-7 (10 orders), and
    * the two rounding paths agree on all 192k elements + 5k folds —
    * zero mismatches. Recorded in SURVEY §7 (r11). */
  /** Per-dimension decimal sums — one half of [[embeddingDrift]]'s
    * evidence, package-visible so the persisted-IVF maintenance policy
    * can snapshot it at build time ([[Similarity.ivfMaintenanceDecision]]):
    * the centroid-cosine between the build-time sums and the current
    * store's sums is the drift signal, without persisting any vectors. */
  private[graft] def driftDimSums(df: DataFrame, vecCol: String, tag: String): DataFrame = df
    .select(posexplode(col(vecCol)).as(Seq("__i", "__v")))
    .groupBy(col("__i"))
    .agg(sum(col("__v").cast("decimal(18,6)")).cast("decimal(18,6)").as(s"__s$tag"))

  /** (count, Σ|x|² as decimal) — the norm half of the drift evidence. */
  private[graft] def driftScalarStats(df: DataFrame, vecCol: String, tag: String): DataFrame = df
    .select(aggregate(col(vecCol).cast("array<double>"), lit(0.0d),
      (a, x) => a + x * x).cast("decimal(18,6)").as("__q"))
    .agg(count(lit(1)).as(s"n_$tag"), sum(col("__q")).as(s"__qs$tag"))

  def embeddingDrift(base: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    def dimSums(df: DataFrame, tag: String) = driftDimSums(df, vecCol, tag)
    def scalarStats(df: DataFrame, tag: String) = driftScalarStats(df, vecCol, tag)
    val cosRow = dimSums(base, "b").join(dimSums(cur, "c"), "__i")
      .agg(sum(col("__sb") * col("__sc")).as("__dot"),
        sum(col("__sb") * col("__sb")).as("__nb"),
        sum(col("__sc") * col("__sc")).as("__nc"))
      .select(round(col("__dot").cast("double") /
        (sqrt(col("__nb").cast("double")) * sqrt(col("__nc").cast("double"))), 6)
        .as("centroid_cosine"))
    scalarStats(base, "base").crossJoin(broadcast(scalarStats(cur, "cur")))
      .crossJoin(broadcast(cosRow))
      .select(col("n_base"), col("n_cur"),
        round(col("__qsbase").cast("double") / col("n_base"), 6).as("mean_sq_norm_base"),
        round(col("__qscur").cast("double") / col("n_cur"), 6).as("mean_sq_norm_cur"),
        col("centroid_cosine"))
  }

  def referentialCheck(name: String, child: DataFrame, childKey: String,
                       parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    val v = orphans.agg(count(lit(1)).as("n_violations"))
    val tot = child.agg(count(lit(1)).as("n_rows"))
    v.crossJoin(tot).select(lit(name).as("rule"), col("n_violations"),
      col("n_rows"), (col("n_violations") === 0L).as("passed"))
  }
}
