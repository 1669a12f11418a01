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
    * null/distinct/min/max/length statistics. Values are compared as
    * strings (exact for integer and string columns — profile numeric
    * measures with [[profileNumeric]] instead, double→string
    * formatting is not portable across engines).
    *
    * Scale shape: ONE aggregation pass; the multi-column exact
    * `count(distinct)` set expands the scan `m`× map-side (Spark's
    * Expand — the standard multi-distinct plan) but shuffles only
    * partial aggregates. Output is `m` rows from a 1-row aggregate —
    * nothing corpus-sized ever reaches the driver. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      val sc = col(c).cast("string")
      Seq(
        count(col(c)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(sc).as(s"__min_$c"),
        max(sc).as(s"__max_$c"),
        round(avg(length(sc).cast("long")), 6).as(s"__len_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n_nonnull"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"),
        col(s"__len_$c").as("avg_len"))
    }
    one.select(explode(array(stacked: _*)).as("__p")).select(col("__p.*"))
  }

  /** Numeric column profile: exact decimal mean (order-free — the
    * money-sum discipline), min/max/distinct. One pass, same Expand
    * shape as [[profile]]. */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        // exact decimal sum → double ÷ count → 6dp: partition-order-free
        round(sum(col(c).cast(DecimalType(18, 6))).cast("double") / count(col(c)), 6)
          .as(s"__mean_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n_nonnull"),
        col(s"__dist_$c").as("n_distinct"), col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"), col(s"__mean_$c").as("mean_v"))
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
    // violation (the row failed to positively satisfy the constraint)
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"__v_$name").as("n_violations"),
        col("__total").as("n_rows"))
    }
    one.select(explode(array(stacked: _*)).as("__p"))
      .select(col("__p.*"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Referential-integrity rule as the same (rule, n_violations,
    * n_rows, passed) row shape: child keys with no parent. The anti
    * join ships only the key columns of both sides into the exchange;
    * at 100 TB this is the one rule that genuinely needs a shuffle, so
    * it is a separate relation unioned onto [[checkConstraints]]'s
    * single-scan output. */
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
