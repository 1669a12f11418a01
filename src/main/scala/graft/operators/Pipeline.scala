package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Corpus-preparation operators a training-data pipeline needs beyond
  * dedup/similarity: benchmark-contamination checks, deterministic
  * corpus splits, and keep-best-in-cluster selection.
  *
  * Scale notes (100 TB corpus):
  *   - contamination: the benchmark side is an eval suite — fixed size
  *     (≤ ~1e7 distinct n-grams even for large suites), so it is
  *     broadcast and the corpus side is never shuffled at all: shingle
  *     → explode → broadcast-semi-join → partial-aggregated count per
  *     doc. With `hashGrams` the join keys are 8-byte longs, never
  *     shingle text. For a benchmark too large to broadcast, drop the
  *     hint and AQE falls back to a shuffle join on the gram hash.
  *   - hashSplit: pure per-row arithmetic on the id — no shuffle, no
  *     state, stable under reruns/repartitioning (splits must not move
  *     when the corpus is re-read with different parallelism).
  *   - keepBest: one shuffle on the cluster key; duplicate clusters
  *     are small by construction (they are copies of one document), so
  *     the per-partition window never holds more than a cluster.
  */
object Pipeline {

  /** Benchmark-contamination check: for each corpus document, the
    * number (and fraction) of its distinct word-k-grams that appear
    * anywhere in the benchmark set — the standard train/test overlap
    * screen applied before training.
    *
    * Returns (idCol, n_shared, contam_ratio) for contaminated docs
    * only (n_shared >= 1). `hashGrams=true` (production) joins on
    * xxhash64 of the gram so the broadcast/build side and any
    * fallback shuffle carry longs, not text; `hashGrams=false` keeps
    * the gram string (used by the gate so the DuckDB oracle can
    * rebuild the identical sets).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int = 3,
                    hashGrams: Boolean = true): DataFrame = {
    def gram(c: Column): Column = if (hashGrams) xxhash64(c) else c
    val bench = benchmark
      .select(explode(array_distinct(T.shingles(col(textCol), k))).as("__gstr"))
      .select(gram(col("__gstr")).as("__g"))
      .distinct()
    corpus
      .select(col(idCol), array_distinct(T.shingles(col(textCol), k)).as("__gs"))
      .select(col(idCol), size(col("__gs")).as("__n_grams"), explode(col("__gs")).as("__gstr"))
      .select(col(idCol), col("__n_grams"), gram(col("__gstr")).as("__g"))
      .join(broadcast(bench), "__g")
      .groupBy(col(idCol), col("__n_grams"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shared"),
        round(col("n_shared").cast("double") / col("__n_grams"), 6).as("contam_ratio"))
  }

  /** Deterministic hash-based corpus split (train/val/test). The
    * bucket is derived from md5 of the id + seed, so the assignment is
    * stable across reruns, row order, partitioning, and engines —
    * the property a split must have so no document migrates between
    * train and test when the corpus is re-materialized.
    *
    * `fractions` are integer weights; the bucket space is their sum.
    */
  def hashSplit(df: DataFrame, idCol: String, seed: String = "split",
                fractions: Seq[(String, Int)] =
                  Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0), "positive weights")
    val total = fractions.map(_._2).sum
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long"),
      lit(total.toLong))
    val bounds = fractions.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val named = fractions.map(_._1).zip(bounds)
    val split = named.init.reverse.foldLeft(lit(named.last._1): Column) {
      case (els, (nm, ub)) => when(col("__bucket") < ub, lit(nm)).otherwise(els)
    }
    df.select(col(idCol), bucket.as("__bucket"))
      .select(col(idCol), col("__bucket").as("bucket"), split.as("split"))
  }

  /** Keep the best representative of each duplicate cluster — the
    * usual refinement of keep-min-id dedup: cluster by normalized
    * content fingerprint, rank by a caller-supplied quality score
    * (descending), tie-break on id so the winner is deterministic.
    * Returns every input row with a `keep` flag.
    */
  def keepBestByFingerprint(docs: DataFrame, idCol: String, textCol: String,
                            score: Column): DataFrame = {
    val w = Window.partitionBy(col("__fp"))
      .orderBy(col("__score").desc, col(idCol).asc)
    docs
      .select(col(idCol), T.fingerprint(col(textCol)).as("__fp"), score.as("__score"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("keep"))
  }
}
