package graft.operators

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is small and broadcast; the corpus is
  * streamed once. Ranking uses (rounded score, id) so ordering is
  * total and reproducible across engines.
  *
  * `bruteForceTopK` currently ranks with a window over qid — at 100 TB
  * the right physical shape is a bounded-heap partial aggregate per
  * partition then a k-way merge (TypedImperativeAggregate); planned
  * upgrade, tracked in SURVEY §7. The LSH variant is the scale path:
  * it cuts the scored candidate set by ~2^bits/ballpark before any
  * shuffle.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. `queries` must be
    * small (broadcast). Output: (qid, vec_id, score, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: score only corpus vectors sharing a bucket with
    * the query in ANY of `nTables` independent `nBits`-bit hash tables
    * (multi-table OR-probing — single-table sign-LSH recall decays as
    * cos^nBits). Cost ~ nTables * corpus/2^nBits per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qidCol: String, qvecCol: String,
              k: Int, dim: Int, nBits: Int = 8, nTables: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol), col(vecCol),
      posexplode(V.lshBuckets(col(vecCol), dim, nBits, nTables)).as(Seq("__table", "__bucket")))
    val qb = broadcast(queries.select(col(qidCol), col(qvecCol),
      posexplode(V.lshBuckets(col(qvecCol), dim, nBits, nTables)).as(Seq("__table", "__bucket"))))
    // score in place, then dedup multi-table hits on (qid, id): the
    // dedup shuffle carries 3 scalars, never the vectors
    val scored = cb.join(qb, Seq("__table", "__bucket"))
      .select(col(qidCol), col(idCol),
        V.cosineRounded(col(vecCol), col(qvecCol)).as("score"))
      .groupBy(col(qidCol), col(idCol)).agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
