package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means clustering over an embedding column — the
  * corpus-organization primitive behind SemDeDup-style pruning, IVF
  * index build, and topic-balanced sampling (the reference engine has
  * no clustering; this is part of the training-data-pipeline surface).
  *
  * Lloyd iterations, cosine ("spherical") assignment — the natural
  * metric for normalized text embeddings and the one the rest of the
  * similarity stack (IVF / SemDeDup) already uses, sharing the
  * codegen'd [[VectorExpressions.NearestCentroids]] assignment.
  *
  * Scale shape (the textbook distributed k-means):
  *   - assignment is a map-side codegen'd expression over the
  *     broadcast centroid array — no shuffle;
  *   - the centroid update is a partial-aggregated groupBy on
  *     (cell, dim): each map task pre-reduces to at most k×dim rows,
  *     so the exchange carries k×dim×partitions tiny rows regardless
  *     of corpus size;
  *   - the k×dim update result is the only driver collect (same
  *     sanctioned tiny-relation exception as the IVF centroids).
  *
  * Determinism: centroid sums are computed over floor(v·2^20)
  * integer-quantized components, so the per-cluster sums are exact
  * longs — order-free under any partitioning — and the new centroid
  * component is one double division of exact integers (correctly
  * rounded, hence bit-identical on every engine/run). A plain float
  * sum would drift by partition order, making cluster assignments
  * flap between runs; quantizing at 2^-20 (~1e-6, far below embedding
  * noise) buys bit-reproducible clustering at no accuracy cost.
  * Empty clusters keep their previous centroid (deterministic rule,
  * mirrored by the oracle).
  */
object Cluster {

  /** `iters` Lloyd updates from hash-sampled initial centroids, then a
    * final assignment. `sampleKey` overrides the xxhash64 init
    * sampling order (the gate passes an md5 key so the DuckDB oracle
    * derives the identical init). Returns (idCol, cluster). */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
             iters: Int, seed: Long = 42L,
             sampleKey: Option[Column => Column] = None): DataFrame = {
    require(k > 0 && iters >= 0)
    var flat = Similarity.sampleCentroids(emb, idCol, vecCol, dim, k, seed, sampleKey)
    var it = 0
    while (it < iters) {
      flat = lloydStep(emb, vecCol, dim, k, flat)
      it += 1
    }
    emb.select(col(idCol),
      element_at(VectorExpressions.nearestCentroids(col(vecCol), flat, dim, k, 1), 1)
        .cast("int").as("cluster"))
  }

  /** One Lloyd update: assign every vector to its nearest centroid
    * (map-side codegen), partial-aggregate exact quantized sums per
    * (cell, dim), collect the k×dim tiny result, rebuild centroids.
    * Exposed for spec-level convergence checks. */
  def lloydStep(emb: DataFrame, vecCol: String, dim: Int, k: Int,
                centroidsFlat: Array[Double]): Array[Double] = {
    val cell = element_at(
      VectorExpressions.nearestCentroids(col(vecCol), centroidsFlat, dim, k, 1), 1)
    val sums = emb
      .select(cell.as("__cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__v")))
      // floor(v·2^20): exact double product of a float-derived double,
      // floored to a long — no rounding-mode ambiguity (round() ties
      // split half-up vs half-even across engines; floor never ties)
      .groupBy(col("__cell"), col("__d"))
      .agg(sum(floor(col("__v") * lit(1048576.0)).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .collect()
    val next = centroidsFlat.clone() // empty cells keep their centroid
    sums.foreach { r =>
      val c = r.getInt(0); val d = r.getInt(1)
      if (c >= 0 && c < k && d < dim)
        next(c * dim + d) = r.getLong(2).toDouble / (r.getLong(3) * 1048576L).toDouble
    }
    next
  }

  /** One Lloyd update over ALL `m` PQ subspaces in a SINGLE job — the
    * fused form of m sequential [[lloydStep]] calls on vector slices
    * (Quantize.pqCodebooks trains through this; 12 corpus jobs → 3 for
    * the default m=4/iters=2). Per row it assigns each slice to its
    * nearest subspace centroid map-side, explodes to (subspace, cell,
    * dim, component) and partial-aggregates the same floor(v·2^20)
    * exact long sums as [[lloydStep]] — per-(subspace, cell, dim)
    * integer sums are partition-order-free, so the result is
    * BIT-IDENTICAL to the per-subspace chain (QuantizeSpec pins the
    * equivalence). The exchange carries ≤ m·k·sub rows per map task. */
  def lloydStepSubspaces(emb: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
                         flats: Array[Array[Double]]): Array[Array[Double]] = {
    require(flats.length == m && dim % m == 0)
    val sub = dim / m
    val parts = (0 until m).map { si =>
      val sl = slice(col(vecCol), si * sub + 1, sub)
      struct(lit(si).as("si"),
        element_at(VectorExpressions.nearestCentroids(sl, flats(si), sub, k, 1), 1).as("cell"),
        sl.cast("array<double>").as("v"))
    }
    val sums = emb
      .select(explode(array(parts: _*)).as("__p"))
      .select(col("__p.si").as("__si"), col("__p.cell").as("__cell"),
        posexplode(col("__p.v")).as(Seq("__d", "__v")))
      .groupBy(col("__si"), col("__cell"), col("__d"))
      .agg(sum(floor(col("__v") * lit(1048576.0)).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .collect()
    val next = flats.map(_.clone())
    sums.foreach { r =>
      val si = r.getInt(0); val c = r.getInt(1); val d = r.getInt(2)
      if (si >= 0 && si < m && c >= 0 && c < k && d < sub)
        next(si)(c * sub + d) = r.getLong(3).toDouble / (r.getLong(4) * 1048576L).toDouble
    }
    next
  }
}
