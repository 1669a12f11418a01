package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Distributed PCA over embedding corpora — the standard dimension
  * reducer in training-data pipelines (whitening before clustering,
  * cheap-ANN projections, redundancy analysis of an embedding space).
  *
  * Scale design: the ONLY corpus-sized pass is the second-moment
  * (Gram) aggregation — each row contributes its d(d+1)/2 upper-
  * triangular code products through one codegen'd expression
  * ([[graft.functions.VectorExpressions.UpperTriProducts]]), and the
  * posexplode + groupBy(position) partial-aggregates them map-side,
  * so the shuffle carries d(d+1)/2 rows per MAP TASK (≈2,080 longs at
  * d=64), never per input row. The d×d moment matrix is driver-sized
  * BY CONSTRUCTION (like the IVF centroids — the sanctioned tiny
  * collect); the eigensolve is a cyclic Jacobi on that d×d, and the
  * projection is a second map-side-only pass with the eigenvectors
  * inlined as literals — no join, no broadcast, no third pass.
  *
  * Engine-exactness: moments accumulate INTEGER products of SQ8
  * codes (exact, order-free under any partitioning — the fixed-point
  * covariance recipe), so the gate can hash-compare the moment
  * relation against DuckDB. The float stages (covariance scaling,
  * Jacobi, projection) run on identical doubles in a fixed order on
  * the driver / per row, deterministic across reruns and
  * partitionings; eigenvector SIGN is canonicalized (largest-|coord|
  * entry positive) so components cannot flip between runs.
  */
object Pca {

  /** Integer second-moment relation over int-code vectors:
    * one row per dimension pair (i ≤ j) with the raw product sum,
    * both dimensions' code sums, and the row count — everything a
    * covariance needs, all BIGINT-exact.
    * Output: (i, j, sxy, si, sj, cnt). */
  def gram(codes: DataFrame, codesCol: String, dim: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    // static (pos, i, j) unflattening map: d(d+1)/2 rows by
    // construction — broadcast, never shuffled
    val posMap = broadcast(
      (for (i <- 0 until dim; j <- i until dim)
        yield (i * dim - i * (i - 1) / 2 + (j - i), i, j)).toDF("__p", "i", "j"))
    val prods = codes
      .select(posexplode(VectorExpressions.upperTriProducts(col(codesCol))).as(Seq("__p", "__v")))
      .groupBy(col("__p")).agg(sum(col("__v")).as("sxy"))
    val sums = codes
      .select(posexplode(col(codesCol)).as(Seq("__d", "__c")))
      .groupBy(col("__d"))
      .agg(sum(col("__c").cast("long")).as("__s"), count(lit(1)).as("__n"))
    prods.join(posMap, "__p")
      .join(sums.select(col("__d").as("i"), col("__s").as("si"), col("__n").as("cnt")), "i")
      .join(sums.select(col("__d").as("j"), col("__s").as("sj")), "j")
      .select(col("i"), col("j"), col("sxy"), col("si"), col("sj"), col("cnt"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric d×d (driver-side —
    * d is the embedding dim, tiny by construction). Returns ALL
    * eigenpairs sorted by eigenvalue descending, eigenvectors as
    * rows, each sign-canonicalized: the largest-|coordinate| entry
    * is positive (first such index on exact ties). Deterministic:
    * fixed sweep order, fixed rotation formulas. */
  private[graft] def jacobiEig(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-11 * (1.0 + frobenius(a)) && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0) {
            // classic two-sided rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val pairs = (0 until d).map { i =>
      val vec = Array.tabulate(d)(r => v(r)(i))
      // canonical sign: the largest-|coord| (first on ties) positive
      var best = 0
      var bi = 0
      var idx = 0
      while (idx < d) {
        if (math.abs(vec(idx)) > math.abs(vec(bi))) bi = idx
        idx += 1
      }
      best = bi
      val flipped = if (vec(best) < 0) vec.map(-_) else vec
      (a(i)(i), flipped)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Fit top-k principal components from a [[gram]] relation: collect
    * the moment rows (d(d+1)/2 — driver-sized by construction), form
    * the covariance C_ij = sxy/n − (si/n)(sj/n), Jacobi-solve.
    * Returns (mean, eigenvalues, components as rows), k of each. */
  def fit(gramDf: DataFrame, dim: Int, k: Int): (Array[Double], Array[Double], Array[Array[Double]]) = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val rows = gramDf.select(col("i"), col("j"), col("sxy"), col("si"), col("cnt")).collect()
    require(rows.nonEmpty, "empty gram relation — no input vectors to fit PCA on")
    val n = rows.head.getLong(4).toDouble
    val sums = new Array[Double](dim)
    rows.foreach { r => if (r.getInt(0) == r.getInt(1)) sums(r.getInt(0)) = r.getLong(3).toDouble }
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val c = r.getLong(2).toDouble / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEig(cov)
    (mean, vals.take(k), vecs.take(k))
  }

  /** Map-side projection of code vectors onto fitted components:
    * proj_c = Σ_d code_d · comp_c_d − (Σ_d mean_d · comp_c_d) — the
    * centering folded into one DRIVER-side scalar offset per
    * component, so the per-row work is a single codegen'd dot product
    * (no per-row mean subtraction pass to be re-inlined under each of
    * the k dots — the CollapseProject recompute hazard). Fixed-order
    * double arithmetic on identical inputs: deterministic. No join,
    * no shuffle. */
  def transformCodes(codes: DataFrame, idCol: String, codesCol: String,
                     mean: Array[Double], comps: Array[Array[Double]]): DataFrame = {
    val projCols = comps.zipWithIndex.map { case (comp, c) =>
      val offset = comp.zip(mean).map { case (w, m) => w * m }.sum
      (VectorExpressions.dot(col(codesCol), array(comp.map(lit(_)): _*)) - lit(offset))
        .as(s"p$c")
    }
    codes.select((col(idCol) +: projCols): _*)
  }

  /** End-to-end: SQ8-quantize → moment aggregate → Jacobi → project.
    * One corpus pass for stats, one for moments, one for projection —
    * all map-side or partial-agg'd; nothing corpus-sized leaves the
    * executors. Output: (id, p0…p{k−1}). */
  def fitTransform(emb: DataFrame, idCol: String, vecCol: String,
                   dim: Int, k: Int): DataFrame = {
    val codes = Quantize.scalarQuantize(emb, idCol, vecCol, dim).cache()
    val (mean, _, comps) = fit(gram(codes, "codes", dim), dim, k)
    // projection is one map-side pass over the cached codes; seal the
    // (row-count × k) result so the cache can drop before returning
    val out = transformCodes(codes, idCol, "codes", mean, comps).localCheckpoint()
    codes.unpersist()
    out
  }
}
