package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Embedding compression for 100 TB vector corpora: per-dimension
  * affine int8 quantization (the classic scalar-quantizer shape every
  * vector store ships as "SQ8") — 4× smaller than float32 at ~1%
  * recall cost, which is the difference between an ANN index that
  * fits in cluster memory and one that doesn't.
  *
  * Scale design: the stats pass is one explode + a dim-cardinality
  * partial aggregate (dim rows total — collected like the IVF
  * centroids, the sanctioned tiny-relation driver hop); encoding is
  * then a single MAP-SIDE transform with the stats inlined as array
  * literals — no join, no shuffle, no second pass over the corpus.
  * Every arithmetic step (subtract, multiply, divide, floor, clamp)
  * is a fixed chain of correctly-rounded double ops on identical
  * inputs, so codes are bit-identical across engines and
  * partitionings — the quantized corpus is reproducible.
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus, cast to double BEFORE
    * aggregating so later arithmetic sees the same doubles on every
    * engine. Returns dim pairs (a tiny by-construction relation). */
  def dimStats(emb: DataFrame, vecCol: String, dim: Int): Array[(Double, Double)] = {
    val rows = emb.select(posexplode(col(vecCol)).as(Seq("__d", "__v")))
      .select(col("__d"), col("__v").cast("double").as("__v"))
      .groupBy("__d").agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
      .collect()
    val out = Array.fill(dim)((0.0, 0.0))
    rows.foreach(r => out(r.getInt(0)) = (r.getDouble(1), r.getDouble(2)))
    out
  }

  /** Encode each vector into `levels` (default 256 = int8) codes:
    * code_d = clamp(floor((v_d − min_d) · levels / (max_d − min_d))).
    * A constant dimension (max = min) encodes as 0.
    * Output: (idCol, codes array&lt;int&gt;). */
  def scalarQuantize(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                     levels: Int = 256,
                     stats: Option[Array[(Double, Double)]] = None): DataFrame = {
    val st = stats.getOrElse(dimStats(emb, vecCol, dim))
    emb.select(col(idCol), encodeExpr(col(vecCol), st, dim, levels).as("codes"))
  }

  /** The SQ8 encode expression alone — for callers that need to keep
    * other columns alongside the codes (the map-side transform with
    * the stats inlined as array literals, exactly as [[scalarQuantize]]
    * applies it). */
  def encodeExpr(vec: Column, stats: Array[(Double, Double)], dim: Int,
                 levels: Int = 256): Column = {
    val mnArr = array(stats.map(s => lit(s._1)): _*)
    val mxArr = array(stats.map(s => lit(s._2)): _*)
    transform(sequence(lit(0), lit(dim - 1)), d => {
      val v = element_at(vec, d + 1).cast("double")
      val mn = element_at(mnArr, d + 1)
      val mx = element_at(mxArr, d + 1)
      when(mx === mn, lit(0))
        .otherwise(least(lit(levels - 1), floor((v - mn) * levels / (mx - mn))))
        .cast("int")
    })
  }

  /** Product-quantization codebooks: per-subspace spherical k-means —
    * m codebooks of k centroids over the dim/m-dim vector slices
    * (the FAISS PQ shape; with m=4, k=8 a 64-float vector compresses
    * 256 B → 4 B at far lower distortion than one global codebook).
    * Training runs m·iters tiny (cell,dim)-aggregates over the
    * corpus — at 100 TB train on a hash sample and encode everything;
    * the codebooks themselves are k·dim doubles total (driver-size by
    * construction, like the IVF centroids). `sampleKey` = md5 in gate
    * mode so the oracle derives the identical init (production
    * default xxhash64). */
  def pqCodebooks(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  m: Int = 4, k: Int = 16, iters: Int = 2, seed: Long = 42L,
                  sampleKey: Option[Column => Column] = None): Array[Array[Double]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    // Training is fused across subspaces: m·(1 sample + iters Lloyd)
    // sequential corpus jobs collapse to 1 + iters (r16: 12 jobs → 3
    // for the default m=4, iters=2 — the training chain was ~half of
    // sim_ivfpq_topk's wall at sf10 after scoring was parallelized).
    // Bit-identical to the per-subspace chain (QuantizeSpec pins it):
    //   - the hash-sample key is a function of the id ALONE, so every
    //     subspace sampled the SAME k rows — collect the full vectors
    //     once and slice on the driver (float→double casts are exact,
    //     so slicing before or after the cast is the same doubles);
    //   - a Lloyd update is per-(subspace, cell, dim) LONG sums —
    //     exact integers, independent of partitioning and of which
    //     job computed them (Cluster.lloydStepSubspaces).
    val full = Similarity.sampleCentroids(emb, idCol, vecCol, dim, k, seed, sampleKey)
    val kAct = full.length / dim
    var flats: Array[Array[Double]] = (0 until m).map { si =>
      val f = new Array[Double](kAct * sub)
      var ci = 0
      while (ci < kAct) {
        System.arraycopy(full, ci * dim + si * sub, f, ci * sub, sub)
        ci += 1
      }
      f
    }.toArray
    (0 until iters).foreach { _ =>
      flats = Cluster.lloydStepSubspaces(emb, vecCol, dim, m, kAct, flats)
    }
    flats
  }

  /** PQ-encode: ONE map-side pass — m codegen'd nearest-centroid
    * assignments per row, each over its slice; no shuffle, no join.
    * Output: (idCol, codes array&lt;int&gt; of length m). */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
               codebooks: Array[Array[Double]]): DataFrame =
    emb.select(col(idCol), pqCodes(col(vecCol), dim, codebooks).as("codes"))

  /** The m-code array expression [[pqEncode]] selects — exposed so the
    * persisted IVF+PQ store ([[Similarity.buildIvfPqIndex]]) can derive
    * (id, codes, cell) in ONE map-side projection instead of a join. */
  def pqCodes(vec: Column, dim: Int, codebooks: Array[Array[Double]]): Column = {
    val m = codebooks.length
    val sub = dim / m
    val k = codebooks(0).length / sub
    array((0 until m).map { si =>
      element_at(VectorExpressions.nearestCentroids(
        slice(vec, si * sub + 1, sub), codebooks(si), sub, k, 1), 1).cast("int")
    }: _*)
  }

  /** Add a `__dec` column decoding `codesCol` in place (all other
    * columns kept): each code's centroid concatenated back into a
    * dim-long vector, with the codebooks inlined as literals — a pure
    * map-side transform, no lookup join. The approximate-scoring path
    * of [[Similarity.ivfPqTopK]]. */
  def pqDecodeCol(df: DataFrame, codesCol: String,
                  codebooks: Array[Array[Double]], dim: Int): DataFrame = {
    val m = codebooks.length
    val sub = dim / m
    val parts = codebooks.zipWithIndex.map { case (cb, si) =>
      val cbArr = array(cb.map(lit): _*)
      val code = element_at(col(codesCol), si + 1)
      transform(sequence(lit(0), lit(sub - 1)),
        d => element_at(cbArr, code * sub + d + 1))
    }
    df.withColumn("__dec", concat(parts: _*))
  }

  /** PQ-decode: (idCol, vec array&lt;double&gt;) reconstruction view of an
    * encoded relation. */
  def pqDecode(encoded: DataFrame, idCol: String, codesCol: String,
               codebooks: Array[Array[Double]], dim: Int): DataFrame =
    pqDecodeCol(encoded, codesCol, codebooks, dim)
      .select(col(idCol), col("__dec").as("vec"))

  /** Decode codes back to bucket midpoints — the query-time side of
    * SQ8 (|v − decode(encode(v))| ≤ bucketWidth, with the mass of
    * errors at ≤ bucketWidth/2). Output: (idCol, vec array&lt;double&gt;). */
  def dequantize(encoded: DataFrame, idCol: String, codesCol: String,
                 stats: Array[(Double, Double)], levels: Int = 256): DataFrame = {
    val dim = stats.length
    val mnArr = array(stats.map(s => lit(s._1)): _*)
    val mxArr = array(stats.map(s => lit(s._2)): _*)
    val vec = transform(sequence(lit(0), lit(dim - 1)), d => {
      val c = element_at(col(codesCol), d + 1).cast("double")
      val mn = element_at(mnArr, d + 1)
      val mx = element_at(mxArr, d + 1)
      mn + (c + 0.5) * (mx - mn) / levels
    })
    encoded.select(col(idCol), vec.as("vec"))
  }

  /** Embedding-space outlier scoring over SQ8 codes — the corpus-
    * hygiene pass that flags mis-embedded / out-of-distribution
    * vectors before clustering or dedup trusts them. Each vector's
    * score is its exact integer squared distance to its group's
    * integer centroid (per-`labelCol` group, or one global group):
    * centroid_d = Σcodes_d div n (the kmeans fixed-point recipe), so
    * dist2 ≤ dim·(levels−1)² — bounded, BIGINT-exact, order-free
    * under any partitioning and engine. The outlier flag is the
    * integer cross-multiplication dist2·n > 4·Σdist2 (i.e. dist2
    * exceeds 4× the group mean) — no float threshold to flake.
    *
    * Scale shape: one dim-stats pass (tiny, collected like the IVF
    * centroids), one map-side encode, one per-(group, dim) partial
    * agg whose result is groups·dim rows (labels are a fixed tiny
    * class set — the sanctioned driver-sized relation, inlined as a
    * map literal so scoring is one MAP-SIDE zip_with pass, no join),
    * then a groups-sized stats agg rejoined broadcast-style by AQE.
    * Nothing corpus-sized shuffles except the (group, dim, sum)
    * partials. Output: (idCol, labelCol?, dist2, is_outlier). */
  def codeOutliers(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                   labelCol: Option[String] = None,
                   levels: Int = 256): DataFrame = {
    val st = dimStats(emb, vecCol, dim)
    val groupCol = labelCol.getOrElse("__g")
    val base0 = emb.select(
      (col(idCol) +: labelCol.map(col).toSeq :+ encodeExpr(col(vecCol), st, dim, levels).as("__codes")): _*)
    val base = if (labelCol.isEmpty) base0.withColumn("__g", lit(0)) else base0
    // per-(group, dim) integer sums + count → integer centroid codes;
    // groups × dim rows by construction (labels are a class enum)
    val sums = base
      .select(col(groupCol), posexplode(col("__codes")).as(Seq("__d", "__c")))
      .groupBy(col(groupCol), col("__d"))
      .agg(sum(col("__c").cast("long")).as("__s"), count(lit(1)).as("__n"))
      .collect()
    val cents: Map[Any, Array[Int]] = sums.groupBy(_.get(0)).map { case (g, rows) =>
      val c = new Array[Int](dim)
      rows.foreach(r => c(r.getInt(1)) = (r.getLong(2) / r.getLong(3)).toInt)
      g -> c
    }
    val groups = cents.keys.toSeq
    // centroid lookup inlined as a literal map column — scoring stays
    // one map-side pass with zero joins against the corpus
    val centMap = map(groups.flatMap(g =>
      Seq(lit(g), array(cents(g).map(lit(_)): _*))): _*)
    val scored = base.select(
      (col(idCol) +: labelCol.map(col).toSeq :+
        aggregate(
          zip_with(col("__codes"), element_at(centMap, col(groupCol)),
            (a, b) => ((a - b) * (a - b)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("dist2")) :+ col(groupCol).as("__gk"): _*)
    val stats = scored.groupBy(col("__gk").as("__sg"))
      .agg(sum(col("dist2")).as("__sumd"), count(lit(1)).as("__cnt"))
    scored.join(stats, col("__gk") === col("__sg"))
      .select((col(idCol) +: labelCol.map(col).toSeq :+ col("dist2") :+
        (col("dist2") * col("__cnt") > col("__sumd") * 4).as("is_outlier")): _*)
  }
}
