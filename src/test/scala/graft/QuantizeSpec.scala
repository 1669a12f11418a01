package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val vecs = (0L until 50L).map(i =>
    (i, Array.tabulate(dim)(d => (math.sin(i * 0.7 + d) * (d + 1)).toFloat).toSeq))
    .toDF("vec_id", "embedding")

  test("scalarQuantize: codes in range, reconstruction error within one bucket") {
    val stats = Quantize.dimStats(vecs, "embedding", dim)
    val enc = Quantize.scalarQuantize(vecs, "vec_id", "embedding", dim, stats = Some(stats))
    val dec = Quantize.dequantize(enc, "vec_id", "codes", stats)
    vecs.join(dec, "vec_id").collect().foreach { r =>
      val v = r.getAs[collection.Seq[Float]]("embedding")
      val w = r.getAs[collection.Seq[Double]]("vec")
      (0 until dim).foreach { d =>
        val width = (stats(d)._2 - stats(d)._1) / 256
        assert(math.abs(v(d) - w(d)) <= width + 1e-12, s"dim $d of vec ${r.getLong(0)}")
      }
    }
    val codes = enc.select(explode(col("codes"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c <= 255))
  }

  test("scalarQuantize: extremes hit the code range ends; partition-invariant") {
    def run(p: Int) = Quantize.scalarQuantize(vecs.repartition(p), "vec_id", "embedding", dim)
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Int]]("codes")).toMap
    val out = run(1)
    assert(run(5) == out)
    // per dim, the corpus min encodes to 0 and the corpus max to 255
    (0 until dim).foreach { d =>
      val column = out.values.map(_(d))
      assert(column.min == 0 && column.max == 255, s"dim $d")
    }
  }

  test("pq with m=1 subspace reproduces the global kmeans assignment") {
    import graft.operators.Cluster
    val cbs = Quantize.pqCodebooks(vecs, "vec_id", "embedding", dim, m = 1, k = 4, iters = 2)
    val pq = Quantize.pqEncode(vecs, "vec_id", "embedding", dim, cbs)
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Int]]("codes").head).toMap
    val km = Cluster.kmeans(vecs, "vec_id", "embedding", dim, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pq == km)
  }

  test("pqEncode: m codes in range, deterministic, decode has the codebook dim") {
    val cbs = Quantize.pqCodebooks(vecs, "vec_id", "embedding", dim, m = 2, k = 4, iters = 1)
    assert(cbs.length == 2 && cbs.forall(_.length == 4 * dim / 2))
    def run(p: Int) = Quantize.pqEncode(vecs.repartition(p), "vec_id", "embedding", dim, cbs)
      .collect().map(r => r.getLong(0) -> r.getAs[collection.Seq[Int]]("codes").toList).toMap
    val out = run(1)
    assert(run(5) == out)
    assert(out.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
    val enc = Quantize.pqEncode(vecs, "vec_id", "embedding", dim, cbs)
    val dec = Quantize.pqDecode(enc, "vec_id", "codes", cbs, dim)
      .collect().map(_.getAs[collection.Seq[Double]]("vec"))
    assert(dec.forall(_.length == dim))
  }

  test("pqCodebooks fused training is bit-identical to the per-subspace chain") {
    // the pre-r16 composable pipeline, kept verbatim as the reference:
    // per subspace, hash-sample k slice-centroids then iterate
    // lloydStep on the sliced relation — the fused pqCodebooks must
    // reproduce it EXACTLY (same sample because the key is a function
    // of the id alone; same centroids because Lloyd sums are exact
    // longs), or the PQ gates' oracle replay breaks
    import graft.operators.{Cluster, Similarity}
    def reference(m: Int, k: Int, iters: Int): Array[Array[Double]] = {
      val sub = dim / m
      (0 until m).map { si =>
        val sliced = vecs.select(col("vec_id"), slice(col("embedding"), si * sub + 1, sub).as("__sub"))
        var flat = Similarity.sampleCentroids(sliced, "vec_id", "__sub", sub, k)
        (0 until iters).foreach(_ => flat = Cluster.lloydStep(sliced, "__sub", sub, k, flat))
        flat
      }.toArray
    }
    for ((m, k, iters) <- Seq((4, 4, 2), (2, 4, 1), (1, 4, 2), (4, 4, 0))) {
      val fused = Quantize.pqCodebooks(vecs, "vec_id", "embedding", dim, m, k, iters)
      val ref = reference(m, k, iters)
      assert(fused.length == ref.length, s"m=$m")
      fused.zip(ref).zipWithIndex.foreach { case ((f, r), si) =>
        assert(f.toSeq == r.toSeq, s"subspace $si of m=$m k=$k iters=$iters")
      }
    }
    // and with the gate's md5 sampling key (the oracle-replayable path)
    val key = Some((id: org.apache.spark.sql.Column) =>
      md5(concat(lit("ivf:"), id.cast("string"))))
    val fusedK = Quantize.pqCodebooks(vecs, "vec_id", "embedding", dim, 2, 4, 2, sampleKey = key)
    val refK = {
      val sub = dim / 2
      (0 until 2).map { si =>
        val sliced = vecs.select(col("vec_id"), slice(col("embedding"), si * sub + 1, sub).as("__sub"))
        var flat = Similarity.sampleCentroids(sliced, "vec_id", "__sub", sub, 4, sampleKey = key)
        (0 until 2).foreach(_ => flat = Cluster.lloydStep(sliced, "__sub", sub, 4, flat))
        flat
      }.toArray
    }
    fusedK.zip(refK).foreach { case (f, r) => assert(f.toSeq == r.toSeq) }
  }

  test("codeOutliers flags the far vector, honors labels, is partition-stable") {
    // 20 vectors hugging the origin + one far point: the far point is
    // the only one whose dist2 exceeds 4× the mean dist2
    val tight = (0L until 20L).map(i =>
      (i, Array.tabulate(4)(d => ((i + d) % 3 * 0.01).toFloat).toSeq, 0))
    val far = Seq((99L, Array.fill(4)(10.0f).toSeq, 0))
    val df = (tight ++ far).toDF("vec_id", "embedding", "label")
    val out = Quantize.codeOutliers(df, "vec_id", "embedding", dim = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 21)
    assert(out(99L)._2 && out.filter(_._1 != 99L).values.forall(!_._2))
    // per-label mode: each label scores against ITS OWN centroid — two
    // well-separated clusters produce no outlier when split by label...
    val a = (0L until 10L).map(i => (i, Array.fill(4)(0.0f + i * 0.001f).toSeq, 0))
    val b = (10L until 20L).map(i => (i, Array.fill(4)(5.0f + i * 0.001f).toSeq, 1))
    val two = (a ++ b).toDF("vec_id", "embedding", "label")
    val lbl = Quantize.codeOutliers(two, "vec_id", "embedding", dim = 4,
        labelCol = Some("label"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(lbl.size == 20 && lbl.values.forall(!_._3))
    assert(lbl(0L)._1 == 0 && lbl(15L)._1 == 1)
    // schema carries the label column only when asked
    assert(Quantize.codeOutliers(two, "vec_id", "embedding", dim = 4)
      .columns.toSeq == Seq("vec_id", "dist2", "is_outlier"))
    // deterministic across partitionings
    val re = Quantize.codeOutliers(df.repartition(7), "vec_id", "embedding", dim = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(re == out)
  }
}
