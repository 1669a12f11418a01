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
}
