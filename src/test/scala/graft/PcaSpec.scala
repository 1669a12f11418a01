package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEig: known 2x2 eigenpairs, descending order, canonical sign") {
    val (vals, vecs) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // λ=1 vector is ±(1,−1)/√2; canonical sign makes the first
    // largest-|coord| entry positive
    assert(vecs(1).zip(Array(r, -r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // orthonormal
    val dot = vecs(0).zip(vecs(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-12)
  }

  test("gram matches brute force and is repartition-stable") {
    val rows = Seq(
      (1L, Seq(1, 2, 3)), (2L, Seq(0, 5, 1)), (3L, Seq(4, 4, 4)), (4L, Seq(2, 0, 7)))
    val df = rows.toDF("id", "codes")
    val out = Pca.gram(df, "codes", 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute-force reference
    val data = rows.map(_._2.map(_.toLong))
    for (i <- 0 until 3; j <- i until 3) {
      val sxy = data.map(v => v(i) * v(j)).sum
      val (si, sj) = (data.map(_(i)).sum, data.map(_(j)).sum)
      assert(out((i, j)) == ((sxy, si, sj, 4L)), s"pair ($i,$j)")
    }
    assert(out.size == 6) // upper triangular only
    val re = Pca.gram(df.repartition(5), "codes", 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(re == out)
  }

  test("fitTransform recovers the dominant direction; variance ordering holds") {
    // dims 0-2 move together along (1, 2, −1)·t; dim 3 is independent
    // small noise. SQ8 stretches every dim to its own 0..255 range, so
    // PCA runs in CORRELATION-like code space — the top component must
    // align with the correlated block's code-space direction
    // (1, 1, −1, 0)/√3 (each correlated dim full-range, dim2 inverted).
    val u = Array(1.0, 2.0, -1.0, 0.0)
    val vecs = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val s = ((i * 7919) % 21 - 10) / 50.0 // deterministic small noise
      (i.toLong, (0 until 4).map(d =>
        (t * u(d) + (if (d == 3) s else 0.0)).toFloat).toArray.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val codes = graft.operators.Quantize.scalarQuantize(df, "vec_id", "embedding", dim = 4)
    val (mean, vals, comps) = Pca.fit(Pca.gram(codes, "codes", 4), dim = 4, k = 2)
    assert(vals(0) > vals(1) && vals(1) >= -1e-9) // descending, PSD
    val expected = Array(1.0, 1.0, -1.0, 0.0).map(_ / math.sqrt(3.0))
    val cos = comps(0).zip(expected).map { case (a, b) => a * b }.sum /
      math.sqrt(comps(0).map(x => x * x).sum)
    assert(math.abs(cos) > 0.98, s"cos=$cos")
    // end-to-end projection: p0 carries the spread, p1 the noise
    val proj = Pca.fitTransform(df, "vec_id", "embedding", dim = 4, k = 2)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    // code space equalizes per-dim variance (every dim full-range), so
    // the 3-dim correlated block's eigenvalue is ≈3× the noise dim's
    assert(variance(proj.map(_._1).toSeq) > 2 * variance(proj.map(_._2).toSeq))
    // deterministic across partitionings (integer moments + fixed-order
    // driver/row float math)
    val re = Pca.fitTransform(df.repartition(7), "vec_id", "embedding", dim = 4, k = 2)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(re.sortBy(_._1).zip(proj.sortBy(_._1)).forall {
      case ((a1, a2), (b1, b2)) => a1 == b1 && a2 == b2
    })
  }
}
