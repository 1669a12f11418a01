package graft

import graft.operators.Cluster
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions (cosine clustering): +x-ish, +y-ish,
  // +z-ish groups of 4 vectors each, with small deterministic jitter
  private def vecs = (0 until 12).map { i =>
    val axis = i % 3
    val base = Array.fill(4)(0.05f * ((i * 7 % 5) - 2))
    base(axis) = 1.0f
    (i.toLong, base.toSeq)
  }.toDF("vec_id", "embedding")

  test("kmeans groups separable directions and is exhaustive") {
    val out = Cluster.kmeans(vecs, "vec_id", "embedding", dim = 4, k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 12)
    // every axis group lands in ONE cluster, and distinct axes in
    // distinct clusters (labels are arbitrary, the partition is not)
    val byAxis = (0 until 3).map(a => out.filter(_._1 % 3 == a).values.toSet)
    assert(byAxis.forall(_.size == 1), s"axis groups split: $byAxis")
    assert(byAxis.flatten.toSet.size == 3, s"axes merged: $byAxis")
  }

  test("kmeans assignment is invariant under repartitioning") {
    def run(parts: Int) =
      Cluster.kmeans(vecs.repartition(parts), "vec_id", "embedding",
        dim = 4, k = 3, iters = 2)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(run(1) == run(7))
  }

  test("lloydStep computes exact quantized means; empty cells keep centroids") {
    // 2 points on +x, k=2 with the second centroid orthogonal enough
    // that nothing is assigned to it
    val two = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.25f)),
    ).toDF("vec_id", "embedding")
    val init = Array(1.0, 0.0, /* cell 1: */ -1.0, 0.0)
    val next = Cluster.lloydStep(two, "embedding", dim = 2, k = 2, init)
    // cell 0 mean: x = (floor(1*2^20) + floor(1*2^20)) / (2*2^20) = 1.0
    //              y = (0 + floor(.25*2^20)) / (2*2^20) = 0.125
    assert(next(0) == 1.0 && next(1) == 0.125)
    // cell 1 untouched
    assert(next(2) == -1.0 && next(3) == 0.0)
  }

  test("quantized update matches the closed form on negative components") {
    val one = Seq((0L, Seq(-0.3f, 0.7f))).toDF("vec_id", "embedding")
    val next = Cluster.lloydStep(one, "embedding", dim = 2, k = 1, Array(1.0, 0.0))
    val xq = math.floor(-0.3f.toDouble * 1048576.0)
    val yq = math.floor(0.7f.toDouble * 1048576.0)
    assert(next(0) == xq / 1048576.0 && next(1) == yq / 1048576.0)
  }
}
