package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.attachPayload(
    Seq((1L, "abc"), (2L, ""), (3L, "0123456789" * 20)).toDF("id", "txt"), "id", "txt")

  test("attachPayload produces binary + format columns") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    assert(rows(media).length == 3)
  }

  test("decode stub computes deterministic byte features incl. empty payload") {
    val out = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_bytes") == 3)
    assert(out(1L).getAs[Int]("first_byte") == 'a'.toInt)
    assert(out(1L).getAs[Long]("byte_sum") == ('a' + 'b' + 'c').toLong)
    assert(out(2L).getAs[Long]("n_bytes") == 0)
    assert(out(2L).getAs[Int]("first_byte") == -1)
  }

  test("resizePayload normalizes every payload to the target size") {
    val out = Multimodal.resizePayload(media, 16).collect()
    assert(out.forall(_.getAs[Array[Byte]]("payload").length == 16))
    // truncation keeps prefix; padding appends zeros
    val short = out.find(_.getAs[Long]("media_id") == 1L).get.getAs[Array[Byte]]("payload")
    assert(short.take(3).toSeq == "abc".getBytes.toSeq && short.drop(3).forall(_ == 0))
  }

  test("extractFeatures: deterministic fixed-dim embedding in [-1,1]") {
    val f1 = Multimodal.extractFeatures(media, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= -1f && x <= 1f)))
    // feeds the ANN path
    val emb = Multimodal.extractFeatures(media, 8)
    val q = emb.limit(1).select(col("media_id").as("qid"), col("embedding").as("qvec"))
    val top = graft.operators.Similarity.bruteForceTopK(emb, q,
      "media_id", "embedding", "qid", "qvec", k = 2).collect()
    assert(top.length == 2 && top.head.getAs[Double]("score") == 1.0)
  }

  test("sampleFrames: empty payload yields no frames (no phantom sequence(0,-1))") {
    val out = Multimodal.sampleFrames(media.filter(col("media_id") === 2), 64, 1)
    assert(out.count() == 0)
  }

  test("sampleFrames takes every stride-th fixed-size chunk") {
    val out = Multimodal.sampleFrames(media.filter(col("media_id") === 3), 64, 2).collect()
    // 200 bytes -> 4 frames (64,64,64,8) -> stride 2 keeps frames 0 and 2
    assert(out.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2))
    assert(out.map(_.getAs[Int]("frame_bytes")).sorted.toSeq == Seq(64, 64))
  }
}
