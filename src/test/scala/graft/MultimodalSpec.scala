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

  test("frameDedup: trims/re-encodes pair by shared frames; cap kills degenerate fps; hashed == md5") {
    val block = "0123456789abcdef" * 4 // exactly one 64-byte frame
    val fill = (i: Int) => s"unique-filler-$i-" * 4
    val vids = Multimodal.attachPayload(Seq(
      1L -> (block * 4),                       // frames: B B B B (one distinct fp)
      2L -> (block * 3 + fill(2).take(64)),    // shares B with 1 (3 frames worth -> 1 distinct)
      3L -> (fill(31) + fill(32)).take(192),   // disjoint content
      4L -> (block + fill(4).take(64))         // shares B, only 1 distinct shared fp
    ).toDF("id", "txt"), "id", "txt")
    // distinct fingerprints: media 1,2,4 all contain fp(B); pair overlap
    // counts are DISTINCT-fp counts, so (1,2)=(1,4)=(2,4)=1
    val out = Multimodal.frameDedup(vids, 64, 1, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 1L, (1L, 4L) -> 1L, (2L, 4L) -> 1L))
    // minShared above the overlap -> empty
    assert(Multimodal.frameDedup(vids, 64, 1, minShared = 2).count() == 0)
    // a degenerate frame present in more media than maxBucket is dropped
    assert(Multimodal.frameDedup(vids, 64, 1, minShared = 1, maxBucket = 2).count() == 0)
    // multi-frame overlap counts distinct shared fps
    val two = Multimodal.attachPayload(Seq(
      10L -> (block + fill(7).take(64) + block.reverse),
      11L -> (block + fill(7).take(64) + block.reverse + fill(8).take(64))
    ).toDF("id", "txt"), "id", "txt")
    val o2 = Multimodal.frameDedup(two, 64, 1, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(o2 == Map((10L, 11L) -> 3L))
    // hashed production twin produces the identical relation
    val h = Multimodal.frameDedup(two, 64, 1, minShared = 3, hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(h == o2)
  }
}
