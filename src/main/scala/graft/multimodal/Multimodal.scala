package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload column next to a typed
  * metadata struct — the pattern that scales: Spark shuffles/spills
  * binary like any column, partition sizing is controlled by
  * `spark.sql.files.maxPartitionBytes`, and decode runs batch-wise in
  * `mapPartitions` so a heavy codec amortizes per-partition setup
  * (same shape as a Python `mapInPandas` batch UDF).
  *
  * The actual codec is STUBBED (no image/audio libraries ship in this
  * container): [[DecodeStub.decode]] is a deterministic fake that
  * computes real byte-level features. The Spark-side plumbing —
  * schema, encoders, batch signature, partition flow — is real and
  * tested; swapping in a JNI/ffmpeg decoder changes only the stub body.
  */
object Multimodal {

  /** A media row: id + payload + format tag. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)

  /** Decoded features (deterministic stub output). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, first_byte: Int,
                                 byte_sum: Long, format: String)

  /** Deterministic fake decoder — replace with a real codec binding.
    * Pure function of the payload bytes so results are reproducible
    * and oracle-checkable. */
  object DecodeStub {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.payload
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      MediaFeatures(r.media_id, bytes.length.toLong,
        if (bytes.isEmpty) -1 else bytes(0) & 0xff, s, r.format)
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of a text column —
    * stands in for image/audio bytes) plus a typed metadata struct. */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("txt").as("format"))

  /** Batch decode: Dataset[MediaRecord] → Dataset[MediaFeatures] via
    * mapPartitions (one stub-codec "session" per partition). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val ds: Dataset[MediaRecord] = media.as[MediaRecord](Encoders.product[MediaRecord])
    ds.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(DecodeStub.decode)
    }(Encoders.product[MediaFeatures]).toDF()
  }

  /** "Resize" stub: normalize every payload to exactly `targetBytes`
    * (truncate or zero-pad). Stands in for image resize — the Spark
    * plumbing (binary in, fixed-size binary out, schema preserved) is
    * what a real codec binding would use; only the byte transform is
    * fake. Pure expressions: substr on binary + rpad. */
  def resizePayload(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload",
      rpad(col("payload").substr(1, targetBytes), targetBytes, Array[Byte](0)))

  /** Feature-extract stub: a deterministic `dim`-dim float embedding
    * from payload bytes (per-slot xxhash folded to [-1, 1]) — the
    * media→embedding shape that feeds Similarity/Dedup. A real model
    * would run batch inference in mapPartitions; the output schema,
    * determinism and downstream compatibility are identical. */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame =
    media.select(col("media_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("payload"), i), lit(2000001L)) - 1000000L).cast("float") / 1000000.0f)
        .cast("array<float>").as("embedding"))

  /** Engine-portable variant of [[extractFeatures]]: slot i is derived
    * from md5(payload_text || ":" || i) — hi 32 hex bits mapped to the
    * exact dyadic (v - 2^31)/2^31 in [-1, 1). Any engine with md5()
    * rebuilds the identical doubles, which is what makes the gate
    * query's norm hash-checkable in DuckDB; production uses the
    * xxhash64 variant (one hash per slot either way, but xxhash64 is
    * ~3× cheaper). Emits array<double>. */
  def extractFeaturesPortable(media: DataFrame, dim: Int): DataFrame = {
    val text = decode(col("payload"), "UTF-8")
    val slots = (0 until dim).map { i =>
      val v = conv(substring(md5(concat(text, lit(":" + i))), 1, 8), 16, 10).cast("long")
      (v - lit(2147483648L)).cast("double") / 2147483648.0
    }
    media.select(col("media_id"), array(slots: _*).as("embedding"))
  }

  /** Frame-fingerprint near-duplicate detection across media — the
    * standard video-dedup shape: two payloads sharing at least
    * `minShared` identical sampled frames are re-encodes / trims /
    * container-swaps of each other (whole-payload hashing misses all
    * of those). No decode needed: frames come straight from
    * [[sampleFrames]]'s byte slicing, fingerprinted per frame.
    *
    * Scale shape (the minhash-LSH discipline): per-media DISTINCT
    * frame fingerprints map-side; ONE shuffle keyed on the
    * fingerprint; degenerate frames (black/blank intros shared by
    * everything) are capped at `maxBucket` media per fingerprint
    * before the pair join, so no quadratic hub; the pair count is a
    * partial-agg groupBy. Exchanges carry (fp, media_id) longs —
    * never payload bytes. Gate mode fingerprints with the portable
    * 60-bit md5; `hashed=true` uses xxhash64 (~3× cheaper, not
    * oracle-replayable). Output: (media_a, media_b, n_shared),
    * media_a < media_b. */
  def frameDedup(media: DataFrame, frameBytes: Int, stride: Int,
                 minShared: Long, maxBucket: Int = 64,
                 hashed: Boolean = false): DataFrame = {
    require(minShared >= 1 && maxBucket >= 2, "minShared >= 1, maxBucket >= 2")
    val frames = sampleFrames(media, frameBytes, stride)
    val fp =
      if (hashed) xxhash64(col("frame"))
      else conv(substring(md5(col("frame")), 1, 15), 16, 10).cast("long")
    val d = frames.select(col("media_id"), fp.as("__fp")).distinct()
    val ok = d.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2 && col("__n") <= maxBucket)
      .select(col("__fp"))
    val dd = d.join(ok, "__fp")
    dd.as("x").join(dd.as("y"),
        col("x.__fp") === col("y.__fp") && col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deterministic frame/chunk sampling: split the payload into
    * `frameBytes` chunks and keep every `stride`-th, without decoding —
    * pure expressions, no data copy of unsampled frames after pushdown. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      // empty payloads have no frames — and sequence(0, -1) would emit
      // a phantom [0, -1] (Spark flips the step when start > stop)
      .filter(length(col("payload")) > 0)
      .select(col("media_id"), col("payload"), posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "frame_no")))
      .filter(col("frame_idx") % stride === 0)
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
      .withColumn("frame_bytes", length(col("frame")))
  }
}
