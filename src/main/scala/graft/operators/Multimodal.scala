package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Typed metadata travelling with an opaque media payload. */
final case class MediaMeta(
    mediaId: Long,
    kind: String,      // "image" | "audio" | "video"
    mimeType: String,
    width: Int,
    height: Int,
    durationMs: Long)

final case class MediaRow(meta: MediaMeta, payload: Array[Byte])

final case class MediaFeatures(mediaId: Long, kind: String, features: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video ride as opaque `binary` columns with
 * a typed metadata struct. The Spark side — schema, partitioning, batch-shaped
 * kernels — is real; the actual media decode is STUBBED (no image/audio libraries in
 * this container) behind [[Multimodal.decodeStub]], a deterministic fake keyed on the
 * payload hash so pipelines are testable end-to-end. Swap `decodeStub` for a real
 * JNI/FFM decoder without touching any plan shape.
 */
object Multimodal {

  val FeatureDim = 64

  /**
   * STUB decode/feature-extract: deterministic pseudo-features from the payload
   * bytes. Real implementation would decode pixels/samples here.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 0x100000001B3L; i += 1 }
    val out = new Array[Float](FeatureDim)
    var j = 0
    var x = h
    while (j < FeatureDim) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(j) = ((x >>> 40).toInt & 0xffff).toFloat / 65536.0f
      j += 1
    }
    out
  }

  /**
   * Feature extraction over media rows: mapPartitions in payload-bounded batches
   * (the batch shape a vectorized decoder needs), one narrow pass, no shuffle.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r => MediaFeatures(r.meta.mediaId, r.meta.kind, decodeStub(r.payload)) }
    }
  }

  /**
   * Frame sampling plan for video rows: one output row per sampled frame timestamp.
   * The frame *extraction* is stubbed (payload hash + frame index); the row fan-out,
   * timestamps and partitioning are the real pipeline shape.
   */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    media
      .where(col("meta.kind") === "video" && col("meta.durationMs") > 0)
      .select(col("meta.mediaId").as("media_id"),
        explode(sequence(lit(0L), col("meta.durationMs") - 1, lit(everyMs))).as("frame_ts_ms"),
        col("payload"))
      // the frame timestamp must feed the hash (post-explode), or every frame of
      // a video carries the SAME stub and per-frame downstream logic sees no variation
      .select(col("media_id"), col("frame_ts_ms"),
        xxhash64(col("payload"), col("media_id"), col("frame_ts_ms")).as("frame_stub_hash"))
  }

  /** Deterministic synthetic media table for tests/benchmarks. */
  def synthesize(spark: org.apache.spark.sql.SparkSession, n: Long, partitions: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val payload = new Array[Byte](128 + (id % 512).toInt)
      var i = 0
      var x = id * 0x9E3779B97F4A7C15L
      while (i < payload.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        payload(i) = (x >>> 56).toByte
        i += 1
      }
      MediaRow(MediaMeta(id, kind, s"application/x-$kind", 640, 480,
        if (kind == "video") 1000L + (id % 9000) else 0L), payload)
    }
  }
}
