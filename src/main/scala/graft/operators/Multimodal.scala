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
 * a typed metadata struct.
 *
 * IMAGE decode is REAL: [[imageMeta]] decodes PNG/JPEG/GIF/BMP payloads with the
 * JDK's built-in `javax.imageio` (no external dependency) into dimensions, format
 * and per-channel pixel means, in the same payload-bounded mapPartitions batch
 * shape a vectorized decoder needs. AUDIO decode is REAL for PCM containers:
 * [[audioMeta]] parses WAV/AIFF/AU via the JDK's `javax.sound.sampled` into
 * rate/channels/frames/duration plus exact 16-bit peak amplitude. Only VIDEO
 * decode remains STUBBED (no video codec libraries exist in the JDK or this
 * container) behind [[Multimodal.decodeStub]], a deterministic fake keyed on the
 * payload hash so those pipelines stay testable end-to-end; swap `decodeStub`
 * for a real JNI/FFM decoder without touching any plan shape.
 */
object Multimodal {

  val FeatureDim = 64

  /** Decoded image facts: geometry + per-channel 0-255 pixel means (rounded).
    * `ok = false` rows carry the reason in `format` ("undecodable"/"empty"). */
  final case class ImageInfo(media_id: Long, ok: Boolean, format: String,
      width: Int, height: Int, mean_r: Int, mean_g: Int, mean_b: Int)

  /** Real JDK image decode: None when no installed reader accepts the bytes.
    * Corrupt/truncated payloads must yield None, not a task-killing throw — at
    * web scale a crawl always contains undecodable images. */
  def decodeImage(payload: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] = {
    if (payload == null || payload.length == 0) return None
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream: the
      // latter defaults to a FileCache stream that spills every payload to a
      // temp file — a per-image disk round-trip (and a tmpdir dependency) in a
      // kernel whose bytes are already in memory
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val img = r.read(0)
            if (img == null) None
            else Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT), img))
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** One image's facts (pure kernel; total function over arbitrary bytes). */
  def imageInfo(id: Long, payload: Array[Byte]): ImageInfo =
    decodeImage(payload) match {
      case None =>
        ImageInfo(id, ok = false,
          if (payload == null || payload.isEmpty) "empty" else "undecodable", 0, 0, 0, 0, 0)
      case Some((fmt, img)) =>
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        // bulk row reads: per-pixel getRGB(x, y) does a ColorModel conversion
        // per call (~5-10× the row form) and image decode dominates this
        // operator's per-row cost; one reusable row buffer, no per-row alloc
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            val rgb = rowBuf(x)
            sr += (rgb >>> 16) & 0xff; sg += (rgb >>> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = math.max(w.toLong * h, 1L)
        ImageInfo(id, ok = true, fmt, w, h,
          (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
    }

  /**
   * Distributed image metadata/feature extraction over (id, payload) rows: one
   * narrow mapPartitions pass, no shuffle, bounded memory (one decoded image in
   * flight per task). Plan shape identical at 10^12 images; the per-image cost
   * is the real pixel decode.
   */
  def imageMeta(media: DataFrame, idCol: String, payloadCol: String): Dataset[ImageInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => imageInfo(id, bytes) })
  }

  /** Decoded audio facts: format geometry + exact frame count + peak amplitude
    * (16-bit absolute). `ok = false` rows carry the reason in `format`. */
  final case class AudioInfo(media_id: Long, ok: Boolean, format: String,
      sample_rate: Int, channels: Int, frames: Long, duration_ms: Long, peak: Int)

  /** Real JDK audio decode (javax.sound.sampled): WAV/AIFF/AU PCM parse with
    * no external dependency. Corrupt/unsupported payloads yield ok=false —
    * never a task-killing throw. */
  def audioInfo(id: Long, payload: Array[Byte]): AudioInfo = {
    if (payload == null || payload.isEmpty)
      return AudioInfo(id, ok = false, "empty", 0, 0, 0L, 0L, 0)
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate.toInt
        val durMs = if (rate > 0 && frames >= 0) frames * 1000L / rate else 0L
        // peak over 16-bit signed little/big-endian PCM (the overwhelmingly
        // common WAV shape); other encodings report geometry with peak = -1
        val peak =
          if (fmt.getSampleSizeInBits == 16 &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val bytes = in.readAllBytes()
            var mx = 0
            var i = 0
            while (i + 1 < bytes.length) {
              val v =
                if (fmt.isBigEndian) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
              val a = math.abs(v)
              if (a > mx) mx = a
              i += 2
            }
            mx
          } else -1
        val enc = fmt.getEncoding
        val encName = // actual payload encoding, not a hardcoded "pcm"
          if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED ||
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT) "pcm"
          else enc.toString.toLowerCase(java.util.Locale.ROOT)
        AudioInfo(id, ok = true, encName, rate, fmt.getChannels, frames, durMs, peak)
      } finally in.close()
    } catch { case _: Exception => AudioInfo(id, ok = false, "undecodable", 0, 0, 0L, 0L, 0) }
  }

  /** Distributed audio metadata extraction (same batch shape as [[imageMeta]]). */
  def audioMeta(media: DataFrame, idCol: String, payloadCol: String): Dataset[AudioInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => audioInfo(id, bytes) })
  }

  /** Deterministic 16-bit mono PCM WAV: a full-scale square wave of `frames`
    * samples (peak = exactly `amp`), for tests and closed-form oracles. */
  def syntheticWav(frames: Int, sampleRate: Int, amp: Int): Array[Byte] = {
    val dataLen = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1)                  // PCM
    bb.putShort(1)                  // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)       // byte rate
    bb.putShort(2)                  // block align
    bb.putShort(16)                 // bits per sample
    bb.put("data".getBytes); bb.putInt(dataLen)
    var i = 0
    while (i < frames) {
      bb.putShort((if ((i & 8) == 0) amp else -amp).toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic solid-color PNG via the JDK encoder (tests + oracles: the
    * decode path then recovers exactly this geometry and color). */
  def syntheticPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /**
   * STUB decode/feature-extract for VIDEO payloads: deterministic
   * pseudo-features from the payload bytes (no video codec libs in the JDK or
   * this container). Images ([[imageMeta]]) and PCM audio ([[audioMeta]]) have
   * real decode paths above.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    // null-tolerant like every real decoder above ([[imageInfo]]/[[audioInfo]]
    // both degrade on null/junk): a single null payload row must not kill the
    // whole feature-extraction job
    val bytes = if (payload == null) Array.emptyByteArray else payload
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
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
   *
   * STUB-BACKED for every kind: features come from [[decodeStub]]'s
   * deterministic payload hash, including image/audio rows — this operator
   * demonstrates the distributed plumbing (schema, batching, partitioning) a
   * real embedding model would slot into. For real decoded METADATA use
   * [[imageMeta]]/[[audioMeta]] (JDK decoders).
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
  def sampleFrames(media: DataFrame, everyMs: Long,
                   maxFramesPerMedia: Int = 100000): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs") // sequence(step=0) throws per task
    require(maxFramesPerMedia > 0, s"maxFramesPerMedia must be positive, got $maxFramesPerMedia")
    // clamp the fan-out: ONE corrupt metadata row (durationMs in nanos) would
    // otherwise make sequence() materialize billions of elements and kill the
    // scan — corrupt inputs degrade, per the module contract
    val clampedEnd = least(col("meta.durationMs"),
      lit(everyMs) * lit(maxFramesPerMedia.toLong)) - 1
    media
      .where(col("meta.kind") === "video" && col("meta.durationMs") > 0)
      // hash the payload ONCE per media row BEFORE the explode: carrying the
      // full binary through it copied + re-hashed the whole payload per frame
      // (a 10MB video at 240 frames = ~2.4GB of row buffer for 16B of signal)
      .select(col("meta.mediaId").as("media_id"),
        xxhash64(col("payload"), col("meta.mediaId")).as("payload_hash"),
        explode(sequence(lit(0L), clampedEnd, lit(everyMs))).as("frame_ts_ms"))
      // the frame timestamp must feed the hash (post-explode), or every frame of
      // a video carries the SAME stub and per-frame downstream logic sees no variation
      .select(col("media_id"), col("frame_ts_ms"),
        xxhash64(col("payload_hash"), col("frame_ts_ms")).as("frame_stub_hash"))
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
