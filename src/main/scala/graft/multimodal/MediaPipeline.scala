package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: image/audio/video treated as opaque
  * `BINARY` payloads with typed metadata, processed in BATCHES inside
  * `mapPartitions` — the Scala/Dataset analog of a Pandas UDF over
  * `mapInPandas`: per-partition iterator, explicit batch shape, typed
  * row in / typed row out, no per-row serialization boundary.
  *
  * The decode step is REAL: payloads are genuine media containers —
  * 24-bit BMP for images, binary PPM (P6) for video frames, PCM WAV for
  * audio — encoded and decoded by the pure-JVM [[ImageCodec]] (no codec
  * libraries ship in this container, so the formats are the simple
  * uncompressed ones; the pipeline shape is what a JPEG/MP4 decoder
  * would drop into unchanged). The containers are synthesized
  * deterministically from the `documents` text, so the DuckDB oracle
  * can predict the DECODED raster from first principles: any decoder
  * bug — a forgotten BMP row flip, BGR swap, or padding skip — shows up
  * as an order-sensitive checksum mismatch, not a silent pass.
  *
  * Scale: `mapPartitions` keeps encode/decode/resize batched and local
  * (one task per input split); features are narrow, so the only shuffle
  * is the final small aggregation.
  */
object MediaPipeline {

  /** Typed media record: opaque payload + metadata (SURVEY §1.2 "binary
    * columns with typed metadata"). `width`/`height` are the SOURCE
    * dimensions the encoder renders at (for audio: width·height =
    * sample count). */
  case class MediaRecord(media_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int)

  /** Decoder output: container size plus the DECODED geometry and two
    * raster folds — `pixel_sum` (order-insensitive) and `raster_check`
    * (Σ (j+1)·byte_j over the canonical raster order — the fold that
    * catches a right-multiset-wrong-order decode). */
  case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, width: Int, height: Int,
      pixel_sum: Long, raster_check: Long)

  val BatchSize = 64

  /** Source records from `documents`: the text bytes are the pixel
    * source, dims derived from the id (small enough that a row's
    * container stays a few KiB). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    mediaTable(spark, dir, col("text"))

  /** [[mediaTable]] with the pixel-source column overridden — lets a
    * consumer (the pHash dedup family) plant deterministic fixtures by
    * doc_id class without perturbing the other media entries' oracles. */
  def mediaTable(spark: SparkSession, dir: String,
      text: org.apache.spark.sql.Column): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        text.cast("binary").as("payload"),
        (lit(8) + col("doc_id") % 24).cast("int").as("width"),
        (lit(8) + col("doc_id") % 16).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** Render one record's payload into its real container: the text
    * bytes cycle through the raster (byte j = text[j mod len], 0 when
    * empty), then image→BMP, video→PPM, audio→WAV. */
  def encodeMedia(r: MediaRecord): MediaRecord = {
    val n = if (r.media_type == "audio") r.width * r.height
      else 3 * r.width * r.height
    val src = r.payload
    val px = new Array[Byte](n)
    var j = 0
    while (j < n) {
      px(j) = if (src.length > 0) src(j % src.length) else 0
      j += 1
    }
    val container = r.media_type match {
      case "image" => ImageCodec.encodeBmp(r.width, r.height, px)
      case "video" => ImageCodec.encodePpm(r.width, r.height, px)
      case _ => ImageCodec.encodeWav(px)
    }
    r.copy(payload = container)
  }

  /** The batched encode stage: after this, `payload` is a real BMP/PPM/
    * WAV container — the state a crawled corpus would arrive in. */
  def encoded(ds: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(encodeMedia)))
  }

  /** REAL decode: parse the container ([[ImageCodec.decode]]), fold the
    * canonical raster. */
  def decodeMedia(r: MediaRecord): MediaFeatures = {
    val d = ImageCodec.decode(r.payload)
    var s = 0L; var wsum = 0L; var j = 0
    while (j < d.data.length) {
      val b = d.data(j) & 0xff
      s += b; wsum += (j + 1).toLong * b
      j += 1
    }
    MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
      d.width, d.height, s, wsum)
  }

  /** Batched feature extraction: the mapInPandas-shaped stage. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(decodeMedia)))
  }

  /** Resize output: the thumbnail STAYS a binary column in the SAME
    * container format (the next pipeline stage — thumbnailing,
    * embedding — consumes bytes, not summaries), plus the audit
    * numbers. */
  case class ResizedMedia(media_id: Long, media_type: String,
      orig_bytes: Long, resized: Array[Byte])

  /** Thumbnail geometry: 8×8 for images/frames, 64 samples for audio. */
  val ThumbW = 8
  val ThumbH = 8
  val AudioResamples = 64

  /** REAL resize: decode the container, nearest-neighbor downsample the
    * raster ([[ImageCodec.resizeRaster]] / [[ImageCodec.resample]]),
    * re-encode into the same container format. */
  def resizeMedia(r: MediaRecord): ResizedMedia = {
    val d = ImageCodec.decode(r.payload)
    val out = d.kind match {
      case "bmp" => ImageCodec.encodeBmp(ThumbW, ThumbH,
        ImageCodec.resizeRaster(d.width, d.height, d.data, ThumbW, ThumbH))
      case "ppm" => ImageCodec.encodePpm(ThumbW, ThumbH,
        ImageCodec.resizeRaster(d.width, d.height, d.data, ThumbW, ThumbH))
      case _ => ImageCodec.encodeWav(ImageCodec.resample(d.data, AudioResamples))
    }
    ResizedMedia(r.media_id, r.media_type, r.payload.length.toLong, out)
  }

  /** Batched resize: same mapInPandas-shaped stage as
    * [[extractFeatures]] — per-partition iterator, explicit batches,
    * no shuffle. */
  def resize(ds: Dataset[MediaRecord]): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(resizeMedia)))
  }

  // ---- Perceptual hashing ----

  /** 64-bit average-hash, carried as four 16-bit blocks (b0..b3, the
    * [[graft.queries.LlmDedup.simhashNearDup]] pigeonhole convention —
    * non-negative ints, no 64-bit sign traps in either engine). */
  case class MediaHash(media_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** aHash (average hash — the classic perceptual image fingerprint):
    * decode the REAL container, nearest-neighbor 8×8 downsample of the
    * canonical raster (the [[resizeMedia]] mapping), integer grayscale
    * (r+g+b)/3 per cell, bit i = cell i brighter than the 64-cell mean.
    * The mean compare is exact integer arithmetic (gray·64 > Σgray) —
    * no float anywhere, so the oracle predicts every bit from
    * (doc_id, text) alone. */
  def aHashMedia(r: MediaRecord): MediaHash = {
    val d = ImageCodec.decode(r.payload)
    val gray = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val sy = (i / 8) * d.height / 8
      val sx = (i % 8) * d.width / 8
      val base = (sy * d.width + sx) * 3
      gray(i) = ((d.data(base) & 0xff) + (d.data(base + 1) & 0xff) +
        (d.data(base + 2) & 0xff)) / 3
      i += 1
    }
    val s = gray.sum
    val blocks = new Array[Long](4)
    i = 0
    while (i < 64) {
      if (gray(i) * 64 > s) blocks(i / 16) |= 1L << (i % 16)
      i += 1
    }
    MediaHash(r.media_id, blocks(0), blocks(1), blocks(2), blocks(3))
  }

  /** Batched perceptual hashing — the same mapInPandas-shaped stage as
    * [[extractFeatures]]. */
  def aHashes(ds: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(aHashMedia)))
  }

  // ---- Video frame sampling ----

  /** A multi-frame video: `payload` is a concatenated-P6 stream
    * (`n_frames` frames of `width`×`height`), the raw-video convention
    * real pipelines get from `ffmpeg -c:v ppm`. */
  case class VideoRecord(media_id: Long, n_frames: Long,
      payload: Array[Byte], width: Int, height: Int)

  /** Frame-sample output: container size plus the fold over the KEPT
    * frames only, weighted by GLOBAL raster position (frame·P + j + 1)
    * so sampling the wrong frames — not just decoding them wrong — is
    * order-sensitive too. */
  case class SampledFrames(media_id: Long, n_frames: Long,
      total_bytes: Long, n_sampled: Long, sampled_check: Long)

  /** Keep every 2nd frame (0, 2, 4, …) — the `ffmpeg -vf fps=` shape. */
  val FrameStride = 2

  /** Video source rows: the `documents` rows the media table types as
    * video, with a deterministic 2–6 frame count so the oracle can
    * predict the stream layout. */
  def videoTable(spark: SparkSession, dir: String): Dataset[VideoRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(
        col("doc_id").as("media_id"),
        (lit(2) + col("doc_id") % 5).as("n_frames"),
        col("text").cast("binary").as("payload"),
        (lit(8) + col("doc_id") % 24).cast("int").as("width"),
        (lit(8) + col("doc_id") % 16).cast("int").as("height"))
      .as[VideoRecord]
  }

  /** Render the text bytes into a real multi-frame stream: global
    * raster byte g = text[g mod len] runs CONTINUOUSLY across frames
    * (frame f covers g ∈ [f·P, (f+1)·P), P = 3wh), each frame encoded
    * as its own P6 container back-to-back. */
  def encodeVideo(r: VideoRecord): VideoRecord = {
    val p = 3 * r.width * r.height
    val src = r.payload
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < r.n_frames) {
      val px = new Array[Byte](p)
      var j = 0
      while (j < p) {
        val g = f * p + j
        px(j) = if (src.length > 0) src(g % src.length) else 0
        j += 1
      }
      out.write(ImageCodec.encodePpm(r.width, r.height, px))
      f += 1
    }
    r.copy(payload = out.toByteArray)
  }

  def encodedVideo(ds: Dataset[VideoRecord]): Dataset[VideoRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(encodeVideo)))
  }

  /** REAL frame sampling: walk the concatenated-P6 stream
    * ([[ImageCodec.decodePpmStream]]), keep frames f ≡ 0 (mod
    * [[FrameStride]]), fold Σ (f·P + j + 1)·byte over the kept rasters.
    * A stream walker that mis-advances past a frame boundary, or a
    * sampler that keeps the wrong frames, shifts the global weights and
    * hash-fails. */
  def sampleFrames(r: VideoRecord): SampledFrames = {
    val frames = ImageCodec.decodePpmStream(r.payload)
    require(frames.length == r.n_frames,
      s"stream decoded ${frames.length} frames, expected ${r.n_frames}")
    var check = 0L
    var kept = 0L
    frames.zipWithIndex.foreach { case (d, f) =>
      if (f % FrameStride == 0) {
        kept += 1
        val base = f.toLong * d.data.length
        var j = 0
        while (j < d.data.length) {
          check += (base + j + 1) * (d.data(j) & 0xff)
          j += 1
        }
      }
    }
    SampledFrames(r.media_id, r.n_frames, r.payload.length.toLong, kept, check)
  }

  /** Batched frame sampling — same mapInPandas shape, no shuffle. */
  def frameSample(ds: Dataset[VideoRecord]): Dataset[SampledFrames] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(sampleFrames)))
  }
}
