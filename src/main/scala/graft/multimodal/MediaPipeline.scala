package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: image/audio/video treated as opaque
  * `BINARY` payloads with typed metadata, processed in BATCHES inside
  * `mapPartitions` — the Scala/Dataset analog of a Pandas UDF over
  * `mapInPandas`: per-partition iterator, explicit batch shape, typed
  * row in / typed row out, no per-row serialization boundary.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (no codec
  * libraries ship in this container): it derives features from the raw
  * bytes. Everything around it — the schema, the binary column, batch
  * iteration, partitioning, the feature schema, the aggregation — is the
  * real plumbing a codec-backed decoder would drop into.
  *
  * Scale: `mapPartitions` keeps the decode batched and local (one task
  * per input split); features are narrow, so the only shuffle is the
  * final small aggregation.
  */
object MediaPipeline {

  /** Typed media record: opaque payload + metadata (SURVEY §1.2 "binary
    * columns with typed metadata"). */
  case class MediaRecord(media_id: Long, media_type: String,
      payload: Array[Byte], width: Int, height: Int)

  /** Decoder output (what a real image/audio decode would emit). */
  case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, checksum: Long, first_byte: Int, frame_avg: Double)

  val BatchSize = 64

  /** Synthesize the media table deterministically from `documents`: the
    * text bytes act as the opaque payload (ASCII, so byte k == char k). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"),
        (lit(64) + col("doc_id") % 512).cast("int").as("width"),
        (lit(64) + col("doc_id") % 256).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** STUB decode — deterministic fake standing in for a codec call. A
    * real implementation would decode `payload` (JPEG/WAV/MP4) here; the
    * signature, batching, and feature schema would not change. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    var checksum = 0L
    var i = 0
    while (i < r.payload.length) { checksum += (r.payload(i) & 0xff); i += 1 }
    val stride = math.max(n / 8, 1L)
    // "frame sampling": probe 8 evenly-strided bytes (what a video
    // frame-sampler would do per keyframe).
    var sampleSum = 0L; var samples = 0
    var k = 0L
    while (k < 8) {
      val pos = 1 + k * stride
      if (pos <= n) { sampleSum += (r.payload((pos - 1).toInt) & 0xff); samples += 1 }
      k += 1
    }
    MediaFeatures(r.media_id, r.media_type, n, checksum,
      if (n > 0) r.payload(0) & 0xff else -1,
      if (samples > 0) sampleSum.toDouble / samples else 0.0)
  }

  /** Batched feature extraction: the mapInPandas-shaped stage. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(decodeStub)))
  }

  /** Resize output: the downsampled payload STAYS a binary column (the
    * next pipeline stage — thumbnailing, embedding — consumes bytes,
    * not summaries), plus the audit numbers. */
  case class ResizedMedia(media_id: Long, media_type: String,
      orig_bytes: Long, resized: Array[Byte])

  /** Resize target: cap the payload at this many samples (the 1-D
    * stand-in for a 32×32 thumbnail's 1024 pixels). */
  val ResizeCap = 1024

  /** STUB resize — nearest-neighbor downsample over the raw bytes:
    * sample positions 1, 1+stride, 1+2·stride, … (1-based, stride =
    * max(n/cap, 1)), keeping at most [[ResizeCap]] samples. A real
    * implementation would hand the batch to an image scaler (the
    * mapInPandas analog: PIL `resize` per batch row); the batching,
    * binary-in/binary-out schema, and metadata update are the real
    * plumbing it would drop into. */
  def resizeStub(r: MediaRecord): ResizedMedia = {
    val n = r.payload.length.toLong
    val stride = math.max(n / ResizeCap, 1L)
    val out = new java.io.ByteArrayOutputStream()
    var k = 0L
    while (k < ResizeCap) {
      val pos = 1 + k * stride
      if (pos <= n) out.write(r.payload((pos - 1).toInt))
      k += 1
    }
    ResizedMedia(r.media_id, r.media_type, n, out.toByteArray)
  }

  /** Batched resize: same mapInPandas-shaped stage as
    * [[extractFeatures]] — per-partition iterator, explicit batches,
    * no shuffle. */
  def resize(ds: Dataset[MediaRecord]): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(resizeStub)))
  }
}
