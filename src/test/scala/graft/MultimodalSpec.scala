package graft

import graft.multimodal.{ImageCodec, MediaPipeline}
import graft.multimodal.MediaPipeline.MediaRecord

/** The real codec pipeline: container round-trips, canonical-raster
  * ordering under BMP's bottom-up/BGR/padded storage, and the batched
  * mapPartitions stages preserving every record. */
class MultimodalSpec extends SparkSpec {

  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => (i % 251).toByte)

  test("BMP round-trip restores the canonical raster (flip + BGR + padding)") {
    // w=3 → rowSize 12 (3 bytes padding/row): exercises all three traps
    val w = 3; val h = 2
    val rgb = raster(w, h)
    val bmp = ImageCodec.encodeBmp(w, h, rgb)
    assert(bmp.length === 54 + 12 * h)
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    // stored bottom-up BGR: first stored pixel is source row 1 pixel 0,
    // blue channel first
    assert(bmp(54) === rgb((1 * w + 0) * 3 + 2))
    val d = ImageCodec.decode(bmp)
    assert(d.kind === "bmp" && d.width === w && d.height === h)
    assert(d.data.toSeq === rgb.toSeq)
  }

  test("PPM and WAV round-trip byte-exactly; decode dispatches on magic") {
    val w = 5; val h = 4
    val rgb = raster(w, h)
    val p = ImageCodec.decode(ImageCodec.encodePpm(w, h, rgb))
    assert(p.kind === "ppm" && p.width === w && p.height === h)
    assert(p.data.toSeq === rgb.toSeq)
    val samples = Array.tabulate(100)(i => (i * 7 % 256).toByte)
    val a = ImageCodec.decode(ImageCodec.encodeWav(samples))
    assert(a.kind === "wav" && a.width === 100 && a.height === 1)
    assert(a.data.toSeq === samples.toSeq)
    intercept[IllegalArgumentException] {
      ImageCodec.decode("not media".getBytes("UTF-8"))
    }
  }

  test("encodeMedia cycles text bytes through a real container per type") {
    val text = "abcd".getBytes("UTF-8")
    val img = MediaPipeline.encodeMedia(MediaRecord(0L, "image", text, 8, 8))
    val d = ImageCodec.decode(img.payload)
    assert(d.kind === "bmp" && d.width === 8 && d.height === 8)
    // raster byte j = text[j mod 4] — the oracle's prediction
    (0 until 3 * 64).foreach(j => assert(d.data(j) === text(j % 4)))
    val wav = MediaPipeline.encodeMedia(MediaRecord(1L, "audio", text, 8, 8))
    assert(ImageCodec.decode(wav.payload).data.length === 64)
    // empty text → zero raster, not a crash
    val empty = MediaPipeline.encodeMedia(
      MediaRecord(2L, "video", Array.empty[Byte], 8, 8))
    assert(ImageCodec.decode(empty.payload).data.forall(_ === 0))
  }

  test("nearest-neighbor resize matches the index formula; resample too") {
    val w = 16; val h = 12
    val rgb = raster(w, h)
    val out = ImageCodec.resizeRaster(w, h, rgb, 8, 8)
    assert(out.length === 192)
    for (ty <- 0 until 8; tx <- 0 until 8; c <- 0 until 3) {
      val expected = rgb(((ty * h / 8) * w + (tx * w / 8)) * 3 + c)
      assert(out((ty * 8 + tx) * 3 + c) === expected, s"($ty,$tx,$c)")
    }
    val s = Array.tabulate(100)(i => i.toByte)
    val rs = ImageCodec.resample(s, 64)
    (0 until 64).foreach(k => assert(rs(k) === s(k * 100 / 64)))
  }

  test("batched encode→decode preserves cardinality, ids, and dims") {
    val ds = MediaPipeline.encoded(MediaPipeline.mediaTable(spark, sf0001))
    val n = ds.count()
    val out = MediaPipeline.extractFeatures(ds)
    assert(out.count() === n)
    assert(out.select("media_id").distinct().count() === n)
    // decoded dims equal the metadata dims for images (real decode, not
    // metadata echo): join features back to the source records
    import spark.implicits._
    val src = MediaPipeline.mediaTable(spark, sf0001)
      .filter(_.media_type == "image")
      .map(r => (r.media_id, r.width, r.height)).toDF("media_id", "sw", "sh")
    val mismatched = out.filter($"media_type" === "image")
      .join(src, "media_id")
      .filter($"width" =!= $"sw" || $"height" =!= $"sh")
      .count()
    assert(mismatched === 0L)
  }

  test("fixture ASCII contract: every doc's UTF-8 byte length equals its char length") {
    // The mm_* oracles equate payload bytes with ascii(substr(text, i, 1))
    // and payload length with len(text) — valid ONLY while the documents
    // fixture is pure ASCII (one byte per char). Assert that contract
    // here at both gate SFs so a future multi-byte fixture fails loudly
    // in this test instead of as an opaque oracle hash mismatch
    // (ADVICE r12).
    import org.apache.spark.sql.functions._
    Seq(sf0001, "/root/testdata/sf0.01").foreach { dir =>
      val nonAscii = spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii === 0L, s"$dir has $nonAscii non-ASCII documents")
    }
  }

  test("frame sampling keeps exactly the even frames and detects frame swaps") {
    import MediaPipeline.VideoRecord
    val text = "framesample".getBytes("UTF-8")
    val w = 4; val h = 3; val p = 3 * w * h
    val v = MediaPipeline.encodeVideo(VideoRecord(0L, 5L, text, w, h))
    // the stream is 5 real back-to-back P6 frames with a CONTINUOUS
    // global raster: frame f byte j = text[(f*p + j) mod len]
    val frames = ImageCodec.decodePpmStream(v.payload)
    assert(frames.length === 5)
    frames.zipWithIndex.foreach { case (d, f) =>
      assert(d.width === w && d.height === h)
      (0 until p).foreach(j => assert(d.data(j) === text((f * p + j) % text.length)))
    }
    // sampler keeps f = 0, 2, 4 with global-position weights
    val s = MediaPipeline.sampleFrames(v)
    assert(s.n_sampled === 3L && s.total_bytes === v.payload.length.toLong)
    val expected = (0 until 5).filter(_ % 2 == 0).map { f =>
      (0 until p).map(j =>
        (f.toLong * p + j + 1) * (text((f * p + j) % text.length) & 0xff)).sum
    }.sum
    assert(s.sampled_check === expected)
    // the trap the global weighting exists for: swapping two KEPT
    // frames (0 and 4) preserves the byte multiset but not the fold —
    // a sampler that reads the right bytes from the wrong frames fails
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII").length
    val flen = hdr + p
    val swapped = v.payload.clone()
    (0 until flen).foreach { k =>
      swapped(k) = v.payload(4 * flen + k)
      swapped(4 * flen + k) = v.payload(k)
    }
    val s2 = MediaPipeline.sampleFrames(VideoRecord(0L, 5L, swapped, w, h))
    assert(s2.sampled_check !== s.sampled_check)
  }

  test("resize survives the binary boundary: thumbnail re-decodes to 8x8/64") {
    val resized = MediaPipeline.resize(
      MediaPipeline.encoded(MediaPipeline.mediaTable(spark, sf0001)))
    val dims = resized.collect().map { r =>
      val d = ImageCodec.decode(r.resized)
      (r.media_type, d.width, d.height)
    }
    assert(dims.nonEmpty)
    dims.foreach {
      case ("audio", w, h) => assert(w === 64 && h === 1)
      case (_, w, h) => assert(w === 8 && h === 8)
    }
  }
}
