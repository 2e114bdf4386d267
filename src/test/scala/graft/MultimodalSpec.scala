package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.{MediaRecord, MediaFeatures}

/** The stub decoder's byte arithmetic on known payloads, and the batched
  * mapPartitions stage preserving every record. */
class MultimodalSpec extends SparkSpec {

  test("decode stub: known payload arithmetic") {
    val r = MediaRecord(7L, "image", "abcd".getBytes("UTF-8"), 64, 64)
    val f = MediaPipeline.decodeStub(r)
    assert(f.n_bytes === 4L)
    assert(f.checksum === ('a' + 'b' + 'c' + 'd').toLong)
    assert(f.first_byte === 'a'.toInt)
    // stride = max(4/8, 1) = 1 => positions 1..8 clipped to 1..4 => avg of all
    assert(f.frame_avg === ('a' + 'b' + 'c' + 'd') / 4.0)
  }

  test("batched extraction preserves cardinality and ids (batch size 64)") {
    val ds = MediaPipeline.mediaTable(spark, sf0001)
    val n = ds.count()
    val out = MediaPipeline.extractFeatures(ds)
    assert(out.count() === n)
    assert(out.select("media_id").distinct().count() === n)
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

  test("resize stub: exact nearest-neighbor byte selection, cap respected") {
    // n <= cap: stride 1, payload passes through unchanged
    val small = MediaRecord(1L, "image", "abcd".getBytes("UTF-8"), 64, 64)
    assert(MediaPipeline.resizeStub(small).resized.toSeq === "abcd".getBytes("UTF-8").toSeq)
    // n > cap: stride = n/cap, every stride-th byte, exactly cap samples
    val big = MediaRecord(2L, "video",
      Array.tabulate(3000)(i => (i % 251).toByte), 64, 64)
    val r = MediaPipeline.resizeStub(big)
    assert(r.orig_bytes === 3000L)
    assert(r.resized.length === MediaPipeline.ResizeCap) // 1 + 1023*2 = 2047 <= 3000
    val stride = 3000L / MediaPipeline.ResizeCap // = 2
    (0 until MediaPipeline.ResizeCap).foreach { k =>
      assert(r.resized(k) === big.payload((k * stride).toInt),
        s"sample $k not the nearest-neighbor byte")
    }
    // the binary survives the Dataset boundary intact (plumbing, not
    // just arithmetic)
    import spark.implicits._
    val viaSpark = MediaPipeline.resize(Seq(big).toDS()).collect().head
    assert(viaSpark.resized.toSeq === r.resized.toSeq)
  }
}
