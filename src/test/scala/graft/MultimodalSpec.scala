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
}
