package graft

import org.apache.spark.sql.functions._

import graft.queries.Multimodal

/** Perceptual-hash image dedup: plain-Scala symbolic aHash (no codec —
  * the independent third path next to the Spark round-trip and the
  * DuckDB oracle), census equality on the live fixture, and a planted
  * base/near/far/exact-dup image quartet through the REAL BMP boundary. */
class PhashSpec extends SparkSpec {

  /** Symbolic aHash from (text, w, h): gray cell i = mean of the 3 bytes
    * at NN-sampled raster position; bit i = gray·64 > Σgray. */
  private def aHash(text: String, w: Int, h: Int): Array[Long] = {
    val bytes = text.getBytes("UTF-8")
    val tl = bytes.length
    val gray = (0 until 64).map { i =>
      val sy = (i / 8) * h / 8
      val sx = (i % 8) * w / 8
      val base = (sy * w + sx) * 3
      if (tl == 0) 0L
      else (0 until 3).map(c => (bytes((base + c) % tl) & 0xff).toLong).sum / 3
    }
    val s = gray.sum
    val blocks = new Array[Long](4)
    (0 until 64).foreach { i =>
      if (gray(i) * 64 > s) blocks(i / 16) |= 1L << (i % 16)
    }
    blocks
  }

  private def ham(a: Array[Long], b: Array[Long]): Long =
    (0 until 4).map(k => java.lang.Long.bitCount(a(k) ^ b(k)).toLong).sum

  test("census through the real BMP codec equals the symbolic hash on the fixture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val expected = docs
      .map { case (id, t) =>
        (id, aHash(t, 8 + (id % 24).toInt, 8 + (id % 16).toInt).toSeq) }
      .groupBy(_._2).map { case (fp, xs) => (xs.map(_._1).min, xs.length.toLong, fp) }
      .toSet
    val got = Multimodal.phashCensus(spark, sf0001).collect()
      .map(r => (r.getLong(4), r.getLong(5),
        Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
      .toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("planted quartet: exact dup collapses, near pair reported, far pair not") {
    import spark.implicits._
    // ids 0/48/96/144 all render 8x8 rasters (id%24==0, id%16==0), so
    // gray cell i reads text bytes 3i..3i+2 — each cell independently
    // controlled by a 192-char text.
    val base = "z" * 96 + "a" * 96            // cells 0..31 bright, 32..63 dark
    val near = "aaa" + base.substring(3)      // cell 0 flipped dark -> Hamming 1
    val far = ("a" * 24) + base.substring(24) // cells 0..7 flipped -> Hamming 8
    val rows = Seq(
      (0L, base, "en", "s", 0L), (48L, near, "en", "s", 0L),
      (96L, far, "en", "s", 0L), (144L, base, "en", "s", 0L), // exact dup of 0
      (1L, base, "en", "s", 0L), (2L, base, "en", "s", 0L))   // audio/video: excluded
    val tmp = java.nio.file.Files.createTempDirectory("phash_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // construction sanity via the symbolic path
    val (fb, fn, ff) = (aHash(base, 8, 8), aHash(near, 8, 8), aHash(far, 8, 8))
    assert(ham(fb, fn) === 1L)
    assert(ham(fb, ff) > 3L)

    val census = Multimodal.phashCensus(spark, tmp).collect()
      .map(r => r.getLong(4) -> r.getLong(5)).toMap
    assert(census(0L) === 2L, s"exact dup of 0 did not collapse: $census")
    assert(!census.contains(144L) && !census.contains(1L) && !census.contains(2L))

    val pairs = Multimodal.phashDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pairs === Set((0L, 48L, 1L, 3L)),
      s"expected exactly the near pair with clique 2+1: $pairs")
  }
}
