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

  /** The engine's deterministic near-dup plant (Multimodal.plantedText),
    * mirrored for the symbolic path. */
  private def planted(id: Long, text: String): String =
    if (id % 96 == 0) "a" * 192
    else if (id % 96 == 48) "zzz" + "a" * 189
    else text

  test("census through the real BMP codec equals the symbolic hash on the fixture") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val expected = docs
      .map { case (id, t) =>
        (id, aHash(planted(id, t), 8 + (id % 24).toInt, 8 + (id % 16).toInt).toSeq) }
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
    // ids 24/72/120/168 (≡ 24 mod 48, OUTSIDE the engine's ≡0/48 mod 96
    // plant classes) render 8×16 rasters: grid cell i samples raster
    // row 2·(i/8) (NN downsample skips the odd rows), col i%8, so a
    // 384-char text whose 24-char raster rows alternate controls each
    // grid cell independently.
    val base = "z" * 192 + "a" * 192          // cells 0..31 bright, 32..63 dark
    val near = "aaa" + base.substring(3)      // cell 0 flipped dark -> Hamming 1
    val far = ("a" * 24) + base.substring(24) // cells 0..7 flipped -> Hamming 8
    val rows = Seq(
      (24L, base, "en", "s", 0L), (72L, near, "en", "s", 0L),
      (120L, far, "en", "s", 0L), (168L, base, "en", "s", 0L), // exact dup of 24
      // the engine plant: text here is arbitrary — phashReps overrides it
      (0L, "organic text the plant must replace", "en", "s", 0L),
      (48L, "likewise", "en", "s", 0L),
      (1L, base, "en", "s", 0L), (2L, base, "en", "s", 0L))    // audio/video: excluded
    val tmp = java.nio.file.Files.createTempDirectory("phash_docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // construction sanity via the symbolic path (8×16 dims)
    val (fb, fn, ff) = (aHash(base, 8, 16), aHash(near, 8, 16), aHash(far, 8, 16))
    assert(ham(fb, fn) === 1L)
    assert(ham(fb, ff) > 3L)
    // the plant classes sit far from the quartet fingerprints
    val (fa, fz) = (aHash(planted(0L, ""), 8, 8), aHash(planted(48L, ""), 8, 8))
    assert(ham(fa, fz) === 1L)
    Seq(fb, fn, ff).foreach { f =>
      assert(ham(fa, f) > 3L && ham(fz, f) > 3L) }

    val census = Multimodal.phashCensus(spark, tmp).collect()
      .map(r => r.getLong(4) -> r.getLong(5)).toMap
    assert(census(24L) === 2L, s"exact dup of 24 did not collapse: $census")
    assert(!census.contains(168L) && !census.contains(1L) && !census.contains(2L))

    val pairs = Multimodal.phashDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pairs === Set((24L, 72L, 1L, 3L), (0L, 48L, 1L, 2L)),
      s"expected the quartet near pair + the engine's planted pair: $pairs")
  }

  test("the planted pair de-vacuates the gate row at the smallest SF") {
    // The r17 verdict's one zero-row gate entry: mm_phash_dedup must
    // return ≥1 pair at EVERY gate SF, so an any-bug-yields-empty
    // regression can no longer hash-match the oracle (the rel_except
    // lesson). sf0.001 has ids in both plant classes (6 ≡0, 5 ≡48 mod
    // 96), so the Hamming-1 rep pair must surface here.
    val pairs = Multimodal.phashDedup(spark, sf0001).collect()
    assert(pairs.nonEmpty, "mm_phash_dedup is vacuous at sf0.001")
    val plant = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 48L)
    assert(plant.isDefined, s"planted (0, 48) pair missing: ${pairs.toSeq}")
    assert(plant.get.getLong(2) === 1L)
    assert(plant.get.getLong(3) === 11L, // 6 + 5 exact-collapsed members
      s"plant clique should cover all 11 planted docs: ${plant.get}")
  }
}
