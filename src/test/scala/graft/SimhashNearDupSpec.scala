package graft

import java.security.MessageDigest

import graft.queries.LlmDedup

/** SimHash Hamming-ball near-dup: full brute-force re-derivation of the
  * 64-bit fingerprints AND the all-pairs Hamming join in plain Scala on
  * the live fixture (independent of Spark and of the DuckDB oracle — a
  * same-bug-both-engines defect in the vote/block arithmetic cannot hide
  * here), plus the pigeonhole recall law the block join relies on. */
class SimhashNearDupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Plain-Scala 64-bit term-frequency SimHash (mirrors the operator's
    * definition: bit j votes by bit (j%32) of the j<32 ? first : second
    * 32-bit half of md5(token); fingerprint bit = vote majority). */
  private def fingerprint(norm: String): Long = {
    val toks = norm.split(" ")
    val sums = new Array[Long](64)
    toks.foreach { t =>
      val h = md5hex(t)
      val v0 = java.lang.Long.parseLong(h.substring(0, 8), 16)
      val v1 = java.lang.Long.parseLong(h.substring(8, 16), 16)
      var j = 0
      while (j < 64) {
        val v = if (j < 32) v0 else v1
        sums(j) += (v >> (j % 32)) & 1L
        j += 1
      }
    }
    (0 until 64).map(j => if (2 * sums(j) > toks.length) 1L << j else 0L).sum
  }

  test("operator equals brute-force all-pairs Hamming<=3 over representatives") {
    // Exact-dup representative collapse, as the operator defines it.
    val reps = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.replaceAll("\\s+", " "))
      .groupBy(_._2).map { case (norm, xs) => xs.map(_._1).min -> norm }.toArray

    val fps = reps.map { case (id, norm) => id -> fingerprint(norm) }.sortBy(_._1)

    // The block-bucket cap must be quiet on this fixture, else the brute
    // force below would need the cap's recall contract applied.
    val buckets = scala.collection.mutable.Map[(Int, Long), Int]()
    fps.foreach { case (_, fp) =>
      (0 until 4).foreach { k =>
        val key = (k, (fp >> (16 * k)) & 0xffffL)
        buckets(key) = buckets.getOrElse(key, 0) + 1
      }
    }
    assert(buckets.values.max <= 256, "fixture tripped SimBucketCap; spec assumes it quiet")

    val expected = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      d = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if d <= LlmDedup.SimHamMax
    } yield (fps(i)._1, fps(j)._1, d.toLong)).toSet

    val got = LlmDedup.simhashNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got === expected,
      s"missing=${expected.diff(got)} extra=${got.diff(expected)}")
    // non-vacuity: the fixture's near-dup families actually produce pairs
    assert(expected.nonEmpty, "fixture produced no Hamming<=3 pairs")
  }

  test("pigeonhole: any 64-bit pair within Hamming 3 agrees on a 16-bit block") {
    // The recall law the block join rests on, checked over a seeded sweep
    // of adversarial bit-flip placements (all C(64,3) flips is 41k — run
    // them all; d<=2 are subsets of d=3 flips plus the trivial cases).
    val rnd = new scala.util.Random(42)
    val base = rnd.nextLong()
    val flips = for {
      a <- 0 until 64; b <- a until 64; c <- b until 64
    } yield (1L << a) | (1L << b) | (1L << c)
    flips.foreach { m =>
      val other = base ^ m
      val sharesBlock = (0 until 4).exists(k =>
        ((base >> (16 * k)) & 0xffffL) == ((other >> (16 * k)) & 0xffffL))
      assert(sharesBlock, f"flip mask $m%016x defeats the 4-block pigeonhole")
    }
  }
}
