package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.Sketches

/** Sketch-family laws the oracle can't see:
  *
  *   - HLL partial-merge VALIDITY — the merged-daily-partials estimate
  *     must equal the one-shot whole-month estimate (merge losslessness
  *     is the property that makes the rollup pattern sound; the oracle
  *     only checks the band verdict).
  *   - CMS exactness without collisions, deliberate overestimation WITH
  *     one, and the min-rule recovering the tight row — planted ids
  *     whose grid positions are computed in plain Scala from the same
  *     Carter-Wegman arithmetic, no Spark in the expectation path.
  */
class SketchesSpec extends SparkSpec {

  /** Plain-Scala replica of the row hash in [[Sketches.cmsPositions]]. */
  private def pos(u: Long): Seq[(Int, Long)] = Sketches.CmsParams.map {
    case (i, a, b) => (i, ((a * (u % 2147483647L) + b) % 2147483647L) % 1024L)
  }

  private def writeEvents(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sk_events").toString
    rows.zipWithIndex.map { case ((u, rep), i) =>
      (i * 1000L + rep, Timestamp.valueOf("2024-01-01 00:00:00"), u, "view",
        1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("hll rollup: merged daily partials == one-shot monthly sketch") {
    val o = Tables.load(spark, sf0001, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        to_date(col("o_orderdate")).as("day"), col("o_custkey").as("c"))
    val merged = o.groupBy(col("month"), col("day"))
      .agg(hll_sketch_agg(col("c")).as("sk"))
      .groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val oneshot = o.groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("c"))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = oneshot.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty && m == s,
      s"partial-merge changed estimates: ${m.toSeq.diff(s.toSeq).take(5)}")
  }

  test("hll rollup: every month's estimate within the declared band") {
    val rows = Sketches.sketchRollup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), s"out of band: $r"))
  }

  test("cms: exact when collision-free, one-sided when planted collision") {
    // Probe ids are multiples of 7 (the entry's probe predicate). Find a
    // DISTURBER d (NOT a probe, so it has no row of its own) colliding
    // with probe 70 in row 0 only — its mass must inflate exactly the
    // cells it shares, and the min-rule must then recover probe 70's
    // estimate from an uncollided row. Deterministic arithmetic search.
    val base = 70L
    val d = (1L to 4000000L).find { u =>
      u % 7 != 0 && pos(u)(0) == pos(base)(0) &&
        (1 to 3).forall(i => pos(u)(i) != pos(base)(i))
    }.get
    // Other probes chosen collision-free against EVERYTHING present
    // (verified below, not assumed).
    val probes = Seq(7L, 14L, 21L, base)
    val all = probes :+ d
    for {
      a <- all; b <- all if a < b
      if !(a == base && b == d) && !(a == d && b == base)
    } assert(pos(a).intersect(pos(b)).isEmpty, s"unplanned collision $a/$b")

    val counts = Map(7L -> 3, 14L -> 5, 21L -> 2, base -> 4, d -> 9)
    val dir = writeEvents(all.flatMap(u => Seq.fill(counts(u))((u, 0L))
      .zipWithIndex.map { case ((uu, _), k) => (uu, k.toLong) }))
    val got = Sketches.cmsFreq(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == probes.toSet) // d filtered out: not ≡ 0 mod 7
    // Collision-free probes: estimate is EXACT.
    Seq(7L, 14L, 21L).foreach { u =>
      assert(got(u) == ((counts(u).toLong, counts(u).toLong, true)), s"$u: ${got(u)}")
    }
    // The collided probe: row 0 reads 4+9=13, rows 1..3 read 4 — the
    // min-rule recovers the exact count despite the planted collision.
    assert(got(base) == ((4L, 4L, true)))
  }

  test("cms: never underestimates on the live fixture") {
    val rows = Sketches.cmsFreq(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), s"undercount: $r"))
  }

  // ------------------------------------------------- quantile rollup

  /** Plain-Scala replica of the bottom-k hash (the md5/conv idiom). */
  private def qh(eventId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(eventId.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("quantile rollup: merge law holds, sampling is real, planted quantiles recovered") {
    import spark.implicits._
    // One type, one week, 7 days × ~714 rows = 5000 events; values are a
    // deterministic permutation of 1..5000, so the true pXX are known
    // and every estimate's population rank IS its value.
    val n = 5000
    val tmp = java.nio.file.Files.createTempDirectory("qr_events").toString
    val rows = (0 until n).map { i =>
      val day = i % 7
      (i.toLong, Timestamp.valueOf(f"2024-01-0${day + 1} 10:00:00"),
        i.toLong, "view", ((i * 2654435761L) % n + 1).toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val got = Sketches.quantileRollup(spark, tmp).collect()
    assert(got.length === 1)
    val r = got.head
    val (m, p50, p95) = (r.getAs[Long]("sample_n"),
      r.getAs[Double]("est_p50"), r.getAs[Double]("est_p95"))
    // Sampling genuinely trimmed: 5000 rows → exactly K kept.
    assert(m === 256L)
    assert(r.getAs[Long]("n") === n.toLong)
    assert(r.getAs[Long]("days_merged") === 7L)
    assert(r.getBoolean(7) && r.getBoolean(8), s"verdicts red: $r")

    // Plain-Scala re-derivation, BOTH levels: per-day bottom-K → union →
    // re-trim, and the direct one-level bottom-K over the whole week.
    // Bottom-k mergeability says the two sample SETS are identical, and
    // the catalog estimates equal the re-derived order statistics.
    val byDay = rows.groupBy(_._2).values.toSeq
    val twoLevel = byDay
      .flatMap(_.map(t => (qh(t._1), t._1, t._5)).sortBy(x => (x._1, x._2)).take(256))
      .sortBy(x => (x._1, x._2)).take(256)
    val oneLevel = rows.map(t => (qh(t._1), t._1, t._5))
      .sortBy(x => (x._1, x._2)).take(256)
    assert(twoLevel.toSet === oneLevel.toSet, "bottom-k merge law violated")
    val vals = twoLevel.map(_._3).sorted
    assert(p50 === vals(math.ceil(0.5 * 256).toInt - 1))
    assert(p95 === vals(math.ceil(0.95 * 256).toInt - 1))
    // Planted accuracy: values are 1..n, so rank fraction = value/n.
    assert(math.abs(p50 / n - 0.5) <= 3.5 * math.sqrt(0.25 / 256) + 1.0 / 256)
    assert(math.abs(p95 / n - 0.95) <= 3.5 * math.sqrt(0.0475 / 256) + 1.0 / 256)
  }

  test("quantile rollup: gate fixture verdicts green, tail weeks included") {
    val rows = Sketches.quantileRollup(spark, sf0001).collect()
    assert(rows.length === 25) // 5 types × 5 weeks (incl. the 2-day tail)
    rows.foreach { r =>
      assert(r.getBoolean(7) && r.getBoolean(8), s"out of band: $r")
    }
  }
}
