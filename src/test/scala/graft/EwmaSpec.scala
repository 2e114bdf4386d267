package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.EventOps

/** EWMA trend smoothing: plain-Scala re-derivation on the live fixture
  * (independent loop, not the SQL window), the dense-fill law (gap days
  * appear with count 0), and the impulse-response law (after the warmup
  * band a lone spike decays by exactly 1/2 per day — α = 1/2). */
class EwmaSpec extends SparkSpec {

  /** Independent reference: truncated 14-tap exponential smoothing over
    * a dense daily count vector. */
  private def ref(counts: Seq[Long]): Seq[Double] =
    counts.indices.map { t =>
      val taps = (0 until 14).flatMap { k =>
        val i = t - k
        if (i >= 0) Some((counts(i), 1L << (13 - k))) else None
      }
      val num = taps.map { case (x, w) => x * w }.sum.toDouble
      val den = taps.map(_._2).sum.toDouble
      math.floor(num / den * 1e6 + 0.5) / 1e6
    }

  test("operator equals the independent dense-vector reference on the fixture") {
    val rows = EventOps.ewmaSmooth(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byType = rows.groupBy(_._1)
    assert(byType.size > 1, "fixture has a single event type — spec vacuous")
    byType.foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_._2)
      // spine is contiguous: every calendar day between min and max present
      val days = sorted.map(_._2)
      val lo = java.time.LocalDate.parse(days.head)
      val hi = java.time.LocalDate.parse(days.last)
      assert(days.length === java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1,
        s"$tpe spine has holes")
      val expected = ref(sorted.map(_._3))
      sorted.map(_._4).zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(got === exp, s"$tpe day ${days(i)}: $got != $exp")
      }
    }
  }

  test("planted gap and impulse: dense fill + exact halving decay") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def day(d: Int) = new Timestamp(base + d * 86400000L)
    // type "imp": 16 events on day 0, then silence through day 20 —
    // days 1..20 exist only via the dense fill.
    val events = (1 to 16).map(i =>
      (i.toLong, day(0), 1L, "imp", 1.0, "{}")) :+
      ((99L, day(20), 1L, "imp", 1.0, "{}")) // pins the spine extent
    val tmp = java.nio.file.Files.createTempDirectory("ewma_events").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.ewmaSmooth(spark, tmp).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 21, s"dense spine should hold 21 days, got ${got.size}")
    // gap days are present with zero raw count
    assert(got("2024-01-05")._1 === 0L)
    // impulse decay: within the full-mass band (day 13 is the last tap
    // that still sees the spike; ewma_13 = 16*1/16383), each step t->t+1
    // in days 1..13 multiplies the spike weight by exactly 1/2 while the
    // warmup mass grows — check against the closed form instead of ratios.
    (0 to 13).foreach { t =>
      val den = ((13 - t) to 13).map(1L << _).sum // mass of taps 0..t
      val exp = math.floor(16.0 * (1L << (13 - t)) / den * 1e6 + 0.5) / 1e6
      assert(got(f"2024-01-${t + 1}%02d")._2 === exp,
        s"day offset $t: ${got(f"2024-01-${t + 1}%02d")._2} != $exp")
    }
    // beyond the horizon the spike is forgotten entirely
    assert(got("2024-01-16")._2 === 0.0)
  }

  // ---- Holt linear-trend smoothing ----

  /** Independent plain-Scala replica of the Holt integer recursion
    * (Java / truncates toward zero — the div semantics both engines
    * share). */
  private def holtRef(counts: Seq[Long]): Seq[(Long, Long, Long)] = {
    val S = 1000000L
    counts.tail.scanLeft((counts.head * S, 0L, 0L)) { case ((l, b, _), x) =>
      val l2 = (x * S + l + b) / 2
      ((l2, (l2 - l + 3 * b) / 4, x * S - (l + b)))
    }
  }

  test("holt: operator equals the independent integer recursion on the fixture") {
    val rows = EventOps.holtTrend(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
    val byType = rows.groupBy(_._1)
    assert(byType.size > 1)
    byType.foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_._2)
      val expected = holtRef(sorted.map(_._3))
      sorted.map(_._4).zip(expected).zipWithIndex.foreach { case ((got, exp), i) =>
        assert(got === exp, s"$tpe index $i: $got != $exp")
      }
    }
  }

  test("holt: constant series is a fixpoint; linear ramp converges to its slope") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-02-01 12:00:00").getTime
    def day(d: Int) = new Timestamp(base + d * 86400000L)
    // type "flat": 8 events every day for 30 days — l must sit at 8e6
    // with b = 0 and err = 0 from day 1 (exact fixpoint of the
    // recursion, no ramp-in: l_1 = x·S, b_1 = 0 already solve it).
    // type "ramp": d+1 events on day d — after the warmup the trend
    // state must approach the true slope 1e6/day.
    val events =
      (0 until 30).flatMap(d => (1 to 8).map(i =>
        ((d * 100 + i).toLong, day(d), 1L, "flat", 1.0, "{}"))) ++
      (0 until 30).flatMap(d => (1 to d + 1).map(i =>
        ((10000 + d * 100 + i).toLong, day(d), 1L, "ramp", 1.0, "{}")))
    val tmp = java.nio.file.Files.createTempDirectory("holt_events").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = EventOps.holtTrend(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toSeq
    val flat = got.filter(_._1 == "flat").sortBy(_._2).map(_._3)
    assert(flat.length === 30)
    flat.foreach { case (l, b, e) =>
      assert(l === 8000000L && b === 0L && e === 0L, s"flat drifted: ($l, $b, $e)")
    }
    val ramp = got.filter(_._1 == "ramp").sortBy(_._2).map(_._3)
    // independent reference agrees exactly...
    assert(ramp === holtRef((1 to 30).map(_.toLong)))
    // ...and the learned trend is within 5% of the true 1e6/day slope
    // by day 30 (EWMA has no trend state at all — this is the point).
    val bLast = ramp.last._2
    assert(math.abs(bLast - 1000000L) <= 50000L, s"trend off: $bLast")
    // one-step residual shrinks once the trend is learned: late-window
    // max |err| under a third of the early-window max.
    val errs = ramp.map(_._3.abs)
    assert(errs.slice(20, 30).max * 3 <= math.max(errs.slice(1, 6).max, 1L),
      s"residuals did not shrink: $errs")
  }
}
