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
}
