package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edge semantics of the event operators that the cross-engine oracle
  * can't distinguish (both engines would share a wrong boundary). */
class EventOpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: clicks with no prior view match null; later views don't leak back") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click"), // before any view -> null
      (2L, ts("2024-01-01 10:30:00"), 7L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 7L, "click"), // matches view 2
      (4L, ts("2024-01-01 11:30:00"), 7L, "view"),
      (5L, ts("2024-01-01 12:00:00"), 7L, "click")) // matches view 4 (latest)
      .toDF("event_id", "ts", "user_id", "event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ev.withColumn("mv",
        last(when($"event_type" === "view", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "click")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out === Map(1L -> -1L, 3L -> 2L, 5L -> 4L))
  }

  test("sessionize: exactly-30min gap stays in session; 30min+1us starts a new one") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00.000000"), 7L),
      (2L, ts("2024-01-01 10:30:00.000000"), 7L), // exactly 30min -> same
      (3L, ts("2024-01-01 11:00:00.000001"), 7L)) // 30min + 1us -> new
      .toDF("event_id", "ts", "user_id")
    val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros($"ts")
    val isNew = when(lag(us, 1).over(order).isNull ||
      us - lag(us, 1).over(order) > 1800L * 1000000L, 1L).otherwise(0L)
    val sessions = ev.withColumn("sid", sum(isNew).over(run))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(sessions === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("funnel: stage gating respects event order and strict inequality") {
    import spark.implicits._
    // Tables.load("events") expects ts as epoch-NANOS long (the testdata
    // parquet convention) and rebuilds a microsecond timestamp.
    val h = 3600L * 1000000000L
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_ev").toString
    Seq(
      (1L, 10 * h, 1L, "view"), (2L, 11 * h, 1L, "click"), (3L, 12 * h, 1L, "purchase"),
      (4L, 10 * h, 2L, "view"), (5L, 11 * h, 2L, "click"), // no purchase -> 2
      (6L, 10 * h, 3L, "view"), // view only -> 1
      (7L, 10 * h, 4L, "click"), (8L, 11 * h, 4L, "purchase"), // no view -> 0
      // purchase BEFORE the click must not convert: order matters -> 2
      (9L, 9 * h, 5L, "purchase"), (10L, 10 * h, 5L, "view"), (11L, 11 * h, 5L, "click"),
      // click at the SAME instant as the first view: strict > -> 1
      (12L, 10 * h, 6L, "view"), (13L, 10 * h, 6L, "click"),
      // click 30h after the view: outside the 24h step window -> 1
      (14L, 10 * h, 7L, "view"), (15L, 40 * h, 7L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.EventOps.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("retention: cohort by first signup week, pre-signup and signup-less excluded") {
    import spark.implicits._
    // Epoch-day arithmetic (not Timestamp.valueOf) so the fixture is
    // JVM-default-timezone-proof: day 19723 = Monday 2024-01-01 UTC.
    val d0 = 19723L
    def ns(day: Long) = (day * 24 + 12) * 3600L * 1000000000L // noon UTC
    val dir = java.nio.file.Files.createTempDirectory("graft_retention_ev").toString
    Seq(
      (1L, ns(d0 - 3), 1L, "view"), // BEFORE u1's cohort week -> excluded
      (2L, ns(d0 + 1), 1L, "signup"), // cohort = week of 2024-01-01
      (3L, ns(d0 + 8), 1L, "click"), // next week -> offset 1
      (4L, ns(d0 + 7), 2L, "signup"), // cohort = week of 2024-01-08
      (5L, ns(d0), 3L, "click")) // never signs up -> no cohort
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.EventOps.retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 1L, // u1 active in cohort week (the signup)
      ("2024-01-01", 1L) -> 1L, // u1 active the week after
      ("2024-01-08", 0L) -> 1L)) // u2 active in its own cohort week
  }

  test("approx percentiles track the exact ones within sketch accuracy") {
    // The scale companion (bounded mergeable-sketch state) must agree
    // with the exact form on real data. The rank-band contract (approx
    // p50/p95 between the exact ±2-rank-point quantiles) now lives IN
    // the query as boolean verdict columns the DuckDB oracle
    // hash-compares against literal TRUE; this spec pins the verdicts
    // and the group spine against an independent exact recount.
    import org.apache.spark.sql.functions._
    val exact = Tables.load(spark, sf0001, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.queries.EventOps.approxPercentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet === exact.keySet && exact.nonEmpty)
    exact.foreach { case (et, n) =>
      val (na, in50, in95) = got(et)
      assert(na === n)
      assert(in50, s"$et p50 outside the exact 0.48..0.52 rank band")
      assert(in95, s"$et p95 outside the exact 0.93..0.97 rank band")
    }
  }

  test("rolling 7-day active users equals the naive per-day window count") {
    import spark.implicits._
    // brute force over collected (user, day) pairs — sf0.001 is small
    val ud = Tables.load(spark, sf0001, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val expect = days.map { d =>
      d.toString -> ud.filter { case (_, ad) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
    }.toMap
    val got = graft.queries.EventOps.activeUsers7d(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect && got.nonEmpty)
  }

  test("ranged active users: ts bounds reach the parquet scan; slice-relative windows") {
    import spark.implicits._
    // pick a [from, to] straddling the middle of the data extent
    val ext = Tables.load(spark, sf0001, "events")
      .agg(to_date(org.apache.spark.sql.functions.min($"ts")),
        to_date(org.apache.spark.sql.functions.max($"ts"))).head
    val (lo, hi) = (ext.getDate(0).toLocalDate, ext.getDate(1).toLocalDate)
    val from = Some(lo.plusDays(3)); val to = Some(hi.minusDays(3))
    val df = graft.queries.EventOps.activeUsers7d(spark, sf0001, from, to)
    val scans = PlanTestUtil.deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(p => p.contains("ts")
        && p.contains("GreaterThanOrEqual") && p.contains("LessThan")),
      s"ts range not pushed to scan: $pushed")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    assert(got.keys.forall(d => d >= from.get.toString && d <= to.get.toString))
    // slice-relative recompute: brute force over only in-slice (user, day)
    val ud = Tables.load(spark, sf0001, "events")
      .filter($"ts" >= java.sql.Timestamp.valueOf(from.get.atStartOfDay)
        && $"ts" < java.sql.Timestamp.valueOf(to.get.plusDays(1).atStartOfDay))
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expect = ud.map(_._2).distinct.map { d =>
      d.toString -> ud.filter { case (_, ad) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
    }.toMap
    assert(got === expect)
  }

  test("cohort LTV: curves are monotone and cohorts match the retention cohort set") {
    val out = graft.queries.EventOps.cohortLtv(spark, sf0001).collect()
    assert(out.nonEmpty)
    // LTV is cumulative: non-decreasing along each cohort's offsets.
    out.groupBy(_.getAs[String]("cohort_week")).foreach { case (_, rows) =>
      val curve = rows.sortBy(_.getAs[Long]("week_offset")).map(_.getAs[Double]("ltv_per_user"))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
    // Same cohort universe as the retention triangle.
    val cohorts = graft.queries.EventOps.retention(spark, sf0001).collect()
      .map(_.getAs[String]("cohort_week")).toSet
    assert(out.map(_.getAs[String]("cohort_week")).toSet.subsetOf(cohorts))
  }

  test("transitions: shares are row-stochastic and pairs count |events|-|users|") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.EventOps.transitions(spark, sf0001).collect()
    assert(out.nonEmpty)
    // Each source row's outgoing shares sum to 1 (row-stochastic matrix).
    out.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rows) =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$ft shares sum to $s")
    }
    // Total transitions = sum over users of (n_events - 1).
    val perUser = Tables.load(spark, sf0001, "events")
      .groupBy(col("user_id")).count().collect().map(_.getLong(1))
    assert(out.map(_.getAs[Long]("n")).sum == perUser.map(_ - 1).sum)
  }

  test("hopping windows: every event lands in exactly duration/slide windows") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.EventOps.hoppingWindow(spark, sf0001).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    val events = Tables.load(spark, sf0001, "events").count()
    assert(total == 3 * events, s"window multiplicity broke: $total != 3*$events")
    // Window starts are aligned to the 2h hop grid.
    out.foreach { r =>
      val mins = r.getAs[String]("window_start").takeRight(5)
      assert(mins.endsWith(":00"))
      assert(mins.dropRight(3).toInt % 2 == 0,
        s"window start ${r.getAs[String]("window_start")} off the 2h grid")
    }
  }

  test("anomaly z-scores recompute from a driver-side stats derivation") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.EventOps.anomalyZscore(spark, sf0001).collect()
    assert(out.nonEmpty, "no 3-sigma outliers at sf0.001 — detection is vacuous")
    // Independent stats: plain double fold on the driver (tolerance
    // compare — the query's own DECIMAL path is exact, the reference
    // here need only agree to float noise).
    val rows = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byType = rows.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2)
      val mean = xs.sum / xs.length
      val std = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
      t -> ((mean, std))
    }
    out.foreach { r =>
      val (mean, std) = byType(r.getAs[String]("event_type"))
      val z = (r.getAs[Double]("value") - mean) / std
      assert(math.abs(z - r.getAs[Double]("z")) < 1e-9)
      assert(math.abs(r.getAs[Double]("z")) >= 3.0)
    }
    // Every event at >=3 sigma (by the independent stats) is reported.
    val expected = rows.zipWithIndex.count { case ((t, v), _) =>
      val (mean, std) = byType(t); math.abs((v - mean) / std) >= 3.0 + 1e-12
    }
    assert(math.abs(out.length - expected) <= 1) // cutoff-straddling ulp slack
  }
}
