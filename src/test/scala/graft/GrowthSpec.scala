package graft

import java.sql.Timestamp

import graft.queries.Growth

/** Planted gates for the growth pair: the accounting identities (the
  * semantics a row-oracle can't attribute — that the four flows are a
  * PARTITION of activity transitions, not four independent counts)
  * and the value-histogram quintile rule with ties. */
class GrowthSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("growth").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("planted transitions land in exactly one flow each; churn covers gaps AND departures") {
    var eid = 0L
    def ev(u: Long, d: String): (Long, Timestamp, Long, String, Double, String) = {
      eid += 1; (eid, ts(s"2024-01-$d 10:00:00"), u, "view", 1.0, "{}")
    }
    // u1: days 1,2,3 (then gone) — new@1, retained@2,3, churn@4
    // u2: days 1,5 — new@1, resurrected@5, churn@2 (gap) — day 5 is
    //     the corpus edge, so no trailing churn for u2
    // u3: day 2 only — new@2, churn@3
    val dir = writeEvents(Seq(
      ev(1L, "01"), ev(1L, "02"), ev(1L, "03"),
      ev(2L, "01"), ev(2L, "05"),
      ev(3L, "02")))
    val out = Growth.growthAccounting(spark, dir).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("new_users"), r.getAs[Long]("retained"),
          r.getAs[Long]("resurrected"), r.getAs[Long]("churned")))).toMap
    assert(out("2024-01-01") === ((2L, 0L, 0L, 0L)))
    assert(out("2024-01-02") === ((1L, 1L, 0L, 1L)))
    assert(out("2024-01-03") === ((0L, 1L, 0L, 1L)))
    assert(out("2024-01-04") === ((0L, 0L, 0L, 1L)))
    assert(out("2024-01-05") === ((0L, 0L, 1L, 0L)))
  }

  test("accounting identities hold on the live fixture") {
    import org.apache.spark.sql.functions._
    val out = Growth.growthAccounting(spark, sf0001).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("new_users"), r.getAs[Long]("retained"),
          r.getAs[Long]("resurrected"), r.getAs[Long]("churned")))).toMap
    val active = Tables.load(spark, sf0001, "events")
      .select(col("user_id").as("u"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("a"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("a")).toMap
    // stock identity: active(d) = new + retained + resurrected
    active.foreach { case (d, a) =>
      val (n, r, s, _) = out(d)
      assert(n + r + s === a, s"$d: flows $n+$r+$s != active $a")
    }
    // flow identity: churned(d) = active(d-1) - retained(d)
    out.keys.toSeq.sorted.foreach { d =>
      val prev = java.time.LocalDate.parse(d).minusDays(1).toString
      active.get(prev).foreach { ap =>
        assert(out(d)._4 === ap - out(d)._2,
          s"$d: churned ${out(d)._4} != active($prev)=$ap - retained ${out(d)._2}")
      }
    }
  }

  test("time-sliced growth pushes the ts range to the scan; flows are slice-relative") {
    val from = Some(java.time.LocalDate.parse("2024-01-10"))
    val to = Some(java.time.LocalDate.parse("2024-01-20"))
    spark.catalog.clearCache()
    val df = Growth.growthAccounting(spark, sf0001, from, to)
    // The sliced form must NOT persist: on the long-lived Serve path
    // every distinct ?from=&to= pair is a distinct logical plan, so a
    // persist here would pin one corpus-sized CacheManager entry PER
    // REQUESTED RANGE for the session's lifetime (ADVICE r17).
    assert(org.apache.spark.sql.graft.PlanShim.cacheIsEmpty(spark),
      "sliced growthAccounting registered a cache entry — per-range leak")
    val scans = PlanTestUtil.deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
    assert(pushed.exists(p => p.contains("ts")
        && p.contains("GreaterThanOrEqual") && p.contains("LessThan")),
      s"ts range not pushed to scan: $pushed")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getAs[String]("day"))
    assert(days.forall(d => d >= "2024-01-10" && d <= "2024-01-20"),
      s"out-of-slice day in ${days.toSeq}")
    // slice-relative: day 1 of the slice is ALL new users (no
    // pre-slice history leaks in)
    val first = rows.find(_.getAs[String]("day") == "2024-01-10").get
    assert(first.getAs[Long]("retained") === 0L &&
      first.getAs[Long]("resurrected") === 0L,
      "pre-slice activity leaked into the sliced flows")
  }

  test("value-histogram quintiles: planted ladder with ties scores by value, not row") {
    var eid = 0L
    // user k (1..10): k events on day (11 - k) with value 10·k each →
    // freq = k, rec = k - 1, mon = 10k² — all three metrics ascend
    // with k, so quintiles pair users (1,2)(3,4)… and R inverts
    val rows = (1L to 10L).flatMap { k =>
      (1 to k.toInt).map { j =>
        eid += 1
        (eid, ts(f"2024-01-${11 - k}%02d 05:$j%02d:00"), k, "view", 10.0 * k, "{}")
      }
    }
    val dir = writeEvents(rows)
    val out = Growth.rfm(spark, dir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("f"), r.getAs[Long]("m")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("monetary_sum")))).toMap
    // q(k) = 1 + (5·(k-1)) div 10 → 1,1,2,2,3,3,4,4,5,5; r = 6 - q
    val expected = Map(
      (5L, 1L, 1L) -> ((2L, 50L)),   // k=1,2: mon 10+40
      (4L, 2L, 2L) -> ((2L, 250L)),  // k=3,4: 90+160
      (3L, 3L, 3L) -> ((2L, 610L)),  // k=5,6: 250+360
      (2L, 4L, 4L) -> ((2L, 1130L)), // k=7,8: 490+640
      (1L, 5L, 5L) -> ((2L, 1810L))) // k=9,10: 810+1000
    assert(out === expected, s"got $out")
  }
}
