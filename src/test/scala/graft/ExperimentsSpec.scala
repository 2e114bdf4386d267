package graft

import java.sql.Timestamp

import graft.queries.Experiments

/** Planted-cohort gates for the experimentation pair. The DuckDB oracle
  * pins row-level equality; these pin the DETECTION semantics — that
  * the attribution window, the exposure boundary, and the hash
  * bucketing each do their job on data constructed to isolate them. */
class ExperimentsSpec extends SparkSpec {

  /** The engines' shared 60-bit md5 bucketing hash (the
    * AudienceOverlap convention). */
  private def variantOf(u: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    if (h % 2 == 0) "A" else "B"
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- evt_ab_test ----

  private lazy val ab: Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("abtest").toString
    val users = (1L to 40L)
    val t0 = "2024-01-05 12:00:00"
    var eid = 0L
    def ev(u: Long, t: String, at: String): (Long, Timestamp, Long, String, Double, String) = {
      eid += 1; (eid, ts(at), u, t, 1.0, "{}")
    }
    val rows =
      // pre-exposure signup for everyone — must NOT convert
      users.map(u => ev(u, "signup", "2024-01-01 00:00:00")) ++
        // exposure: first view at t0
        users.map(u => ev(u, "view", t0)) ++
        // purchase: A inside the 24h window, B one hour past it
        users.filter(variantOf(_) == "A").map(u => ev(u, "purchase", "2024-01-06 11:00:00")) ++
        users.filter(variantOf(_) == "B").map(u => ev(u, "purchase", "2024-01-06 13:00:00")) ++
        // click: both variants inside the window — degenerate universal rate
        users.map(u => ev(u, "click", "2024-01-05 13:00:00")) ++
        // an unexposed user's purchase — must not enter any n
        Seq(ev(999L, "purchase", "2024-01-05 13:00:00"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Experiments.abTest(spark, tmp).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
  }

  private lazy val nA = (1L to 40L).count(variantOf(_) == "A").toLong
  private lazy val nB = 40L - nA

  test("attribution window splits the planted purchase cohorts A/B") {
    val p = ab("purchase")
    assert(p.getAs[Long]("n_a") === nA)
    assert(p.getAs[Long]("n_b") === nB)
    assert(p.getAs[Long]("conv_a") === nA, "in-window purchases must all convert")
    assert(p.getAs[Long]("conv_b") === 0L, "25h-later purchases leaked into the 24h window")
    assert(p.getAs[Long]("rate_a_micro") === 1000000L)
    assert(p.getAs[Long]("rate_b_micro") === 0L)
    // the planted split is total — z² must clear the χ²(1) bar
    assert(p.getAs[Boolean]("significant"),
      s"total A/B split not significant: z2=${p.get(p.fieldIndex("z2"))}")
    // exact replay of the pinned scalar sequence
    val (ca, cb) = (nA.toDouble, 0.0)
    val pd = (ca + cb) / 40.0
    val expect = math.floor(((ca / nA - cb / nB) * (ca / nA - cb / nB)
      / (pd * (1 - pd) * (1.0 / nA + 1.0 / nB))) * 1e6 + 0.5) / 1e6
    assert(math.abs(p.getAs[Double]("z2") - expect) < 1e-9)
  }

  test("degenerate pooled rates yield NULL z², not a divide-by-zero") {
    val c = ab("click") // universal conversion both variants
    assert(c.getAs[Long]("conv_a") === nA && c.getAs[Long]("conv_b") === nB)
    assert(c.isNullAt(c.fieldIndex("z2")), "pooled rate 1 must NULL the test")
    val s = ab("signup") // zero conversion (all pre-exposure)
    assert(s.getAs[Long]("conv_a") === 0L && s.getAs[Long]("conv_b") === 0L,
      "pre-exposure events converted — exposure boundary broken")
    assert(s.isNullAt(s.fieldIndex("z2")), "pooled rate 0 must NULL the test")
  }

  test("an all-one-variant assignment yields NULL rates/z², not an engine divergence") {
    // Every exposed user hashes to the SAME variant (ids filtered by the
    // shared md5 parity): n_b = 0, so rate_b and 1/n_b are undefined.
    // Spark's non-ANSI div would return NULL while DuckDB's // RAISES —
    // the explicit n=0 guard keeps both engines at NULL (ADVICE r17).
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("abdegen").toString
    val aUsers = (1L to 100L).filter(variantOf(_) == "A").take(5)
    assert(aUsers.size === 5)
    var eid = 0L
    val rows = aUsers.flatMap { u =>
      eid += 2
      Seq((eid - 1, ts("2024-01-05 12:00:00"), u, "view", 1.0, "{}"),
        (eid, ts("2024-01-05 13:00:00"), u, "purchase", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Experiments.abTest(spark, tmp).collect()
    val p = out.find(_.getAs[String]("metric") == "purchase").get
    assert(p.getAs[Long]("n_a") === 5L && p.getAs[Long]("n_b") === 0L)
    assert(p.getAs[Long]("rate_a_micro") === 1000000L)
    assert(p.isNullAt(p.fieldIndex("rate_b_micro")), "n_b=0 must NULL rate_b")
    assert(p.isNullAt(p.fieldIndex("z2")), "n_b=0 must NULL the test")
  }

  test("unexposed users are outside the experiment entirely") {
    // user 999 purchased but never viewed: every metric's n excludes it
    ab.values.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 40L)
    }
  }

  // ---- evt_path_topk ----

  private lazy val paths: Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pathtopk").toString
    var eid = 0L
    def ev(u: Long, t: String, at: String): (Long, Timestamp, Long, String, Double, String) = {
      eid += 1; (eid, ts(at), u, t, 1.0, "{}")
    }
    val rows =
      // three users share view>click>purchase on day 1
      (1L to 3L).flatMap { u =>
        Seq(ev(u, "view", "2024-01-01 10:00:00"),
          ev(u, "click", "2024-01-01 10:01:00"),
          ev(u, "purchase", "2024-01-01 10:02:00"))
      } ++
        // user 1 again on day 2: same path — n_visits 4, n_users 3
        Seq(ev(1L, "view", "2024-01-02 10:00:00"),
          ev(1L, "click", "2024-01-02 10:01:00"),
          ev(1L, "purchase", "2024-01-02 10:02:00")) ++
        // two single-event visits
        Seq(ev(4L, "view", "2024-01-01 09:00:00"),
          ev(5L, "view", "2024-01-03 09:00:00")) ++
        // bot: 50 clicks in one day — path must truncate at the cap
        (1 to 50).map(i => ev(99L, "click", f"2024-01-01 08:${i / 60}%02d:${i % 60}%02d"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Experiments.pathTopk(spark, tmp).collect()
  }

  test("shared paths fold across users and days; ranks follow (count, path)") {
    val byPath = paths.map(r => r.getAs[String]("path") -> r).toMap
    val main = byPath("view>click>purchase")
    assert(main.getAs[Long]("n_visits") === 4L)
    assert(main.getAs[Long]("n_users") === 3L)
    assert(main.getAs[Long]("path_rank") === 1L)
    // 7 visits total: 4 + view ×2 + bot ×1 → share = 1e6*4 div 7
    assert(main.getAs[Long]("share_micro") === 571428L)
    assert(byPath("view").getAs[Long]("n_visits") === 2L)
  }

  test("a bot visit truncates at the cap instead of exploding the path") {
    val bot = paths.find(_.getAs[String]("path").startsWith("click>click"))
      .getOrElse(fail("bot path missing"))
    assert(bot.getAs[String]("path").split('>').length === 12,
      "first-12 truncation failed on the 50-event visit")
    assert(bot.getAs[Long]("n_visits") === 1L)
  }
}
