package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Bench, Fixtures, Tables}
import graft.streaming.{NewsStream, Sessionize, SessEvent, StateStores}

/** Streaming THROUGHPUT replay: drives the two RocksDB-backed pipelines
  * (news watermark+dedup, gap sessionization) through N consecutive
  * AvailableNow micro-batches over one long-lived checkpoint — the
  * production cadence shape — with a doubling batch-size ladder, and
  * prints per-fire wall, rows, and rows/sec plus a least-squares
  * `wall = fixed + rows/rate` decomposition.
  *
  * Purpose (VERDICT r16 item 4): the per-query stream_* bench entries
  * carry ~1.5–3 s of FIXED lifecycle cost (query start/stop, state-store
  * open, sink commit log); this tool turns "that fixed cost amortizes at
  * scale" into a measured curve. Methodology notes:
  *   - every fire is a complete lifecycle (start → drain → stop), the
  *     same thing one cadence tick pays;
  *   - the checkpoint and sink PERSIST across fires, so state carries
  *     over exactly as in production (fire 1 is the cold start);
  *   - news batches are synthesized (unique links, event time advancing
  *     one day per fire) so dedup state genuinely grows; sessionize
  *     batches are TIME-ordered slices of the real events table, the
  *     replay order a file-source cadence would deliver.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… runMain graft.tools.StreamBench
  * [news|sess|all]` — prints one human line per fire and one JSON
  * summary line per pipeline.
  */
object StreamBench {

  private def load: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** (fires: Seq[(rows, wallSec)]) → (fixedSec, rowsPerSec) least squares. */
  private def fit(fires: Seq[(Long, Double)]): (Double, Double) = {
    val n = fires.size.toDouble
    val (xs, ys) = (fires.map(_._1.toDouble), fires.map(_._2))
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    val a = my - b * mx
    (a, if (b > 0) 1.0 / b else Double.PositiveInfinity)
  }

  private def report(name: String, fires: Seq[(Long, Double)]): Unit = {
    // fire 1 pays JVM/codegen warm-up on top of the lifecycle cost —
    // fit the steady-state fires, report fire 1 as the cold start
    val warm = if (fires.size > 2) fires.drop(1) else fires
    val (fixed, rate) = fit(warm)
    val totalRows = fires.map(_._1).sum
    val totalWall = fires.map(_._2).sum
    val rateStr =
      if (rate.isInfinite || rate < 0) "unmeasurable (wall flat across the ladder)"
      else f"${rate}%.0f rows/s marginal"
    println(f"[streambench] $name: total ${totalRows} rows / $totalWall%.2f s " +
      f"= ${totalRows / totalWall}%.0f rows/s amortized; warm-fire fit: " +
      f"fixed $fixed%.2f s/fire + $rateStr (cold fire 1: ${fires.head._2}%.2f s)")
    val fireJson = fires.map { case (r, w) =>
      f"""{"rows":$r,"wall_sec":$w%.3f}""" }.mkString("[", ",", "]")
    val rateJson =
      if (rate.isInfinite || rate.isNaN || rate < 0) "null" else f"${rate}%.0f"
    println(f"""{"tool":"streambench","pipeline":"$name","fires":$fireJson,""" +
      f""""amortized_rows_per_sec":${totalRows / totalWall}%.0f,""" +
      f""""fixed_sec_per_fire":$fixed%.3f,"marginal_rows_per_sec":$rateJson}""")
  }

  /** News dedup ladder: synthesized landing JSON (the NewsStream schema),
    * unique links, dates advancing one day per fire. */
  def newsLadder(spark: SparkSession, sizes: Seq[Long]): Seq[(Long, Double)] = {
    val root = Fixtures.reusedScratchDir("streambench_news")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    var offset = 0L
    sizes.zipWithIndex.map { case (n, i) =>
      // stage fire i's landing files: event time inside day i (so the
      // 7-day watermark holds a growing multi-day state window)
      val day0 = 1614556800L // 2021-03-01 UTC
      spark.range(offset, offset + n).select(
          concat(lit("headline "), col("id")).as("title"),
          concat(lit("body text for "), col("id")).as("desc"),
          date_format(timestamp_seconds(lit(day0) + lit(i * 86400L) +
            pmod(col("id"), lit(86400L))), "yyyy-MM-dd HH:mm:ss").as("date"),
          concat(lit("https://news.example/"), col("id")).as("link"),
          lit(null).cast("string").as("img"),
          lit("en").as("lang"),
          struct(lit("graft").as("crawler"),
            lit("news.example").as("website"),
            lit(null).cast("string").as("author"),
            concat(lit("https://news.example/"), col("id")).as("url"),
            struct(lit(null).cast("string").as("id")).as("tweet")).as("source"))
        .repartition(4)
        .write.mode("append").json(in)
      offset += n
      val t0 = System.nanoTime()
      NewsStream.runOnce(spark, in, sink, ckpt)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] news fire ${i + 1}: $n rows, $wall%.3f s " +
        f"(${n / wall}%.0f rows/s, loadavg $load%.2f)")
      (n, wall)
    }
  }

  /** Sessionize ladder: time-ordered slices of the real events table fed
    * through the file source, one fire per slice. */
  def sessLadder(spark: SparkSession, sfDir: String,
      fractions: Seq[Double]): Seq[(Long, Double)] = {
    import spark.implicits._
    val root = Fixtures.reusedScratchDir("streambench_sess")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts")).where(col("user_id") =!= -1L)
      .withColumn("eu", unix_micros(col("ts")))
    // time boundaries at the cumulative fractions → doubling-ish slices
    val bounds = ev.stat.approxQuantile("eu", fractions.toArray, 0.001)
    var loEu = Long.MinValue
    bounds.zipWithIndex.map { case (hi, i) =>
      val hiEu = if (i == bounds.length - 1) Long.MaxValue else hi.toLong
      val slice = ev.where(col("eu") > loEu && col("eu") <= hiEu)
        .select(col("user_id"), col("ts"))
      val n = slice.count()
      slice.write.mode("append").parquet(in)
      loEu = hiEu
      val t0 = System.nanoTime()
      StateStores.streamingSession(spark) { s =>
        val src = s.readStream.schema("user_id BIGINT, ts TIMESTAMP").parquet(in)
        val q = Sessionize.sessions(src.as[SessEvent], "1 minute").writeStream
          .format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] sess fire ${i + 1}: $n rows, $wall%.3f s " +
        f"(${n / wall}%.0f rows/s, loadavg $load%.2f)")
      (n, wall)
    }
  }

  /** Stream-static enrich ladder (stream_enrich's pipeline): time-ordered
    * slices of the events table broadcast-probed against the
    * customer⋈nation dim, then watermark-bounded daily windows. On the
    * synth corpora the hot-pool copies (1 + event_id mod 997) land
    * INSIDE the dim key range — the adversarial skew hits the probe and
    * the (day, nation, type) fold — while fresh-space copies dangle on
    * the inner join and measure pure probe throughput. */
  def enrichLadder(spark: SparkSession, sfDir: String,
      fractions: Seq[Double]): Seq[(Long, Double)] = {
    val root = Fixtures.reusedScratchDir("streambench_enrich")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("user_id") =!= -1L)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("eu", unix_micros(col("ts")))
    val bounds = ev.stat.approxQuantile("eu", fractions.toArray, 0.001)
    var loEu = Long.MinValue
    bounds.zipWithIndex.map { case (hi, i) =>
      val hiEu = if (i == bounds.length - 1) Long.MaxValue else hi.toLong
      val slice = ev.where(col("eu") > loEu && col("eu") <= hiEu)
        .select(col("user_id"), col("ts"), col("event_type"))
      val n = slice.count()
      slice.write.mode("append").parquet(in)
      loEu = hiEu
      val t0 = System.nanoTime()
      StateStores.streamingSession(spark) { s =>
        val dim = Tables.load(s, sfDir, "customer")
          .join(Tables.load(s, sfDir, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING")
          .parquet(in)
        val q = graft.streaming.Enrich.dailyByNation(src, dim)
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] enrich fire ${i + 1}: $n rows, $wall%.3f s " +
        f"(${n / wall}%.0f rows/s, loadavg $load%.2f)")
      (n, wall)
    }
  }

  /** Stream-stream LEFT OUTER ladder (stream_left_join's pipeline):
    * time-ordered slices of the events table split into the view
    * (impression) and click streams, joined through
    * [[graft.streaming.StreamJoin.attributeOuter]] over one long-lived
    * checkpoint. State is the real cost here: each fire buffers its
    * open interval windows in RocksDB and the NEXT fire's watermark
    * advance evicts them — exactly the cadence lifecycle. Hot-pool
    * skew rides in from the synth corpora (half of all events keyed by
    * 997 users → the same join keys recur at ~1000× the average). */
  def ljoinLadder(spark: SparkSession, sfDir: String,
      fractions: Seq[Double]): Seq[(Long, Double)] = {
    val root = Fixtures.reusedScratchDir("streambench_ljoin")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val inI = s"$root/imps"; val inC = s"$root/clicks"
    val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("user_id") =!= -1L)
      .withColumn("eu", unix_micros(col("ts")))
    val bounds = ev.stat.approxQuantile("eu", fractions.toArray, 0.001)
    var loEu = Long.MinValue
    bounds.zipWithIndex.map { case (hi, i) =>
      val hiEu = if (i == bounds.length - 1) Long.MaxValue else hi.toLong
      val slice = ev.where(col("eu") > loEu && col("eu") <= hiEu)
      val imps = slice.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("imp_time"),
          col("event_id").as("imp_id"))
      val clicks = slice.filter(col("event_type") === "click")
        .select(col("user_id").as("click_user"), col("ts").as("click_time"),
          col("event_id").as("click_id"))
      val n = slice.count()
      imps.write.mode("append").parquet(inI)
      clicks.write.mode("append").parquet(inC)
      loEu = hiEu
      val t0 = System.nanoTime()
      StateStores.streamingSession(spark) { s =>
        val si = s.readStream
          .schema("user_id BIGINT, imp_time TIMESTAMP, imp_id BIGINT")
          .parquet(inI)
        val sc = s.readStream
          .schema("click_user BIGINT, click_time TIMESTAMP, click_id BIGINT")
          .parquet(inC)
        val q = graft.streaming.StreamJoin
          .attributeOuter(si, sc, impKey = "user_id", clickKey = "click_user")
          .select(col("imp_id"), col("click_id"),
            (col("click_id").isNotNull).as("converted"))
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] ljoin fire ${i + 1}: $n rows, $wall%.3f s " +
        f"(${n / wall}%.0f rows/s, loadavg $load%.2f)")
      (n, wall)
    }
  }

  /** Approx-users (HLL state) ladder: synthesized events, one WEEK of
    * event time per fire — so each fire's watermark closes the previous
    * fire's buckets (the real cadence emission path, no sentinel), while
    * its own week's sketches stay open in state across the fire
    * boundary. User ids draw from a 200k space so the larger fires hold
    * genuinely estimating (post-set-mode) sketches. With `hotPool`,
    * half of every fire's rows key to 997 users (the ScaleSynth skew):
    * those groups' sketches absorb ~1000× the average updates while
    * staying 4 KiB — the bounded-state claim under skew. */
  def hlluLadder(spark: SparkSession, sizes: Seq[Long],
      hotPool: Boolean = false): Seq[(Long, Double)] = {
    import graft.streaming.{ApproxUsers, TypedEvent}
    val root = Fixtures.reusedScratchDir("streambench_hllu")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val in = s"$root/in"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val day0 = 1704067200L // 2024-01-01 UTC, a Monday
    var offset = 0L
    sizes.zipWithIndex.map { case (n, i) =>
      val weekStart = day0 + i * 7L * 86400L
      spark.range(offset, offset + n).select(
          concat(lit("t"), pmod(col("id"), lit(5L))).as("event_type"),
          date_format(timestamp_seconds(lit(weekStart)), "yyyy-MM-dd").as("week"),
          lit((weekStart + 7L * 86400L) * 1000L).as("week_end_ms"),
          (if (hotPool)
            when(pmod(col("id"), lit(2L)) === 0L,
              lit(1L) + pmod(col("id"), lit(997L)))
              .otherwise(pmod(col("id") * 2654435761L, lit(200000L)))
          else pmod(col("id") * 2654435761L, lit(200000L))).as("user_id"),
          timestamp_seconds(lit(weekStart) +
            pmod(col("id"), lit(7L * 86400L - 3600L))).as("ts"))
        .repartition(4)
        .write.mode("append").parquet(in)
      offset += n
      val t0 = System.nanoTime()
      StateStores.streamingSession(spark) { s =>
        import s.implicits._
        val src = s.readStream
          .schema("event_type STRING, week STRING, week_end_ms BIGINT, user_id BIGINT, ts TIMESTAMP")
          .parquet(in)
        val q = ApproxUsers.approxUsers(src.as[TypedEvent], "1 minute")
          .writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streambench] hllu fire ${i + 1}: $n rows, $wall%.3f s " +
        f"(${n / wall}%.0f rows/s, loadavg $load%.2f)")
      (n, wall)
    }
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session("graft-streambench")
    spark.sparkContext.setLogLevel("WARN")
    if (which == "news" || which == "all")
      report("news_dedup", newsLadder(spark,
        Seq(10000L, 20000L, 40000L, 80000L, 160000L)))
    if (which == "sess" || which == "all")
      report("sessionize", sessLadder(spark, sfDir,
        Seq(1.0 / 15, 3.0 / 15, 7.0 / 15, 1.0)))
    if (which == "hllu" || which == "all")
      report("approx_users", hlluLadder(spark,
        Seq(10000L, 20000L, 40000L, 80000L, 160000L)))
    // r18 10×-data ladders (VERDICT r17 item 7): the three heaviest
    // stream entries, driven over the synth corpora's hot-pool skew
    if (which == "hllu10x")
      report("approx_users_hot10x", hlluLadder(spark,
        Seq(100000L, 200000L, 400000L, 800000L, 1600000L), hotPool = true))
    if (which == "enrich")
      report("enrich", enrichLadder(spark, sfDir,
        Seq(1.0 / 15, 3.0 / 15, 7.0 / 15, 1.0)))
    if (which == "ljoin")
      report("left_outer_join", ljoinLadder(spark, sfDir,
        Seq(1.0 / 15, 3.0 / 15, 7.0 / 15, 1.0)))
    spark.stop()
  }
}
