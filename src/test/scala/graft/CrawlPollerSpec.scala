package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.ingest.CrawlPoller
import graft.streaming.NewsStream

/** EP2 first mile: HTTP-JSON endpoint → landing dir (link-deduped) →
  * streamed → deduped lake — the reference's crawl loop end-to-end from
  * a URL, against a live local server (the HttpFetchSpec pattern). */
class CrawlPollerSpec extends SparkSpec {

  private def doc(link: String, title: String): String =
    s"""{"title":"$title","desc":"d","date":"2021-03-01T10:00:00","link":"$link",""" +
      s""""img":null,"lang":"en","source":{"crawler":"googlenews","website":"w",""" +
      s""""author":null,"url":"https://w","tweet":null}}"""

  /** Server whose payload is swappable between requests. */
  private def withServer(body: (AtomicReference[String], String) => Unit): Unit = {
    val payload = new AtomicReference[String]("[]")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = payload.get.getBytes(UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try body(payload, s"http://127.0.0.1:${server.getAddress.getPort}/feed")
    finally server.stop(0)
  }

  test("poll lands unseen links only, across array and NDJSON payloads") {
    withServer { (payload, url) =>
      val landing = Fixtures.scratchDir("poller_landing")
      payload.set(s"[${doc("https://n/1", "one")},${doc("https://n/2", "two")}," +
        s"${doc("https://n/1", "one-dup")}]")
      val r1 = CrawlPoller.poll(url, landing, tick = 0)
      assert(r1.fetched === 3 && r1.landed === 2)
      // re-poll with overlap, NDJSON this time: only the new link lands
      payload.set(doc("https://n/2", "two") + "\n" + doc("https://n/3", "three"))
      val r2 = CrawlPoller.poll(url, landing, tick = 1)
      assert(r2.fetched === 2 && r2.landed === 1)
      // nothing new -> no landing file at all
      val r3 = CrawlPoller.poll(url, landing, tick = 2)
      assert(r3.landed === 0 && r3.file.isEmpty)
      // the landing dir reads clean (staging + seen-set invisible to Spark)
      val df = spark.read.schema(NewsStream.newsSchema).json(landing)
      assert(df.count() === 3)
      assert(df.select("link").collect().map(_.getString(0)).sorted ===
        Array("https://n/1", "https://n/2", "https://n/3"))
      // records dropped by the poller: link-less ones
      payload.set("""{"title":"no link","desc":"x"}""")
      val r4 = CrawlPoller.poll(url, landing, tick = 3)
      assert(r4.fetched === 1 && r4.landed === 0)
    }
  }

  test("conditional GET: unchanged feed answers 304, nothing re-downloads") {
    val payload = new AtomicReference[String]("[]")
    val etag = new AtomicReference[String]("\"v1\"")
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val inm = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
        if (inm.contains(etag.get)) {
          ex.sendResponseHeaders(304, -1); ex.close()
        } else {
          served.incrementAndGet()
          val bytes = payload.get.getBytes(UTF_8)
          ex.getResponseHeaders.set("ETag", etag.get)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes); ex.close()
        }
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed"
      val landing = Fixtures.scratchDir("poller_cond")
      payload.set(s"[${doc("https://n/c1", "one")}]")
      val r1 = CrawlPoller.poll(url, landing, tick = 0)
      assert(r1.landed === 1 && !r1.notModified && served.get === 1)
      // unchanged feed: the poller replays the ETag, the server 304s,
      // and no payload crosses the wire
      val r2 = CrawlPoller.poll(url, landing, tick = 1)
      assert(r2.notModified && r2.fetched === 0 && r2.landed === 0)
      assert(served.get === 1, "payload was re-downloaded despite 304")
      // feed changes (new etag): normal fetch resumes, new link lands
      payload.set(s"[${doc("https://n/c1", "one")},${doc("https://n/c2", "two")}]")
      etag.set("\"v2\"")
      val r3 = CrawlPoller.poll(url, landing, tick = 2)
      assert(!r3.notModified && r3.landed === 1 && served.get === 2)
    } finally server.stop(0)
  }

  test("tick test: endpoint → landing → streamed → deduped lake rows") {
    withServer { (payload, url) =>
      val landing = Fixtures.scratchDir("poller_e2e_landing")
      val lake = Fixtures.scratchDir("poller_e2e_lake")
      val flows = Seq(
        CrawlPoller.flow("news_poll", url, landing),
        Schedule.Flow("news_crawl", _ =>
          NewsStream.runOnce(spark, landing, s"$lake/news_crawl", s"$lake/_ckpt")))

      payload.set(s"[${doc("https://n/a", "a")},${doc("https://n/b", "b")}," +
        s"${doc("https://n/c", "c")}]")
      var fail = 0
      def tickOnce(t: Long): Unit = {
        val r = Schedule.runTick(flows, t)
        r.outcomes.foreach { case (n, e) =>
          if (e.nonEmpty) { fail += 1; info(s"flow $n failed: $e") } }
      }
      tickOnce(0)
      // next cadence: the feed re-serves two old links plus two new ones
      payload.set(s"[${doc("https://n/b", "b")},${doc("https://n/c", "c")}," +
        s"${doc("https://n/d", "d")},${doc("https://n/e", "e")}]")
      tickOnce(1)
      assert(fail === 0)

      val lakeDf = spark.read.parquet(s"$lake/news_crawl")
      val links = lakeDf.select("link").collect().map(_.getString(0)).sorted
      assert(links === Array("https://n/a", "https://n/b", "https://n/c",
        "https://n/d", "https://n/e"))
      // exactly once each: poller dedup kept the overlap out of the
      // landing dir, and the stream's keyed dedup backstops it
      assert(lakeDf.count() === 5)
      assert(Files.list(Paths.get(landing)).filter(p =>
        p.getFileName.toString.startsWith("crawl_")).count() === 2)
    }
  }
}
