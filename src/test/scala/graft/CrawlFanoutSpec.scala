package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.ingest.{CrawlFanout, CrawlPoller}
import graft.streaming.NewsStream

/** S7/S8 fan-out e2e: the reference's per-source crawl grid —
  * GoogleNews (lang × tag, period 24h, crawl_google_news.py:86-92) and
  * the synthesized tweet query (crawl_tweets.py:60-67) — as configured
  * polls landing RAW records, shaped P11/P12 Spark-side, streamed into
  * one deduped lake. Two sources × two langs, provenance populated. */
class CrawlFanoutSpec extends SparkSpec {

  private def newsDoc(link: String, title: String): String =
    s"""{"title":"$title","desc":"d","date":"2021-03-01T10:00:00",""" +
      s""""link":"$link","img":"i.png","site":"news.example","author":"a"}"""

  private def tweetDoc(id: String, user: String): String =
    s"""{"user":"$user","content":"c","date":"2021-03-01T11:00:00",""" +
      s""""tweet_id":"$id","link":"https://twitter.example/s/$id"}"""

  /** Server with /news (payload keyed by lang param) and /tweets;
    * records every requested URI for query-synthesis assertions. */
  private def withServer(body: (ConcurrentLinkedQueue[String], String) => Unit): Unit = {
    val uris = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def ctx(path: String)(payload: String => String): Unit = {
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val q = Option(ex.getRequestURI.getQuery).getOrElse("")
          uris.add(ex.getRequestURI.toString)
          val bytes = payload(q).getBytes(UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes); ex.close()
        }
      }): Unit
    }
    // each (lang, tag) cell returns one lang-specific article plus one
    // SHARED link served to every cell — the cross-feed dedup bait
    ctx("/news") { q =>
      val lang = q.split("&").collectFirst {
        case p if p.startsWith("lang=") => p.drop(5) }.getOrElse("xx")
      s"[${newsDoc(s"news.example/$lang", s"story-$lang")}," +
        s"${newsDoc("news.example/shared", "shared-story")}]"
    }
    ctx("/tweets") { _ => s"[${tweetDoc("42", "alice")}]" }
    server.start()
    try body(uris, s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("two sources x two langs: fan-out polls, shapes, streams, dedups") {
    withServer { (uris, base) =>
      val newsLanding = Fixtures.scratchDir("fanout_news")
      val tweetsLanding = Fixtures.scratchDir("fanout_tweets")
      val lake = Fixtures.scratchDir("fanout_lake")

      val newsFeeds = CrawlFanout.googleNews(s"$base/news")
      val tweetFeeds = CrawlFanout.tweets(s"$base/tweets",
        today = LocalDate.of(2021, 3, 2))
      assert(newsFeeds.map(_.name) === Seq("news_fr_covid", "news_fr_corona",
        "news_en_covid", "news_en_corona"))

      val flows =
        CrawlFanout.flows(newsFeeds, newsLanding) ++
        CrawlFanout.flows(tweetFeeds, tweetsLanding) :+
        Schedule.Flow("news_stream", _ => NewsStream.runOnceFanout(
          spark, newsLanding, tweetsLanding, s"$lake/sink", s"$lake/_ckpt"))

      val report = Schedule.runTick(flows, 0)
      assert(report.outcomes.forall(_._2.isEmpty),
        s"flow failures: ${report.outcomes.filter(_._2.nonEmpty)}")

      // query synthesis matches the reference shapes
      val asked = uris.asScala.toSeq
      assert(asked.count(_.startsWith("/news")) === 4)
      for (lang <- Seq("fr", "en"); tag <- Seq("COVID", "CORONA"))
        assert(asked.exists(u =>
          u.contains(s"lang=$lang") && u.contains(s"q=$tag") &&
            u.contains("period=24h")), s"missing $lang x $tag poll")
      val tweetUri = asked.find(_.startsWith("/tweets")).get
      assert(tweetUri.contains("limit=1000"))
      assert(java.net.URLDecoder.decode(tweetUri, "UTF-8")
        .contains("covid since:2021-03-01 lang:en"))

      val lakeDf = spark.read.parquet(s"$lake/sink")
      // 4 cells: fr/en lang stories (shared link deduped by the poller's
      // shared seen-set, then backstopped by the stream) + 1 tweet
      assert(lakeDf.count() === 4)
      val byCrawler = lakeDf.groupBy("source.crawler").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byCrawler === Map("googlenews" -> 3L, "tweets" -> 1L))
      val langs = lakeDf.where("source.crawler = 'googlenews'")
        .select("lang").collect().map(_.getString(0)).sorted
      assert(langs === Array("en", "fr", "fr").sorted)
      // P11 link prefixing + P12 synthesis both applied
      assert(lakeDf.where("link = 'https://news.example/shared'").count() === 1)
      val tweet = lakeDf.where("source.crawler = 'tweets'").collect().head
      assert(tweet.getAs[String]("title") === "Tweet from alice the 2021-03-01")
      assert(tweet.getAs[String]("link") === "https://twitter.example/s/42")
    }
  }

  test("fanoutFlows integrates the grid into the cadence and the lake views") {
    withServer { (_, base) =>
      val lakeDir = Fixtures.scratchDir("fanout_sched_lake")
      val flows = Schedule.fanoutFlows(spark, lakeDir,
        newsEndpoint = Some(s"$base/news"),
        tweetsEndpoint = Some(s"$base/tweets"),
        landingRoot = s"$lakeDir/_crawl_landing")
      // 4 news polls + 1 tweet poll + the stream flow
      assert(flows.map(_.name) === Seq("news_fr_covid", "news_fr_corona",
        "news_en_covid", "news_en_corona", "tweets_en", "news_fanout"))
      val report = Schedule.runTick(flows, 0)
      assert(report.outcomes.forall(_._2.isEmpty), report.outcomes.toString)
      // the sink registers as a lake view and joins the news union
      val names = Serve.registerLake(spark, lakeDir)
      assert(names.contains("news_fanout") && names.contains("news"))
      assert(spark.table("news_fanout").count() === 4L) // 3 stories + 1 tweet
      assert(spark.table("news").count() === 4L)
      // news-endpoint-only config still works (tweet landing stays empty)
      val lake2 = Fixtures.scratchDir("fanout_sched_lake2")
      val newsOnly = Schedule.fanoutFlows(spark, lake2,
        newsEndpoint = Some(s"$base/news"), tweetsEndpoint = None,
        landingRoot = s"$lake2/_crawl_landing")
      assert(Schedule.runTick(newsOnly, 0).outcomes.forall(_._2.isEmpty))
      assert(spark.read.parquet(s"$lake2/news_fanout").count() === 3L)
      // no endpoints -> no flows at all
      assert(Schedule.fanoutFlows(spark, lake2, None, None, "x").isEmpty)
    }
  }

  /** GoogleNews-shaped RSS 2.0 payload: escaped-HTML description,
    * RFC-1123 pubDate, <source> site, media:content thumbnail — the
    * actual first-mile wire format the GoogleNews library scrapes. */
  private def rssDoc(lang: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<rss version="2.0" xmlns:media="http://search.yahoo.com/mrss/">
       |<channel><title>covid - Google News</title>
       |<item>
       |  <title>rss-story-$lang</title>
       |  <link>https://news.example/rss/$lang</link>
       |  <pubDate>Mon, 01 Mar 2021 10:00:00 GMT</pubDate>
       |  <description>&lt;a href="https://news.example/rss/$lang"&gt;rss-story-$lang&lt;/a&gt; full text</description>
       |  <source url="https://news.example">News Example</source>
       |  <media:content url="https://img.example/$lang.png"/>
       |</item>
       |<item>
       |  <title>shared-rss-story</title>
       |  <link>https://news.example/rss/shared</link>
       |  <pubDate>Mon, 01 Mar 2021 09:30:00 GMT</pubDate>
       |  <description>shared</description>
       |  <source url="https://news.example">News Example</source>
       |</item>
       |</channel></rss>""".stripMargin

  test("GoogleNews RSS first mile: live-served feed polls, shapes, lands in the lake") {
    // a dedicated server so the RSS path exercises the SAME fan-out
    // grid + stream pipeline as the JSON tests above
    val uris = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/rss", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        uris.add(ex.getRequestURI.toString)
        val lang = q.split("&").collectFirst {
          case p if p.startsWith("lang=") => p.drop(5) }.getOrElse("xx")
        val bytes = rssDoc(lang).getBytes(UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/rss+xml")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    }): Unit
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val landing = Fixtures.scratchDir("rss_news")
      val lake = Fixtures.scratchDir("rss_lake")
      val flows = CrawlFanout.flows(CrawlFanout.googleNews(s"$base/rss"), landing) :+
        Schedule.Flow("news_stream", _ => NewsStream.runOnceFanout(
          spark, landing, Fixtures.scratchDir("rss_tweets"),
          s"$lake/sink", s"$lake/_ckpt"))
      val report = Schedule.runTick(flows, 0)
      assert(report.outcomes.forall(_._2.isEmpty),
        s"flow failures: ${report.outcomes.filter(_._2.nonEmpty)}")
      assert(uris.asScala.count(_.startsWith("/rss")) === 4) // lang x tag grid

      val lakeDf = spark.read.parquet(s"$lake/sink")
      // fr + en lang stories + shared story (cross-cell deduped) = 3
      assert(lakeDf.count() === 3)
      val frRow = lakeDf.where("link = 'https://news.example/rss/fr'")
        .collect().head
      assert(frRow.getAs[String]("title") === "rss-story-fr")
      // escaped HTML stripped to readable text
      assert(frRow.getAs[String]("desc") === "rss-story-fr full text")
      // RFC-1123 pubDate normalized and cast to a real timestamp
      assert(frRow.getAs[java.sql.Timestamp]("date").toInstant.toString
        === "2021-03-01T10:00:00Z")
      // media thumbnail + <source> site + fan-out lang provenance
      assert(frRow.getAs[String]("img") === "https://img.example/fr.png")
      val src = frRow.getAs[org.apache.spark.sql.Row]("source")
      assert(src.getAs[String]("website") === "News Example")
      assert(src.getAs[String]("crawler") === "googlenews")
      assert(frRow.getAs[String]("lang") === "fr")
    } finally server.stop(0)
  }

  test("Atom entries normalize through the same landing contract") {
    val atom =
      """<?xml version="1.0" encoding="utf-8"?>
        |<feed xmlns="http://www.w3.org/2005/Atom">
        |  <title>Atom Example</title>
        |  <entry>
        |    <title>atom-story</title>
        |    <link rel="alternate" href="https://news.example/atom/1"/>
        |    <published>2021-03-01T12:00:00Z</published>
        |    <summary>atom summary</summary>
        |    <author><name>carol</name></author>
        |  </entry>
        |</feed>""".stripMargin
    val recs = CrawlPoller.parseFeedXml(atom)
    assert(recs.size === 1)
    val r = recs.head
    assert(r.get("title").asText === "atom-story")
    assert(r.get("link").asText === "https://news.example/atom/1")
    assert(r.get("date").asText === "2021-03-01T12:00:00Z")
    assert(r.get("desc").asText === "atom summary")
    assert(r.get("site").asText === "Atom Example")
    assert(r.get("author").asText === "carol")
    // a doctype'd payload is refused outright (XXE hygiene)
    val evil = """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/passwd">]><rss><channel/></rss>"""
    intercept[Exception] { CrawlPoller.parseFeedXml(evil) }
  }

  test("bounded seen-set: recent links survive the cap, old ones re-land once") {
    withServer { (_, base) =>
      val landing = Fixtures.scratchDir("fanout_seen_cap")
      // direct poll of a swappable single endpoint is enough here — the
      // cap logic is per-landing-dir, source-agnostic
      val seenFile = Paths.get(landing, "_seen_links.txt")
      def pollLinks(tick: Long): CrawlPoller.PollResult =
        CrawlPoller.poll(s"$base/news?lang=t$tick", landing, tick, maxSeen = 3)

      // /news?lang=tN serves links news.example/tN + news.example/shared
      val r0 = pollLinks(0)
      assert(r0.landed === 2)
      val r1 = pollLinks(1)
      assert(r1.landed === 1) // shared link already seen
      val r2 = pollLinks(2)
      assert(r2.landed === 1)
      // cap held: file never exceeds maxSeen lines
      assert(Files.readAllLines(seenFile).size === 3)
      // same-tick re-poll: current links are the NEWEST lines, so the
      // trim never drops them — nothing re-lands
      assert(pollLinks(2).landed === 0)
      // the oldest link (t0) was trimmed → re-lands exactly once, which
      // the stream's keyed dedup absorbs (authoritative dedup)
      assert(pollLinks(0).landed === 1)
      val sink = Fixtures.scratchDir("fanout_seen_cap_lake")
      NewsStream.runOnceFanout(spark, landing,
        Fixtures.scratchDir("fanout_seen_cap_tweets"), s"$sink/s", s"$sink/c")
      val links = spark.read.parquet(s"$sink/s")
        .select("link").collect().map(_.getString(0))
      assert(links.length === links.distinct.length) // no dup reached the lake
    }
  }
}
