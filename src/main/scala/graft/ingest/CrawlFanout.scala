package graft.ingest

import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.LocalDate

/** S7/S8 source-specific crawl fan-out: the reference's per-source poll
  * configurations expressed as [[CrawlPoller]] feeds.
  *
  *  - GoogleNews fans out (lang ∈ {fr,en}) × (tag ∈ {COVID,CORONA}) with
  *    a 24 h period, injecting `lang` from the loop variable since the
  *    payload doesn't carry it (reference: crawl_google_news.py:86-107 —
  *    `langs = ["fr","en"]; search_tags = ["COVID","CORONA"]`,
  *    `GoogleNews(period="24h")`, `format_new(new, lang)`).
  *  - Tweets synthesize one query `covid since:<yesterday> lang:en`
  *    capped at 1000 results (reference: crawl_tweets.py:58-67 —
  *    `f"covid since:{tweets_from} lang:{lang}"`, `tweet_limit`).
  *
  * All feeds share ONE landing dir and therefore one bounded seen-set —
  * the same cross-feed link dedup the reference gets from its shared ES
  * index — and land through [[graft.streaming.NewsShaping]] P11/P12 into
  * the streamed lake. The fan-out itself stays driver-side (each poll is
  * one bounded fetch); Spark's distributed work starts at the landing
  * directory.
  */
object CrawlFanout {

  /** One configured poll: a feed URL plus the constant provenance fields
    * merged into every record it lands. */
  final case class Feed(name: String, url: String, extra: Map[String, String])

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** The GoogleNews (lang × tag) grid against an HTTP-JSON endpoint.
    * `crawler` provenance rides through [[graft.streaming.NewsShaping
    * .shapeGoogleNews]] into `source.crawler`. */
  def googleNews(endpoint: String,
      langs: Seq[String] = Seq("fr", "en"),
      tags: Seq[String] = Seq("COVID", "CORONA"),
      period: String = "24h"): Seq[Feed] =
    for (lang <- langs; tag <- tags) yield Feed(
      name = s"news_${lang}_${tag.toLowerCase}",
      url = s"$endpoint?q=${enc(tag)}&lang=${enc(lang)}&period=${enc(period)}",
      extra = Map("lang" -> lang, "tag" -> tag, "crawler" -> "googlenews"))

  /** The tweet search query shape: `<query> since:<yesterday> lang:<lang>`
    * with a result cap. `today` is injectable so tests are deterministic;
    * production omits it. */
  def tweets(endpoint: String,
      lang: String = "en",
      query: String = "covid",
      limit: Int = 1000,
      today: LocalDate = LocalDate.now()): Seq[Feed] = {
    val since = today.minusDays(1).toString
    Seq(Feed(
      name = s"tweets_$lang",
      url = s"$endpoint?q=${enc(s"$query since:$since lang:$lang")}&limit=$limit",
      extra = Map("lang" -> lang, "crawler" -> "tweets")))
  }

  /** One [[graft.Schedule.Flow]] per feed, all landing into `landingDir`
    * (shared seen-set ⇒ cross-feed link dedup). Register these BEFORE the
    * landing dir's streaming flow so a tick is the reference's full crawl
    * cadence: poll ×N → land → stream → lake. */
  def flows(feeds: Seq[Feed], landingDir: String): Seq[graft.Schedule.Flow] =
    feeds.map(f => CrawlPoller.flow(f.name, f.url, landingDir, f.extra))
}
