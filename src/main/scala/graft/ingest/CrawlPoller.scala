package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** S7/S8 first mile: a generic HTTP-JSON poller that turns a remote
  * endpoint into crawler landing files — the piece between "a URL" and
  * the [[graft.streaming.NewsStream]] landing-directory contract
  * (reference: the GoogleNews poll loop, crawl_google_news.py:73-108,
  * which fetches, skips already-indexed links, and indexes the rest).
  *
  * Driver/connector-side by design, like [[HttpFetch]]: the poll is one
  * bounded fetch per tick, not a distributed scan — Spark's work starts
  * at the landing directory. The poller:
  *
  *  - accepts either a JSON ARRAY payload or NDJSON lines (public feeds
  *    come in both shapes), keeping each record's raw JSON verbatim —
  *    schema enforcement belongs to the stream reader, not the crawler;
  *  - drops records without a `link` (the landing key; the reference
  *    skips link-less results the same way) and records whose link has
  *    already been landed, tracked in `_seen_links.txt` — an
  *    OPTIMIZATION to keep re-polled overlap from re-landing forever;
  *    the AUTHORITATIVE dedup stays in the stream's watermarked
  *    `dropDuplicates` (a lost seen-file costs re-processing, never
  *    correctness);
  *  - lands atomically: NDJSON staged under `_staging/`, then one
  *    atomic move into the landing dir, so the streaming file source
  *    (and any batch `spark.read.json`) never lists a half-written
  *    file. Names under `_` are invisible to Spark sources, which is
  *    what keeps `_staging` and `_seen_links.txt` out of every read.
  *
  * Scale note: the seen-set is one line per landed link — fine for a
  * connector process (the reference holds the same set as an ES query
  * per link, strictly worse). If a feed's history outgrows a driver
  * file, the landing retention window bounds it: links older than the
  * stream's watermark can be dropped from the seen-file, because the
  * sink's keyed dedup already holds them.
  */
object CrawlPoller {

  /** One poll's outcome: records fetched, records landed after link
    * dedup, and the landing file (None when nothing new). */
  final case class PollResult(fetched: Int, landed: Int, file: Option[String])

  private val mapper = new ObjectMapper()

  /** Fetch `url`, keep records with an unseen non-empty `link`, land
    * them as one NDJSON file in `landingDir`. `tick` namespaces the
    * landing file (re-fired ticks get distinct suffixes). */
  def poll(url: String, landingDir: String, tick: Long = 0L,
      retries: Int = 3, backoffMs: Long = 500): PollResult = {
    val staging = s"$landingDir/_staging"
    val fetched = HttpFetch.fetchToStaging(url, staging, s"poll_$tick.json",
      retries, backoffMs)
    val records = parseRecords(fetched)
    val seenFile = Paths.get(landingDir, "_seen_links.txt")
    val seen: Set[String] =
      if (Files.exists(seenFile))
        Files.readAllLines(seenFile).asScala.toSet
      else Set.empty
    val fresh = records.flatMap { node =>
      val link = Option(node.get("link")).map(_.asText("")).getOrElse("")
      if (link.isEmpty || seen.contains(link)) None else Some(link -> node)
    }
    // last-wins within one payload: a feed page can repeat a link
    val deduped = fresh.distinctBy(_._1)
    if (deduped.isEmpty) PollResult(records.size, 0, None)
    else {
      val name = f"crawl_t${tick}_${System.currentTimeMillis()}%d.json"
      val tmp = Paths.get(staging, name)
      Files.write(tmp,
        deduped.map { case (_, n) => mapper.writeValueAsString(n) }
          .mkString("\n").getBytes(UTF_8))
      val target = Paths.get(landingDir, name)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      // seen-set update is staged + atomic too: a crash between the two
      // moves re-lands at most one file, which the stream dedups
      val tmpSeen = Paths.get(staging, "_seen_links.txt")
      Files.write(tmpSeen,
        (seen ++ deduped.map(_._1)).toSeq.sorted.mkString("\n").getBytes(UTF_8))
      Files.move(tmpSeen, seenFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      PollResult(records.size, deduped.size, Some(target.toString))
    }
  }

  /** A [[graft.Schedule.Flow]] wrapping [[poll]] — registered BEFORE the
    * landing dir's streaming flow, a tick becomes the reference's full
    * crawl cadence: poll → land → stream → lake. */
  def flow(name: String, url: String, landingDir: String): graft.Schedule.Flow =
    graft.Schedule.Flow(name, tick => { poll(url, landingDir, tick): Unit })

  /** Payload → records: a top-level JSON array, or NDJSON (one object
    * per non-blank line). */
  private def parseRecords(file: Path): Seq[JsonNode] = {
    val raw = new String(Files.readAllBytes(file), UTF_8).trim
    if (raw.isEmpty) Nil
    else if (raw.startsWith("[")) mapper.readTree(raw).elements().asScala.toSeq
    else raw.linesIterator.filter(_.trim.nonEmpty)
      .map(l => mapper.readTree(l)).toSeq
  }
}
