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
  * Scale note: the seen-set is BOUNDED — one line per landed link, kept
  * in landing order and trimmed to the newest `maxSeen` on every write,
  * so the file never grows with total crawl history (the reference holds
  * the same set as an ES query per link, strictly worse). Trimming is
  * safe because recent links (the re-poll overlap window) are the newest
  * lines and survive the cut, while anything old enough to be trimmed is
  * already held by the stream's watermarked keyed dedup — the
  * AUTHORITATIVE dedup; a trimmed link re-lands at most once and never
  * reaches the lake twice.
  */
object CrawlPoller {

  /** One poll's outcome: records fetched, records landed after link
    * dedup, the landing file (None when nothing new), and whether the
    * server answered 304 (feed unchanged — nothing was downloaded). */
  final case class PollResult(fetched: Int, landed: Int,
      file: Option[String], notModified: Boolean = false)

  private val mapper = new ObjectMapper()

  /** Fetch `url`, keep records with an unseen non-empty `link`, land
    * them as one NDJSON file in `landingDir`. `tick` namespaces the
    * landing file (re-fired ticks get distinct suffixes). `extra` fields
    * are merged into every landed record — how a fan-out poll injects
    * crawl provenance the payload itself doesn't carry (the reference
    * injects `lang` from its loop variable the same way,
    * crawl_google_news.py:66). `maxSeen` bounds the seen-file to the
    * newest links in landing order. */
  def poll(url: String, landingDir: String, tick: Long = 0L,
      retries: Int = 3, backoffMs: Long = 500,
      extra: Map[String, String] = Map.empty,
      maxSeen: Int = 100000): PollResult = {
    val staging = s"$landingDir/_staging"
    // conditional GET: replay the feed's cached validators; a 304 means
    // nothing was downloaded, the tick is done — the polite-crawler
    // fast path for a 24 h cadence against a slow-moving feed
    val cached = readValidators(landingDir).getOrElse(url, HttpFetch.Validators())
    val fetchedOpt = HttpFetch.fetchConditional(url, staging, s"poll_$tick.json",
      retries, backoffMs, cached)
    if (fetchedOpt.isEmpty) return PollResult(0, 0, None, notModified = true)
    val (fetched, fresh0) = fetchedOpt.get
    if (fresh0 != cached) writeValidators(landingDir, url, fresh0)
    val records = parseRecords(fetched)
    val seenFile = Paths.get(landingDir, "_seen_links.txt")
    // landing order, oldest first (pre-bound files were sorted; order only
    // affects which links a trim drops, not dedup correctness)
    val seenLines: Seq[String] =
      if (Files.exists(seenFile))
        Files.readAllLines(seenFile).asScala.toSeq
      else Seq.empty
    val seen: Set[String] = seenLines.toSet
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
        deduped.map { case (_, n) => mapper.writeValueAsString(enrich(n, extra)) }
          .mkString("\n").getBytes(UTF_8))
      val target = Paths.get(landingDir, name)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      // seen-set update is staged + atomic too: a crash between the two
      // moves re-lands at most one file, which the stream dedups.
      // Newest links last; trim from the front so the re-poll overlap
      // window (always recent) survives the cap.
      val tmpSeen = Paths.get(staging, "_seen_links.txt")
      Files.write(tmpSeen,
        (seenLines ++ deduped.map(_._1)).takeRight(maxSeen)
          .mkString("\n").getBytes(UTF_8))
      Files.move(tmpSeen, seenFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      PollResult(records.size, deduped.size, Some(target.toString))
    }
  }

  /** Merge constant provenance fields into a record (payload fields win —
    * a feed that already states its lang keeps it). */
  private def enrich(node: JsonNode, extra: Map[String, String]): JsonNode =
    if (extra.isEmpty || !node.isObject) node
    else {
      val obj = node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      extra.foreach { case (k, v) => if (!obj.has(k)) obj.put(k, v) }
      obj
    }

  /** A [[graft.Schedule.Flow]] wrapping [[poll]] — registered BEFORE the
    * landing dir's streaming flow, a tick becomes the reference's full
    * crawl cadence: poll → land → stream → lake. */
  def flow(name: String, url: String, landingDir: String,
      extra: Map[String, String] = Map.empty): graft.Schedule.Flow =
    graft.Schedule.Flow(name, tick => { poll(url, landingDir, tick, extra = extra): Unit })

  /** Per-URL response validators (`url TAB etag TAB last-modified`,
    * empty slots as blank) kept next to the seen-set — one line per
    * FEED, so the file is bounded by the fan-out width, not history.
    * Same `_`-prefixed invisibility and staged-atomic-move discipline
    * as the seen-set; a lost file merely costs one full refetch. */
  private def validatorsFile(landingDir: String) =
    Paths.get(landingDir, "_http_validators.txt")

  private def readValidators(landingDir: String): Map[String, HttpFetch.Validators] = {
    val f = validatorsFile(landingDir)
    if (!Files.exists(f)) Map.empty
    else Files.readAllLines(f).asScala.flatMap { line =>
      line.split("\t", -1) match {
        case Array(u, e, m) => Some(u -> HttpFetch.Validators(
          Option(e).filter(_.nonEmpty), Option(m).filter(_.nonEmpty)))
        case _ => None
      }
    }.toMap
  }

  private def writeValidators(landingDir: String, url: String,
      v: HttpFetch.Validators): Unit = {
    val staging = Paths.get(landingDir, "_staging")
    Files.createDirectories(staging)
    val updated = readValidators(landingDir) + (url -> v)
    val tmp = staging.resolve("_http_validators.txt")
    Files.write(tmp, updated.toSeq.sortBy(_._1).map { case (u, vv) =>
      s"$u\t${vv.etag.getOrElse("")}\t${vv.lastModified.getOrElse("")}"
    }.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, validatorsFile(landingDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Payload → records: a top-level JSON array, NDJSON (one object per
    * non-blank line), or an RSS/Atom XML feed — the ACTUAL GoogleNews
    * first-mile shape (the reference's GoogleNews library scrapes the
    * news.google.com RSS; format_new consumes its title/desc/img/link/
    * site/datetime fields, crawl_google_news.py:56-70). XML items are
    * normalized to the same raw-record JSON the P11 shaper
    * ([[graft.streaming.NewsShaping.shapeGoogleNews]]) expects, so one
    * landing contract serves every payload shape. */
  private def parseRecords(file: Path): Seq[JsonNode] = {
    val raw = new String(Files.readAllBytes(file), UTF_8).trim
    if (raw.isEmpty) Nil
    else if (raw.startsWith("<")) parseFeedXml(raw)
    else if (raw.startsWith("[")) mapper.readTree(raw).elements().asScala.toSeq
    else raw.linesIterator.filter(_.trim.nonEmpty)
      .map(l => mapper.readTree(l)).toSeq
  }

  /** RSS 2.0 `<item>` / Atom `<entry>` → raw news-record JSON with the
    * [[graft.streaming.NewsShaping.shapeGoogleNews]] field names:
    * title, desc, date (ISO-8601), link, img, site, author. DOM parse
    * via the JDK with DTDs and external entities OFF (a crawled feed is
    * untrusted input; XXE through a news payload must be impossible). */
  /** Hostile-feed output bounds: a crawled feed is untrusted, so no
    * single field may land megabytes into a record (a 100 MB CDATA
    * title must not become a 100 MB lake row) and no feed may fan out
    * an unbounded item count in one poll. Truncation, not rejection:
    * the first `MaxFieldChars` of a pathological title still identify
    * the story; the raw payload stays in the staging file regardless. */
  private[graft] val MaxFieldChars = 65536
  private[graft] val MaxFeedItems = 10000

  private[graft] def parseFeedXml(raw: String): Seq[JsonNode] = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setXIncludeAware(false); dbf.setExpandEntityReferences(false)
    dbf.setNamespaceAware(true)
    val doc = dbf.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(raw.getBytes(UTF_8)))

    def children(e: org.w3c.dom.Element, local: String): Seq[org.w3c.dom.Element] = {
      val out = Seq.newBuilder[org.w3c.dom.Element]
      val kids = e.getChildNodes
      var i = 0
      while (i < kids.getLength) {
        kids.item(i) match {
          case c: org.w3c.dom.Element if c.getLocalName == local => out += c
          case _ =>
        }
        i += 1
      }
      out.result()
    }
    def text(e: org.w3c.dom.Element, local: String): String =
      children(e, local).headOption.map(_.getTextContent.trim).getOrElse("")

    // RSS descriptions arrive as escaped HTML ("<a href=..>Title</a>…");
    // the shaped doc wants readable text, so tags are stripped and the
    // few entities feeds actually emit are unescaped. Not a sanitizer —
    // a DISPLAY normalization; the raw payload stays in the landing file.
    def stripHtml(s0: String): String =
      // &amp; unescapes LAST: doing it first would turn double-escaped
      // markup (&amp;lt;a&amp;gt;) into live tags AFTER the tag-strip
      // already ran, landing raw HTML in the shaped desc
      s0.replaceAll("<[^>]*>", " ")
        .replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
        .replace("&amp;", "&")
        .replaceAll("\\s+", " ").trim

    // Feed dates: RSS uses RFC-1123 pubDate, Atom ISO-8601
    // published/updated; both normalize to an ISO instant so the
    // shaper's `cast("timestamp")` parses them identically. An
    // unparseable date passes through raw (casts to null downstream —
    // a visible absence, not a silent wrong time).
    def isoDate(s0: String): String =
      if (s0.isEmpty) s0
      else {
        import java.time.format.DateTimeFormatter
        val tries = Seq[String => String](
          v => java.time.ZonedDateTime.parse(v, DateTimeFormatter.RFC_1123_DATE_TIME)
            .toInstant.toString,
          v => java.time.OffsetDateTime.parse(v).toInstant.toString,
          v => java.time.LocalDateTime.parse(v).toString)
        tries.view.flatMap(f => scala.util.Try(f(s0)).toOption)
          .headOption.getOrElse(s0)
      }

    def record(title: String, desc: String, date: String, link: String,
        img: String, site: String, author: String): JsonNode = {
      def cap(s: String): String =
        if (s.length > MaxFieldChars) s.substring(0, MaxFieldChars) else s
      val o = mapper.createObjectNode()
      o.put("title", cap(title)); o.put("desc", cap(desc))
      o.put("date", cap(date)); o.put("link", cap(link))
      o.put("img", cap(img)); o.put("site", cap(site))
      o.put("author", cap(author))
      o
    }

    val root = doc.getDocumentElement
    val all = root.getLocalName match {
      case "rss" =>
        children(root, "channel").flatMap { ch =>
          children(ch, "item").take(MaxFeedItems).map { it =>
            // media:content/enclosure carry the thumbnail as a url attr
            val img = (children(it, "content") ++ children(it, "thumbnail") ++
              children(it, "enclosure"))
              .flatMap(e => Option(e.getAttribute("url")).filter(_.nonEmpty))
              .headOption.getOrElse("")
            record(
              title = text(it, "title"),
              desc = stripHtml(text(it, "description")),
              date = isoDate(text(it, "pubDate")),
              link = text(it, "link"),
              img = img,
              site = text(it, "source"),
              author = text(it, "creator")) // dc:creator, local name
          }
        }
      case "feed" => // Atom: site defaults to the feed's own title
        val feedTitle = text(root, "title")
        children(root, "entry").take(MaxFeedItems).map { en =>
          val link = children(en, "link")
            .sortBy(e => if (e.getAttribute("rel") == "" ||
              e.getAttribute("rel") == "alternate") 0 else 1)
            .flatMap(e => Option(e.getAttribute("href")).filter(_.nonEmpty))
            .headOption.getOrElse(text(en, "link"))
          val author = children(en, "author").headOption
            .map(a => text(a, "name")).getOrElse("")
          val date = Seq(text(en, "published"), text(en, "updated"))
            .find(_.nonEmpty).getOrElse("")
          val desc = Seq(text(en, "summary"), text(en, "content"))
            .find(_.nonEmpty).getOrElse("")
          record(text(en, "title"), stripHtml(desc), isoDate(date),
            link, img = "", site = feedTitle, author = author)
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported feed root <$other>")
    }
    // item-count bound, applied to the assembled list: a hostile feed
    // fanning out millions of <item>s lands at most MaxFeedItems records
    if (all.length > MaxFeedItems) all.take(MaxFeedItems) else all
  }
}
