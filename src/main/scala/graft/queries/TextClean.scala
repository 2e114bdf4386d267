package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Markup stripping — the cleaning stage between "crawled HTML" and
  * "training text" (the trafilatura/justext role, reduced to its
  * deterministic core): drop script/style blocks WITH their contents,
  * strip remaining tags, decode the common entities, collapse the
  * whitespace the removals leave behind. Reference position: the news
  * crawler lands `desc` fields that upstream sources deliver as HTML
  * fragments (crawl_google_news.py stores them verbatim).
  *
  * Same execution shape as [[Pii]]: chained `regexp_replace` builtins,
  * one narrow map pass, zero shuffle before the audit aggregation —
  * pure scan work at 100 TB. Patterns are dialect-portable (non-greedy
  * `.*?` via `[^<]*` / explicit end-tag alternatives are avoided;
  * lazy quantifiers behave identically in Java regex and RE2 for these
  * shapes) and the DuckDB oracle replays the identical chain.
  *
  * The fixture is plain prose, so the correctness query WRAPS docs in
  * deterministic markup by doc_id class first (the [[Pii]] injection
  * move) — the strip provably undoes it back to the original text,
  * which is the strongest possible oracle: `sum_len_after` must equal
  * the clean corpus exactly.
  */
object TextClean {

  /** script/style elements, contents included ((?s) makes `.` span
    * newlines; `.*?` lazy so sibling blocks don't merge). */
  val BlockRe = "(?s)<(script|style)[^>]*>.*?</(script|style)>"

  /** Any remaining tag (open/close/self-closing/comment-free). */
  val TagRe = "<[^>]+>"

  /** Decode order matters: `&amp;` LAST, so `&amp;lt;` decodes to
    * `&lt;` (one level, the standard single-pass behavior). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip markup from `textCol`: blocks → tags → entities → whitespace
    * collapse + trim. Pure column transforms, reusable on any corpus. */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(c, BlockRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = Entities.foldLeft(noTags) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** llm_html_strip: wrap docs in markup by class, strip, audit. The
    * round-trip invariant IS the oracle: stripped text must equal the
    * original (normalized), so `len_after` matches the clean corpus
    * and `tags_removed` the injection arithmetic. */
  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val cls = col("doc_id") % 3
    val wrapped =
      when(cls === 0, concat(
        lit("<html><body><p class=\"lead\">"), col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1 &amp;&amp; 2;</script></body></html>")))
        .when(cls === 1, concat(
          lit("<div>"), col("text"),
          lit(" &lt;tagged&gt; &amp; entity-laden</div><style>p { color: red }</style>")))
        .otherwise(col("text"))
    docs
      .select(col("doc_id"), cls.cast("int").as("cls"),
        col("text"), wrapped.as("html"))
      .withColumn("stripped", stripHtml(col("html")))
      .groupBy(col("cls"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("html"))).as("sum_len_html"),
        sum(length(col("stripped"))).as("sum_len_after"),
        // the round-trip check: stripping class-0 markup must restore
        // the EXACT original text; class-1 keeps its decoded suffix
        sum(when(col("stripped") === trim(regexp_replace(col("text"), "\\s+", " ")),
          1L).otherwise(0L)).as("n_roundtrip"))
  }

  val htmlStripSql: String = {
    // the identical strip chain in DuckDB (RE2: (?s) flag, lazy .*?)
    def strip(c: String): String = {
      val noBlocks = s"regexp_replace($c, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g')"
      val noTags = s"regexp_replace($noBlocks, '<[^>]+>', ' ', 'g')"
      val decoded = Seq(
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
        ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&"))
        .foldLeft(noTags) { case (acc, (from, to)) =>
          s"replace($acc, '$from', '$to')"
        }
      s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
    }
    s"""WITH w AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS cls, text,
       |    CASE doc_id % 3
       |      WHEN 0 THEN '<html><body><p class="lead">' || text ||
       |        '</p><script type="text/javascript">var x = 1 &amp;&amp; 2;</script></body></html>'
       |      WHEN 1 THEN '<div>' || text ||
       |        ' &lt;tagged&gt; &amp; entity-laden</div><style>p { color: red }</style>'
       |      ELSE text END AS html
       |  FROM documents),
       |s AS (SELECT cls, text, html, ${strip("html")} AS stripped FROM w)
       |SELECT cls, COUNT(*) AS n_docs,
       |  CAST(SUM(len(html)) AS BIGINT) AS sum_len_html,
       |  CAST(SUM(len(stripped)) AS BIGINT) AS sum_len_after,
       |  CAST(SUM(CASE WHEN stripped = trim(regexp_replace(text, '\\s+', ' ', 'g'))
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip
       |FROM s GROUP BY cls""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_html_strip" -> (htmlStrip _))

  val oracles: Map[String, String] = Map(
    "llm_html_strip" -> htmlStripSql)
}
