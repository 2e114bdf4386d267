package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.NewsStream

/** Batch correctness query over the streaming news pipeline's sink: the
  * whole EP2 chain (readStream JSON → watermark + (link,date) dedup →
  * AvailableNow parquet sink) runs to completion, then the sink is read
  * back. The DuckDB oracle dedups on the SAME (link, date) key (one
  * survivor per key via row_number), so row counts agree even if
  * same-key payloads ever diverge; cell-level agreement additionally
  * requires identical payloads per key (guaranteed by the fixture —
  * Spark's streaming dropDuplicates keeps an arbitrary first-seen
  * survivor, which no deterministic oracle can mirror otherwise). */
object Streaming {

  private val landing = "/root/repo/fixtures/news_landing"

  def newsDedup(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_news_rt"
    NewsStream.freshRun(spark, landing, scratch)
      .select(col("link"), col("title"), col("lang"),
        col("source.crawler").as("crawler"),
        date_format(col("date"), "yyyy-MM-dd HH:mm").as("event_time"))
  }

  val newsDedupSql: String =
    s"""SELECT link, title, lang, crawler, event_time FROM (
       |  SELECT link, title, lang, source.crawler AS crawler,
       |    strftime(CAST(date AS TIMESTAMP), '%Y-%m-%d %H:%M') AS event_time,
       |    row_number() OVER (PARTITION BY link, CAST(date AS TIMESTAMP)
       |      ORDER BY title, lang) AS rn
       |  FROM read_json('$landing/*.json'))
       |WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_news_dedup" -> (newsDedup _))

  val oracles: Map[String, String] = Map(
    "stream_news_dedup" -> newsDedupSql)
}
