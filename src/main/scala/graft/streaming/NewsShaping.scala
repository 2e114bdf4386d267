package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P11/P12 doc shaping (reference: crawl_google_news.py:56-70,
  * crawl_tweets.py:71-84): raw crawler fields → the canonical news
  * schema ([[NewsStream.newsSchema]]). Pure column transforms — the
  * connector writes raw JSON, Spark shapes it.
  */
object NewsShaping {

  private def sourceStruct(crawler: Column, website: Column, author: Column,
      url: Column, tweetId: Column): Column =
    struct(
      crawler.as("crawler"), website.as("website"), author.as("author"),
      url.as("url"), struct(tweetId.as("id")).as("tweet"))

  /** P11: GoogleNews result → news doc. Links arrive host-relative
    * (`news.example/x`) and get the `https://` prefix
    * (crawl_google_news.py:60); missing descs become empty strings. */
  def shapeGoogleNews(raw: DataFrame): DataFrame =
    raw.select(
      col("title"),
      coalesce(col("desc"), lit("")).as("desc"),
      col("date").cast("timestamp").as("date"),
      when(col("link").startsWith("http"), col("link"))
        .otherwise(concat(lit("https://"), col("link"))).as("link"),
      coalesce(col("img"), lit("")).as("img"),
      col("lang"),
      sourceStruct(lit("googlenews"), col("site"), col("author"),
        concat(lit("https://"), col("site")), lit(null).cast("string")).as("source"))

  /** P12: tweet → news doc. Title is synthesized
    * ("Tweet from {user} the {date}", crawl_tweets.py:73); the permalink
    * is derived from the status id. */
  def shapeTweet(raw: DataFrame): DataFrame =
    raw.select(
      concat(lit("Tweet from "), col("user"), lit(" the "),
        date_format(col("date").cast("timestamp"), "yyyy-MM-dd")).as("title"),
      col("content").as("desc"),
      col("date").cast("timestamp").as("date"),
      concat(lit("https://twitter.example/s/"), col("tweet_id")).as("link"),
      lit("").as("img"),
      col("lang"),
      sourceStruct(lit("tweets"), lit("twitter.example"), col("user"),
        concat(lit("https://twitter.example/"), col("user")),
        col("tweet_id")).as("source"))
}
