package graft

import org.apache.spark.sql.Row
import graft.streaming.{NewsShaping, NewsStream}

/** P11/P12 shaping semantics + schema compatibility with the streaming
  * pipeline's canonical news schema. */
class NewsShapingSpec extends SparkSpec {

  test("P11: google news shaping — link prefix, null desc, source struct") {
    import spark.implicits._
    val raw = Seq(
      ("Cases drop", null: String, "2021-03-01 10:00:00", "news.example/x1",
        null: String, "en", "news.example", "alice"),
      ("Deja prefixed", "d", "2021-03-01 11:00:00", "https://news.example/x2",
        "i.jpg", "fr", "news.example", "bob"))
      .toDF("title", "desc", "date", "link", "img", "lang", "site", "author")
    val out = NewsShaping.shapeGoogleNews(raw).collect()
      .map(r => r.getAs[String]("link") -> r).toMap
    assert(out.contains("https://news.example/x1")) // prefix added
    assert(out.contains("https://news.example/x2")) // left alone
    val r1 = out("https://news.example/x1")
    assert(r1.getAs[String]("desc") === "")
    val src = r1.getAs[Row]("source")
    assert(src.getAs[String]("crawler") === "googlenews")
    assert(src.getAs[Row]("tweet").isNullAt(0))
  }

  test("P12: tweet shaping — synthesized title and permalink") {
    import spark.implicits._
    val raw = Seq(("user1", "covid update", "2021-03-03 12:00:00", "1001", "en"))
      .toDF("user", "content", "date", "tweet_id", "lang")
    val r = NewsShaping.shapeTweet(raw).collect()(0)
    assert(r.getAs[String]("title") === "Tweet from user1 the 2021-03-03")
    assert(r.getAs[String]("link") === "https://twitter.example/s/1001")
    assert(r.getAs[Row]("source").getAs[Row]("tweet").getAs[String]("id") === "1001")
  }

  test("shaped docs union by name into the canonical news schema") {
    import spark.implicits._
    val g = NewsShaping.shapeGoogleNews(
      Seq(("t", "d", "2021-03-01 10:00:00", "news.example/x", "", "en", "s", "a"))
        .toDF("title", "desc", "date", "link", "img", "lang", "site", "author"))
    val t = NewsShaping.shapeTweet(
      Seq(("u", "c", "2021-03-03 12:00:00", "1", "en"))
        .toDF("user", "content", "date", "tweet_id", "lang"))
    val all = g.unionByName(t)
    assert(all.count() === 2)
    assert(all.schema.fieldNames.toSeq === NewsStream.newsSchema.fieldNames.toSeq)
  }
}
