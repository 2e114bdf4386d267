package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{Pii, TextClean}

/** Property hardening for the cleaning family over GENERATED hostile
  * inputs (the fixture specs pin known cases; these pin the space
  * between them):
  *
  *  - scrub completeness: after redaction, NO pattern of any PII class
  *    matches the output — a partial replacement (e.g. a phone whose
  *    tail survives as a fresh match) would silently leak.
  *  - scrub idempotence: scrubbing a redacted text changes nothing.
  *  - strip convergence: repeated stripHtml reaches a fixpoint within
  *    the nesting depth of the input (entities decode ONE level per
  *    pass by contract), and no live tag survives at the fixpoint.
  *
  * Cases are generated from a FIXED seed, so a failure reproduces —
  * these are deterministic gates, not sampled ones. Each property runs
  * as one batched Spark pass, not per-case jobs. */
class CleanPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  /** Run a text batch through scrub and return (redacted, re-matches). */
  private def scrubAll(texts: Seq[String]): Seq[(String, Long)] = {
    import spark.implicits._
    val df = texts.toDF("text")
    Pii.scrub(df, "text")
      .select(col("redacted"),
        (regexp_count(col("redacted"), lit(Pii.EmailRe)) +
          regexp_count(col("redacted"), lit(Pii.PhoneRe)) +
          regexp_count(col("redacted"), lit(Pii.Ipv4Re))).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
  private val email = for {
    l <- word; d <- word; t <- Gen.oneOf("com", "org", "io", "fr")
  } yield s"$l@$d.$t"
  private val phone = for {
    cc <- Gen.chooseNum(1, 999); a <- Gen.chooseNum(100, 999)
    b <- Gen.chooseNum(100, 9999); s <- Gen.oneOf("-", " ", ".")
  } yield s"+$cc$s$a$s$b"
  private val ip = for {
    a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
    c <- Gen.chooseNum(0, 255); d <- Gen.chooseNum(0, 255)
  } yield s"$a.$b.$c.$d"
  private val hostile = for {
    ws <- Gen.listOfN(6, word)
    pii <- Gen.someOf(email, phone, ip)
    glue <- Gen.oneOf(" ", "  ", " , ", " <b> ")
  } yield (ws ++ pii).mkString(glue)

  test("scrub leaves no residual PII match and is idempotent (generated)") {
    val texts = sample(Gen.listOfN(150, hostile), seed = 42L)
    val first = scrubAll(texts)
    assert(first.forall(_._2 == 0L),
      s"residual PII after scrub: ${first.filter(_._2 > 0).take(3)}")
    val second = scrubAll(first.map(_._1))
    assert(second.map(_._1) === first.map(_._1), "scrub is not idempotent")
  }

  test("stripHtml converges to a tag-free fixpoint on nested hostile markup") {
    import spark.implicits._
    val tag = Gen.oneOf("<p>", "</p>", "<div class='x'>", "<br/>",
      "<script>var x=1;</script>", "<b")
    val ent = Gen.oneOf("&amp;lt;", "&amp;amp;", "&amp;gt;", "&lt;b&gt;",
      "&quot;q&quot;", "&amp;lt;script&amp;gt;")
    val piece = Gen.oneOf(word, tag, ent)
    val html = Gen.listOfN(8, piece).map(_.mkString(" "))
    var cur = sample(Gen.listOfN(150, html), seed = 7L)
    def strip(ts: Seq[String]): List[String] =
      ts.toDF("t").select(TextClean.stripHtml(col("t")).as("s"))
        .collect().map(_.getString(0)).toList
    // entity nesting in the generator is ≤ 2 levels, so 2 decode passes
    // plus 1 tag pass over anything decoding uncovered must suffice; 5
    // is the hard bound — non-convergence by then means a rewrite loop
    var prev: List[String] = null
    var passes = 0
    while (passes < 5 && cur != prev) { prev = cur; cur = strip(cur); passes += 1 }
    assert(cur === prev, s"stripHtml still rewriting after $passes passes")
    assert(cur.forall(s => !s.matches(".*<[a-zA-Z/][^>]*>.*")),
      s"live tag survived at the fixpoint: ${cur.find(_.matches(".*<[a-zA-Z/][^>]*>.*"))}")
  }
}
