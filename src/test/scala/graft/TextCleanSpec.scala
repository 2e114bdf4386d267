package graft

import org.apache.spark.sql.functions.col

import graft.queries.TextClean

/** Markup strip: exact behavior on hand-built fragments (the oracle
  * checks aggregates; this pins the per-string chain) and the
  * round-trip invariant on the live fixture. */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextClean.stripHtml(col("t"))).as[String]
      .collect().head

  test("blocks drop with contents, tags strip, entities decode one level") {
    assert(strip("<html><body><p class=\"x\">hello world</p>" +
      "<script type=\"text/javascript\">var x = 1 &amp;&amp; 2;</script>" +
      "</body></html>") === "hello world")
    assert(strip("<div>core &lt;tagged&gt; &amp; more</div>" +
      "<style>p { color: red }</style>") === "core <tagged> & more")
    // lazy block match: two script blocks must not merge and eat "mid"
    assert(strip("<script>a</script>mid<script>b</script>") === "mid")
    // one-level entity decode (&amp;lt; -> &lt;, not <)
    assert(strip("five &amp;lt; six") === "five &lt; six")
    // untouched prose passes through (modulo whitespace collapse)
    assert(strip("plain  text   stays") === "plain text stays")
    // self-closing + attributes with > inside quotes are out of scope
    // for the regex core; plain self-closing strips fine
    assert(strip("a<br/>b <img src=\"x.png\"/> c") === "a b c")
  }

  test("clean pipeline: per-lang audit is internally consistent and non-vacuous") {
    val rows = TextClean.cleanPipeline(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var pii = 0L; var paras = 0L; var kept = 0L
    rows.foreach { r =>
      val (nd, np, sp, sk) = (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_pii"),
        r.getAs[Long]("sum_paras"), r.getAs[Long]("sum_kept"))
      assert(nd > 0 && sk <= sp, r.toString)
      pii += np; paras += sp; kept += sk
    }
    // ~3/4 of docs get one injected PII item, the scrub must find them
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(pii >= (nDocs * 6) / 10, s"pii $pii of $nDocs docs")
    // dedup dropped something (tiny vocab -> collisions) but not everything
    assert(kept < paras && kept > paras / 2, s"kept $kept of $paras")
  }

  test("fixture round-trip: class-0 wrapping strips back to the original text") {
    val out = TextClean.htmlStrip(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(0, 1, 2))
    // every class-0 doc round-trips exactly
    assert(out(0).getAs[Long]("n_roundtrip") === out(0).getAs[Long]("n_docs"))
    // class-1 keeps its decoded suffix -> never equal
    assert(out(1).getAs[Long]("n_roundtrip") === 0L)
    // class-2 is untouched prose -> round-trips trivially
    assert(out(2).getAs[Long]("n_roundtrip") === out(2).getAs[Long]("n_docs"))
    // stripping shrank the wrapped classes
    Seq(0, 1).foreach { c =>
      assert(out(c).getAs[Long]("sum_len_after") < out(c).getAs[Long]("sum_len_html"), c)
    }
  }

  test("line scrub: same-source repeats removed everywhere, cross-source kept, order intact") {
    // 10-token paragraphs (ParaTokens). B repeats in two docs of srcA →
    // boilerplate, removed from BOTH. X repeats across srcA and srcB →
    // NOT boilerplate (the rule is per-source). U/V/W are unique.
    val b = (1 to 10).map(i => s"b$i").mkString(" ")
    val x = (1 to 10).map(i => s"x$i").mkString(" ")
    def uniq(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", s"${uniq("u")} $b $x"),
      (2L, "srcA", s"$b ${uniq("v")}"),
      (3L, "srcB", s"$x ${uniq("w")}")).toDF("doc_id", "source", "text")
    val out = graft.queries.TextClean.lineScrubAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_paras"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("cleaned_chars"))).toMap
    assert(out(1L) === ((3L, 1L, (uniq("u") + " " + x).length.toLong)),
      "doc 1 must lose exactly the same-source boilerplate para, keeping order")
    assert(out(2L) === ((2L, 1L, uniq("v").length.toLong)))
    assert(out(3L) === ((2L, 0L, (x + " " + uniq("w")).length.toLong)),
      "a paragraph shared only ACROSS sources is not boilerplate")
  }
}
