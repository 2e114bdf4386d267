package graft

import org.apache.spark.sql.functions._

import graft.queries.TextIndex

/** Semantics for the positional-index text family: phrase search
  * cross-checked against a naive string scan (a genuinely different
  * algorithm), significant-terms frequency laws, and the collocation
  * miner's no-self-join plan invariant. */
class TextIndexSpec extends SparkSpec {

  private def normed = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"),
      regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("s"))

  test("txt_phrase_search equals a naive substring scan over normalized text") {
    val out = TextIndex.phraseSearch(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matches")).toMap
    // Independent check: count token-aligned occurrences by walking the
    // token arrays on the driver (sf0.001 is small).
    val phrase = TextIndex.Phrase
    val naive = normed.collect().map { r =>
      val toks = r.getAs[String]("s").split(" ")
      val hits = toks.indices.count(i =>
        i + phrase.size <= toks.length &&
          phrase.indices.forall(k => toks(i + k) == phrase(k)))
      r.getAs[Long]("doc_id") -> hits.toLong
    }.filter(_._2 > 0).toMap
    assert(out == naive)
    assert(out.nonEmpty, "demo phrase matches nothing at sf0.001 — pick a new phrase")
  }

  test("txt_phrase_search first_pos points at an actual occurrence") {
    val firsts = TextIndex.phraseSearch(spark, sf0001).collect()
    val texts = normed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("s").split(" ")).toMap
    firsts.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      val p = r.getAs[Long]("first_pos").toInt - 1 // 1-based catalog output
      TextIndex.Phrase.indices.foreach(k => assert(toks(p + k) == TextIndex.Phrase(k)))
    }
  }

  test("txt_significant_terms: df laws hold and output is lift-ordered") {
    val out = TextIndex.significantTerms(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("fg_df") >= 3)
      assert(r.getAs[Long]("fg_df") <= r.getAs[Long]("bg_df"))
      assert(r.getAs[Double]("lift") > 0)
    }
    val lifts = out.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("txt_collocations: lift recomputes from its own count columns") {
    val out = TextIndex.collocations(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nTokens = Tables.load(spark, sf0001, "documents")
      .select(size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    out.foreach { r =>
      val expect = (r.getAs[Long]("n_ab").toDouble * nTokens.toDouble) /
        (r.getAs[Long]("n_a").toDouble * r.getAs[Long]("n_b").toDouble)
      assert(r.getAs[Double]("lift") == expect)
      assert(r.getAs[Long]("n_ab") >= 5)
    }
  }

  test("txt_collocations derives bigrams without any self-join of postings") {
    // The scale claim: bigrams come from zip_with inside the scan
    // projection, so the plan contains at most the two counting
    // aggregates' exchanges and the vocab-sized scoring joins — no
    // sort-merge of the full postings against itself.
    val df = TextIndex.collocations(spark, sf0001)
    val smjs = PlanTestUtil.deepCollect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smjs.isEmpty, s"postings self-join appeared: ${smjs.size} SMJs")
  }
}
