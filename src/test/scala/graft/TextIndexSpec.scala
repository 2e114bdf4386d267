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

  private def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("txt_fuzzy_search: the deletion-key join finds exactly the naive levenshtein scan's matches") {
    val out = TextIndex.fuzzySearch(spark, sf0001).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("dist")).toMap
    val vocab = normed.collect().flatMap(_.getAs[String]("s").split(" ")).distinct
    val naive = vocab.filter(w => levenshtein(w, TextIndex.FuzzyQuery) <= 1)
      .map(w => w -> levenshtein(w, TextIndex.FuzzyQuery).toLong).toMap
    assert(out == naive, s"SymSpell index missed or invented matches: got $out, naive $naive")
    assert(out.size >= 2, "fuzzy demo query should match multiple vocabulary terms")
    assert(out.values.exists(_ == 1L), "no distance-1 match — the fuzziness is vacuous")
  }

  test("txt_more_like_this: scores recompute from the source doc's rational-idf weights") {
    val out = TextIndex.moreLikeThis(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getAs[Long]("doc_id") == 42L), "source doc must be excluded")
    // Driver-side re-derivation over the collected corpus.
    val terms = normed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("s").split(" ").toSet)
    val df = terms.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.length }
    val src = terms.find(_._1 == 42L).get._2
    val weights = src.map(w => w -> 1000000L / df(w)).toMap
    val scores = terms.filter(_._1 != 42L).map { case (id, ts) =>
      val shared = ts.intersect(src)
      id -> (shared.toSeq.map(weights).sum, shared.size)
    }.filter(_._2._1 > 0).toMap
    out.foreach { r =>
      val (score, nShared) = scores(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("score") == score && r.getAs[Long]("n_shared") == nShared)
    }
    // The page really is the global top by (score, doc_id).
    val topIds = scores.toSeq.sortBy { case (id, (s, _)) => (-s, id) }
      .take(out.length).map(_._1)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == topIds)
  }

  test("txt_autocomplete: prefix-filtered, popularity-ordered, capped") {
    val out = TextIndex.autocomplete(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 8)
    out.foreach(r => assert(r.getAs[String]("w").startsWith("s")))
    val dfs = out.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
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
