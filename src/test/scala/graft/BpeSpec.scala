package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.queries.{Curation, TextAnalysis}

/** Trained-BPE tokenizer: trainer determinism (the checked-in merges
  * artifact must be exactly what the trainer reproduces), encoder
  * semantics the cross-engine oracle can't isolate (leftmost-lowest-rank
  * order, lossless segmentation), and the catalog queries built on it. */
class BpeSpec extends SparkSpec {

  test("trainer is deterministic and reproduces the checked-in fixture merges") {
    // Same invocation as `BpeTrain.main` defaults — if this fails, the
    // artifact drifted from the corpus; rerun `runMain graft.functions.BpeTrain`.
    val retrained = Bpe.trainFromFixture(spark, 200)
    assert(retrained === Bpe.fixtureMerges,
      "fixtures/bpe_merges.txt is not what BpeTrain would write")
    assert(retrained.nonEmpty)
  }

  test("training on a hand corpus merges most-frequent pairs first, ties lexicographic") {
    // "abab" x3, "abcd" x1: pair counts a+b=7, b+a=3, b+c=1, c+d=1.
    val merges = Bpe.train(Map("abab" -> 3L, "abcd" -> 1L), numMerges = 2)
    assert(merges.head === ("a", "b"))
    // After merging "ab": words are [ab ab] x3, [ab c d]. Pairs:
    // ab+ab=3, ab+c=1, c+d=1 -> next merge is (ab, ab).
    assert(merges(1) === ("ab", "ab"))
    // minCount=2 stops before the singleton pairs.
    assert(merges.length === 2)
  }

  test("encoding merges the LEFTMOST occurrence of the LOWEST-rank pair") {
    // rank 0 = (b, c); in "abcbc" the leftmost bc merges first, and a
    // later rank-1 pair (a, bc) only applies after rank 0 is exhausted.
    val rank = Bpe.ranks(Seq(("b", "c"), ("a", "bc")))
    assert(Bpe.encodeWord("abcbc", rank) === Vector("abc", "bc"))
    // Lower rank wins over an earlier position of a higher-rank pair:
    // rank 0 (c, d) applies at position 3 before rank 1 (a, b) at 1.
    val rank2 = Bpe.ranks(Seq(("c", "d"), ("a", "b"), ("ab", "cd")))
    assert(Bpe.encodeWord("abcd", rank2) === Vector("abcd"))
  }

  test("encoding is lossless: tokens concatenate back to the pre-token stream") {
    val rank = Bpe.ranks(Bpe.fixtureMerges)
    val texts = Seq("Spark joins shuffle data, 2021-03!", "", "a",
      "the weekly case counts rose 10% in region X")
    texts.foreach { t =>
      assert(Bpe.encode(t, rank).mkString === Bpe.preTokens(t).mkString)
    }
  }

  test("tokenCountCol / tokensCol agree with the driver-side encoder") {
    import spark.implicits._
    val df = spark.createDataset(Seq(
      "The 2021 weekly report", "vaccination rates rose", "")).toDF("text")
    val cnt = Bpe.tokenCountCol(Bpe.fixtureMerges)
    val tks = Bpe.tokensCol(Bpe.fixtureMerges)
    val got = df.select(col("text"), cnt(col("text")).as("n"),
      tks(col("text")).as("t")).collect()
    val rank = Bpe.ranks(Bpe.fixtureMerges)
    got.foreach { r =>
      val expect = Bpe.encode(r.getString(0), rank)
      assert(r.getLong(1) === expect.length.toLong)
      assert(r.getSeq[String](2) === expect)
    }
  }

  test("txt_bpe_stats refines the regex proxy: BPE tokens never exceed chars, never fall below pre-tokens") {
    val bpe = TextAnalysis.bpeTokenStats(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("sum_bpe_toks")).toMap
    val proxy = TextAnalysis.tokenStats(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("sum_bpe_toks")).toMap
    assert(bpe.nonEmpty && bpe.keySet === proxy.keySet)
    // each merge only ever reduces a word's token count, starting from
    // characters; and a word is at least one token
    bpe.foreach { case (src, n) => assert(n >= proxy(src)) }
  }

  test("llm_chunk_docs_bpe geometry: strides cover the stream, hashes keyed to BPE tokens") {
    val rows = Curation.chunkDocsBpe(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, cs) =>
      val n = cs.head.getAs[Long]("n_chunks")
      assert(cs.length.toLong === n)
      assert(cs.map(_.getAs[Long]("chunk_idx")).sorted.toSeq === (0L until n))
    }
  }

  test("llm_token_budget_bpe spends the budget in BPE tokens and keeps the quality order") {
    val rows = Curation.tokenBudgetBpe(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // cum_toks is a running sum of bpe_toks in (ttr DESC, doc_id ASC) order
    val ordered = rows.sortBy(r => (-r.getAs[Long]("ttr"), r.getAs[Long]("doc_id")))
    var cum = 0L
    ordered.foreach { r =>
      cum += r.getAs[Long]("bpe_toks")
      assert(r.getAs[Long]("cum_toks") === cum)
    }
  }
}
