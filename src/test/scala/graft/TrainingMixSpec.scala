package graft

import org.apache.spark.sql.functions._
import graft.queries.{TrainingMix, VectorSearch}

/** Semantic checks for the training-mixture operators that the
  * engine-agreement oracle can't see (an identical bug in both engines
  * would still hash-match). */
class TrainingMixSpec extends SparkSpec {

  test("DSIR: weights prefer the target domain and both verdicts occur") {
    val rows = TrainingMix.dsirWeights(spark, sf0001).collect()
    val docs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.length.toLong === docs, "one weight per document")
    // the resampling preference must actually lean toward the target
    // domain: mean log-weight of en docs above mean of the rest (the
    // whole point of the importance ratio)
    def mean(lang: String => Boolean): Double = {
      val xs = rows.filter(r => lang(r.getAs[String]("lang")))
        .map(_.getAs[Double]("log_w"))
      xs.sum / xs.length
    }
    assert(mean(_ == "en") > mean(_ != "en"),
      "en (target) mean weight must exceed non-target mean")
    // gate non-vacuity: both dsir_pos verdicts present at this SF
    val pos = rows.count(_.getAs[Boolean]("dsir_pos"))
    assert(pos > 0 && pos < rows.length, s"dsir_pos vacuous: $pos/${rows.length}")
    // flag consistency with the emitted rounded weight
    rows.foreach { r =>
      assert(r.getAs[Boolean]("dsir_pos") === (r.getAs[Double]("log_w") > 0.0))
    }
  }

  test("curriculum: bands partition the corpus with monotone difficulty") {
    val rows = TrainingMix.curriculumBands(spark, sf0001).collect()
    val docs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs,
      "bands must partition the corpus")
    val bands = rows.map(_.getAs[Long]("band")).distinct.sorted
    assert(bands.forall(b => b >= 0 && b <= 3))
    assert(bands.length >= 3, s"degenerate banding: only $bands present")
    // score ranges of the bands are disjoint by construction, so within
    // every language the per-band mean must be strictly increasing
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBand = rs.sortBy(_.getAs[Long]("band"))
        .map(r => (r.getAs[Long]("band"), r.getAs[Double]("avg_score")))
      byBand.zip(byBand.tail).foreach { case ((b1, s1), (b2, s2)) =>
        assert(s1 < s2, s"$lang: band $b1 mean $s1 !< band $b2 mean $s2")
      }
    }
  }

  test("hard negatives: label-disjoint, dense ranks, agree with the full ranking") {
    val rows = VectorSearch.hardNegatives(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("q_label") !== r.getAs[Long]("neg_label"),
        "a hard negative must carry a different label than its probe")
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rs.length),
        s"probe $q: ranks not dense")
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
    // agreement with the exact ranking: the mined negatives are exactly
    // the first k different-label entries of the unfiltered cosine
    // ranking (same corpus pass, same tie-break) — pins that the label
    // filter never perturbs scores or order
    val labels = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = VectorSearch.annSearch(spark, sf0001, 0L until 5L, k = 100000)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val expect = full(q).sortBy(_.getAs[Long]("rank"))
        .filter(r => labels(r.getAs[Long]("neighbor_id")) != labels(q))
        .take(rs.length).map(_.getAs[Long]("neighbor_id")).toSeq
      val got = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq
      assert(got === expect, s"probe $q: mined negatives diverge from full ranking")
    }
  }
}
