package graft

import graft.queries.TextAnalysis

/** CCNet tercile bucketing laws: score consistency with the catalog's
  * unigram LM (same signal, independent plan), balanced per-lang
  * terciles, and the head ≥ middle ≥ tail ordering invariant. */
class CcnetBucketsSpec extends SparkSpec {

  private lazy val rows = TextAnalysis.ccnetBuckets(spark, sf0001).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))

  test("avg_lp agrees with txt_unigram_lm doc-for-doc") {
    val lm = TextAnalysis.unigramLm(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.map(_._1).toSet === lm.keySet)
    rows.foreach { case (id, _, lp, _) =>
      assert(lp === lm(id), s"doc $id: ccnet $lp != unigram_lm ${lm(id)}")
    }
  }

  test("per-lang terciles are balanced and ordered head >= middle >= tail") {
    val langs = rows.groupBy(_._2)
    assert(langs.size > 1, "single-lang fixture — spec vacuous")
    langs.foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet === Set("head", "middle", "tail"), s"$lang: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang terciles unbalanced: $sizes")
      val headMin = rs.filter(_._4 == "head").map(_._3).min
      val midMax = rs.filter(_._4 == "middle").map(_._3).max
      val midMin = rs.filter(_._4 == "middle").map(_._3).min
      val tailMax = rs.filter(_._4 == "tail").map(_._3).max
      assert(headMin >= midMax, s"$lang head/middle inverted")
      assert(midMin >= tailMax, s"$lang middle/tail inverted")
    }
  }
}
