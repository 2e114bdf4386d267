package graft

import graft.queries.{HybridSearch, TextAnalysis, VectorSearch}

/** RRF fusion gate: the fused ranking is re-derived in plain Scala from
  * the two legs' own outputs (independent of the fusion SQL/plan), the
  * integer-exact score law is asserted per row, and membership/coverage
  * invariants pin what fusion may and may not invent. */
class HybridSearchSpec extends SparkSpec {

  private lazy val lex: Map[Long, Long] =
    TextAnalysis.searchBm25(spark, sf0001).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getLong(r.fieldIndex("rank")))
      .toMap
  private lazy val den: Map[Long, Long] =
    VectorSearch.annSearch(spark, sf0001, Seq(0L), k = 10).collect()
      .map(r => r.getLong(r.fieldIndex("neighbor_id")) -> r.getLong(r.fieldIndex("rank")))
      .toMap
  private lazy val fused =
    HybridSearch.hybridRrf(spark, sf0001).collect()

  private def rrf(rank: Option[Long]): Long =
    rank.map(r => 1000000000000L / (60L + r)).getOrElse(0L)

  test("fused output equals the plain-Scala RRF of the legs' own rankings") {
    val expected = (lex.keySet ++ den.keySet).toSeq
      .map(id => (id, rrf(lex.get(id)) + rrf(den.get(id))))
      .sortBy { case (id, s) => (-s, id) }
      .take(10)
    val got = fused.sortBy(r => r.getLong(r.fieldIndex("rank")))
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("rrf_score"))))
      .toSeq
    assert(got === expected)
  }

  test("per-row score law: rrf_score = sum of integer leg contributions") {
    fused.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val li = r.fieldIndex("lex_rank")
      val vi = r.fieldIndex("vec_rank")
      val lr = if (r.isNullAt(li)) None else Some(r.getLong(li))
      val vr = if (r.isNullAt(vi)) None else Some(r.getLong(vi))
      assert(lr === lex.get(id), s"doc $id lex_rank")
      assert(vr === den.get(id), s"doc $id vec_rank")
      assert(r.getLong(r.fieldIndex("rrf_score")) === rrf(lr) + rrf(vr), s"doc $id score")
      assert(lr.isDefined || vr.isDefined, s"doc $id in neither leg")
    }
  }

  test("a doc ranked in BOTH legs outranks the same ranks held singly") {
    // law on the scoring function itself: contrib is positive and
    // monotone, so dual membership strictly dominates either leg alone.
    (1L to 10L).foreach { r =>
      assert(rrf(Some(r)) > 0L)
      assert(rrf(Some(r)) + rrf(Some(10L)) > rrf(Some(r)), s"rank $r")
      if (r > 1L) assert(rrf(Some(r - 1L)) > rrf(Some(r)), s"monotone at $r")
    }
  }
}
