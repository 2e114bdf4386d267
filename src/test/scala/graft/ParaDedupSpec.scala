package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmDedup

/** Paragraph-level dedup: brute-force re-derivation of the full audit
  * on the live fixture, plus non-vacuity (the fixture vocabulary must
  * actually produce cross-document paragraph collisions). */
class ParaDedupSpec extends SparkSpec {

  test("audit equals a brute-force first-occurrence re-derivation") {
    val P = LlmDedup.ParaTokens
    // independent reference: plain Scala over the collected fixture
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      val paras = toks.grouped(P).map(_.mkString(" ")).toSeq
      var kept = 0; var keptChars = 0L
      paras.foreach { p =>
        if (!seen(p)) { seen += p; kept += 1; keptChars += p.length }
      }
      id -> ((paras.size.toLong, kept.toLong, keptChars))
    }.toMap

    val got = LlmDedup.paragraphDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) =>
      assert(v === expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    // non-vacuity: some paragraphs were actually dropped as duplicates
    val dropped = expected.values.map { case (n, k, _) => n - k }.sum
    assert(dropped > 0, "fixture produced no cross-document paragraph dups")
    // and not everything was dropped
    assert(expected.values.map(_._2).sum > 0)
  }
}
