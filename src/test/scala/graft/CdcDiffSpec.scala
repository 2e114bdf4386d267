package graft

import org.apache.spark.sql.functions._

/** Snapshot-diff (ing_cdc_diff) semantics: the classification must
  * partition the key space exactly — every emitted key is genuinely
  * added/removed/changed between the two synthetic snapshots, and no
  * unchanged key leaks through. */
class CdcDiffSpec extends SparkSpec {

  test("cdc diff classifies exactly the mod-10 delta classes") {
    val out = graft.queries.Ingestion.cdcDiff(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byStatus = out.groupBy(_.getAs[String]("status"))
    // Key-space law from the synthetic deltas: added = keys ≡ 3 (absent
    // from prev, present in cur); removed = keys ≡ 7; changed = keys ≡ 5.
    byStatus("added").foreach(r => assert(r.getAs[Long]("o_orderkey") % 10 == 3))
    byStatus("removed").foreach(r => assert(r.getAs[Long]("o_orderkey") % 10 == 7))
    byStatus("changed").foreach(r => assert(r.getAs[Long]("o_orderkey") % 10 == 5))
    // Completeness: every key in those classes appears exactly once.
    val keys = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(byStatus("added").length == keys.count(_ % 10 == 3))
    assert(byStatus("removed").length == keys.count(_ % 10 == 7))
    assert(byStatus("changed").length == keys.count(_ % 10 == 5))
    assert(out.length ==
      byStatus("added").length + byStatus("removed").length + byStatus("changed").length)
    // Price columns carry the direction of the change.
    byStatus("added").foreach(r => assert(r.isNullAt(r.fieldIndex("prev_price"))))
    byStatus("removed").foreach(r => assert(r.isNullAt(r.fieldIndex("cur_price"))))
    byStatus("changed").foreach { r =>
      assert(math.abs(r.getAs[Double]("cur_price") - r.getAs[Double]("prev_price") - 1.0) < 1e-9)
    }
  }
}
