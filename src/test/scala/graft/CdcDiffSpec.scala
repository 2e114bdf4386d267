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

  test("IVM: the maintained aggregate equals a from-scratch recompute of the target") {
    val maintained = graft.queries.Ingestion.ivmAgg(spark, sf0001).collect()
      .map(r => r.getAs[Long]("key_class") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    // Independent recompute of the current snapshot on the driver.
    val o = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val cur = o.filter(_._1 % 10 != 7)
      .map { case (k, p) => (k % 10, if (k % 10 == 5) p + 1 else p) }
    val expect = cur.groupBy(_._1).map { case (c, xs) =>
      c -> ((xs.length.toLong, xs.map(_._2).sum.toDouble))
    }
    assert(maintained.keySet == expect.keySet)
    maintained.foreach { case (c, (n, total)) =>
      val (en, etotal) = expect(c)
      assert(n == en && math.abs(total - etotal) < 1e-6)
    }
    assert(!maintained.contains(7L), "fully-removed class must leave the view")
  }
}
