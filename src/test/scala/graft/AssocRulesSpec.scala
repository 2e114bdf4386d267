package graft

import graft.queries.AssocRules

/** Planted-basket gate for the A-Priori rule miner: known co-order
  * structure with exact support/confidence/lift expectations, plus the
  * two behaviors the DuckDB oracle alone can't attribute — the
  * A-Priori prune (an infrequent item never reaches a rule even when
  * it co-occurs with frequent ones) and in-order dedup (a part listed
  * twice on one order counts once). */
class AssocRulesSpec extends SparkSpec {

  private lazy val rows: Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("assoc").toString
    // Orders 1..10: {1,2}  → pair (1,2) co=10 … plus order 16 below = 11
    // Orders 11..12: {3,4} → pair (3,4) co=2 (exactly minsup)
    // Order 13: {5,6}      → co=1, under minsup → absent
    // Orders 14..15: {7}   → frequent singleton, no pair
    // Order 16: {1,2,8}    → 8 is globally ONCE → pruned; (1,2) still counts
    // Order 1 lists part 1 TWICE → in-order dedup keeps sup(1)=11
    val li: Seq[(Long, Long)] =
      (1L to 10L).flatMap(ok => Seq((ok, 1L), (ok, 2L))) ++
        Seq((1L, 1L)) ++
        (11L to 12L).flatMap(ok => Seq((ok, 3L), (ok, 4L))) ++
        Seq((13L, 5L), (13L, 6L), (14L, 7L), (15L, 7L),
          (16L, 1L), (16L, 2L), (16L, 8L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    (1L to 16L).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    AssocRules.assocRules(spark, tmp).collect()
  }

  private def row(pa: Long, pb: Long) =
    rows.find(r => r.getAs[Long]("part_a") == pa && r.getAs[Long]("part_b") == pb)

  test("planted pairs rank by co-order count with exact integer metrics") {
    val r12 = row(1L, 2L).getOrElse(fail("pair (1,2) missing"))
    assert(r12.getAs[Long]("co_orders") === 11L)
    assert(r12.getAs[Long]("sup_a") === 11L, "duplicate line in order 1 double-counted")
    assert(r12.getAs[Long]("rule_rank") === 1L)
    // N=16 orders: support = 1e6*11//16, conf = 1e6*11//11, lift = 1e6*11*16//(11*11)
    assert(r12.getAs[Long]("support_micro") === 687500L)
    assert(r12.getAs[Long]("conf_ab_micro") === 1000000L)
    assert(r12.getAs[Long]("conf_ba_micro") === 1000000L)
    assert(r12.getAs[Long]("lift_micro") === 1454545L)
    val r34 = row(3L, 4L).getOrElse(fail("pair (3,4) missing at exactly minsup"))
    assert(r34.getAs[Long]("co_orders") === 2L)
    // perfectly-associated rare pair: lift = 1e6*2*16 // (2*2) = 8e6 —
    // lift ranks it above the common pair even though support ranks below
    assert(r34.getAs[Long]("lift_micro") === 8000000L)
  }

  test("sub-minsup pairs and A-Priori-pruned items never surface") {
    assert(row(5L, 6L).isEmpty, "co=1 pair leaked past minsup")
    assert(rows.forall(r => r.getAs[Long]("part_a") != 8L &&
      r.getAs[Long]("part_b") != 8L),
      "infrequent item 8 survived the A-Priori prune into a pair")
    assert(rows.forall(r => r.getAs[Long]("part_a") != 7L &&
      r.getAs[Long]("part_b") != 7L),
      "pairless singleton 7 fabricated a pair")
    assert(rows.length === 2, s"expected exactly 2 rules, got ${rows.length}")
  }
}
