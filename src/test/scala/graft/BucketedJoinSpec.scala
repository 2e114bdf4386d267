package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The bucketed co-located join must actually be exchange-free — that is
  * the entire point of paying the bucketed write. Broadcast is disabled
  * (on a conf-isolated clone) so the planner cannot sidestep the claim
  * by broadcasting the small side. */
class BucketedJoinSpec extends SparkSpec {

  import PlanTestUtil.deepCollect

  test("bucketed fact join plans with no shuffle exchange in the join subtree") {
    Sessions.confIsolated(spark) { s =>
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = queries.Bucketed.bucketedJoin(s, sf0001)
      val plan = df.queryExecution.executedPlan
      val joins = deepCollect(plan) { case j: SortMergeJoinExec => j }
      assert(joins.nonEmpty, s"expected a sort-merge join:\n$plan")
      val shuffled = joins.flatMap(j =>
        deepCollect(j) { case e: ShuffleExchangeExec => e })
      assert(shuffled.isEmpty,
        s"bucketed join still shuffles its inputs:\n$plan")
    }
  }

  test("bucketing changes the layout, never the result") {
    import org.apache.spark.sql.functions._
    val got = queries.Bucketed.bucketedJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val dec = "decimal(18,2)"
    val exp = Tables.load(spark, sf0001, "lineitem")
      .join(Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(dec)
          * (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === exp)
  }
}
