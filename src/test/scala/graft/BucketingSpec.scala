package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Scale-design artifacts: bucketed co-located joins (no shuffle at join
  * time) and salted skew joins (row-equivalent to plain joins). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val ord = Tables.load(spark, sf0001, "orders")
    val li = Tables.load(spark, sf0001, "lineitem")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
    val n = joined.count()
    assert(n === li.count()) // every lineitem matches exactly one order

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("salted join is row-equivalent to the plain join under skew") {
    import spark.implicits._
    // heavy skew: 10k rows on one key, a handful elsewhere
    val big = (Seq.fill(10000)(1L) ++ Seq(2L, 3L, 3L)).toDF("k")
      .withColumn("payload", monotonically_increasing_id())
    val small = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched")).toDF("k", "label")

    val plain = big.join(small, "k").select(col("k"), col("payload"), col("label"))
    val salted = Salting.saltedJoin(big, small, "k", n = 8)
      .select(col("k"), col("payload"), col("label"))
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
