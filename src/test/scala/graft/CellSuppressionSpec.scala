package graft

import org.apache.spark.sql.functions._

import graft.queries.EventOps

/** The property that makes small-cell suppression a RELEASE operator
  * rather than a filter: suppressed mass is collapsed, never dropped —
  * published totals must reconcile exactly with the unsuppressed
  * source. The DuckDB oracle pins the row-level output; this spec pins
  * the invariant that output is an exact partition of the input. */
class CellSuppressionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("released + residual rows exactly conserve event count and value mass") {
    val out = EventOps.cellSuppression(spark, dir)
    val ev = Tables.load(spark, dir, "events")

    val outTotals = out.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_value").cast("decimal(28,12)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val inTotals = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,12)")).cast("double").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(outTotals.keySet === inTotals.keySet)
    outTotals.foreach { case (t, (n, sv)) =>
      assert(n === inTotals(t)._1, s"$t: released+residual count $n != input")
      // sum_value is rounded to 6 per published row, so the reassembled
      // total may differ by at most 0.5e-6 per row
      val rows = 1 + 100 // residual + max cohort cells per type
      assert(math.abs(sv - inTotals(t)._2) <= rows * 5e-7,
        s"$t: value mass drifted: $sv vs ${inTotals(t)._2}")
    }
  }

  test("both branches are non-vacuous and residuals carry the suppressed cells") {
    val out = EventOps.cellSuppression(spark, dir).collect()
    val residual = out.filter(_.getAs[Long]("cohort") == -1L)
    val released = out.filter(_.getAs[Long]("cohort") >= 0L)
    assert(residual.nonEmpty, "no suppressed cells at sf0.001 — threshold vacuous")
    assert(released.nonEmpty, "everything suppressed — threshold degenerate")
    // a residual row must aggregate at least one real cell's worth of mass
    residual.foreach { r => assert(r.getAs[Long]("n") >= 1L) }
  }
}
