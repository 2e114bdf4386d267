package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanShim

/** Laws for the native sorted_intersect expression (r18 — the triangle
  * enumeration's two-pointer kernel): equality with array_intersect on
  * sorted distinct inputs, across empty/disjoint/subset/identical
  * shapes, on both the interpreted and codegen paths. */
class SortedIntersectSpec extends SparkSpec {

  private def si(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    PlanShim.column(graft.functions.SortedIntersect(
      PlanShim.expression(x), PlanShim.expression(y)))

  test("equals array_intersect on sorted distinct inputs, all shapes") {
    import spark.implicits._
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq.empty, Seq.empty),
      (Seq.empty, Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),          // disjoint
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // overlap
      (Seq(2L, 3L), Seq(1L, 2L, 3L, 4L)),          // subset
      (Seq(1L, 2L, 3L, 4L), Seq(2L, 3L)),          // superset
      (Seq(7L, 8L, 9L), Seq(7L, 8L, 9L)),          // identical
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val df = cases.toDF("x", "y")
      .select(si(col("x"), col("y")).as("got"),
        array_intersect(col("x"), col("y")).as("want"))
    // codegen path (whole-stage over the local relation)
    assert(df.collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
    // null propagation matches array_intersect
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("x", "y")
      .select(si(col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("randomized agreement with array_intersect (sorted distinct draws)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      def draw() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (draw(), draw())
    }
    val rows = cases.toDF("x", "y")
      .select(si(col("x"), col("y")).as("got"),
        array_intersect(col("x"), col("y")).as("want"))
      .collect()
    // array_intersect preserves first-arg order; on sorted inputs that
    // is ascending — exactly the kernel's output order.
    assert(rows.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
