package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BoundReference, Expression, GenericInternalRow,
  JoinedRow, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: co-partitioned, sorted, single forward-merge
  * pass per partition.
  *
  * Catalyst satisfies [[requiredChildDistribution]] with a hash exchange
  * per side and [[requiredChildOrdering]] with per-partition sorts —
  * exactly a sort-merge join's shape, so AQE's coalescing/skew handling
  * applies unchanged. The merge keeps O(1) state (one pending right row
  * + one candidate), never buffers a group, and never rescans: right
  * rows are consumed once per partition. Output preserves the left
  * side's partitioning and (key, time) order, so a downstream
  * aggregation on the same key plans without another exchange.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortSpec(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending, NullsFirst, Seq.empty)) :+
      SortOrder(time, Ascending, NullsFirst, Seq.empty)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortSpec(leftKeys, leftTime), sortSpec(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortSpec(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val (lKeys, rKeys, lTime, rTime) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // All projections/orderings are generated per partition, on the
      // executor — the closure captures only serializable expressions.
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = GenerateOrdering.generate(
        lKeys.zipWithIndex.map { case (e, i) =>
          SortOrder(BoundReference(i, e.dataType, nullable = true),
            Ascending, NullsFirst, Seq.empty)
        })
      val timeOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, lTime.dataType, nullable = true),
          Ascending, NullsFirst, Seq.empty)))

      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // Pending = next unconsumed right row; candidate = latest right
        // row whose key matched and time was <= some already-seen left
        // time (times only grow within a key, so it stays valid).
        private var pending: InternalRow = if (ri.hasNext) ri.next().copy() else null
        private var cand: InternalRow = null
        private var candKey: UnsafeRow = null

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          // Advance the right side past everything at-or-before (lk, lt).
          var advancing = true
          while (advancing && pending != null) {
            val rk = rKeyProj(pending)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTimeProj(pending), lt) <= 0)) {
              // NULL keys and NULL times never produce a candidate (SQL
              // null-comparison semantics, matching DuckDB ASOF): the
              // row is consumed but cannot be matched.
              if (kc == 0 && !rk.anyNull && !rTimeProj(pending).anyNull) {
                cand = pending; candKey = rk.copy()
              }
              pending = if (ri.hasNext) ri.next().copy() else null
            } else advancing = false
          }
          val matched = cand != null && !lk.anyNull && !lt.anyNull &&
            keyOrd.compare(candKey, lk) == 0
          outProj(joiner(l, if (matched) cand else nullRight))
        }
      }
    }
  }
}
