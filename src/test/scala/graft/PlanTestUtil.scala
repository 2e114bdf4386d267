package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plan-inspection helpers for specs. */
object PlanTestUtil {

  /** collect() that crosses AQE query-stage boundaries: stage sub-plans
    * are fields, not children, so a plain collect stops at them (known
    * Spark-4 quirk). */
  def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val nested = p.collect {
      case q: QueryStageExec => deepCollect(q.plan)(pf)
      case a: AdaptiveSparkPlanExec => deepCollect(a.executedPlan)(pf)
    }.flatten
    p.collect(pf) ++ nested
  }
}
