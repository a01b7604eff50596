package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** The ONE AQE-aware executed-plan walk for plan pins: QueryStageExec
  * holds its plan as an innerChild (plain `collect` does not descend)
  * and AdaptiveSparkPlanExec swaps its executedPlan as stages finish —
  * every suite that pins node presence/absence must recurse both, and a
  * copy per suite is how a future AQE node shape silently breaks half
  * the pins.
  */
object TestPlans {

  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  /** Every node of `df`'s EXECUTED plan (collect first so AQE finalizes). */
  def executedNodes(df: DataFrame): Seq[SparkPlan] =
    walk(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan)
}
