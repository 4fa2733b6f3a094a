package graft

import org.apache.spark.sql.execution.SparkPlan

/** Flatten an EXECUTED plan through the boundaries that hide subtrees
  * from TreeNode.collect: AdaptiveSparkPlanExec (final plan),
  * materialized QueryStageExec nodes (leaves wrapping their stage), and
  * ReusedExchangeExec.
  */
object PlanFlatten {
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case _ => p.children
    }
    p +: nested.flatMap(flatten)
  }
}
