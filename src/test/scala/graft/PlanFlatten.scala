package graft

import org.apache.spark.sql.execution.SparkPlan

/** Flatten an EXECUTED plan through the boundaries that hide subtrees
  * from TreeNode.collect: AdaptiveSparkPlanExec (final plan),
  * materialized QueryStageExec nodes (leaves wrapping their stage), and
  * ReusedExchangeExec.
  */
object PlanFlatten {
  def flatten(p: SparkPlan): Seq[SparkPlan] = flatten(p, throughCache = false)

  /** Additionally descends into InMemoryRelation.cachedPlan behind
    * table-cache scans: a staged (persisted) subplan hides its joins
    * from the executed plan's collect, so a plan pin on a Staged(...)
    * query must look through the cache boundary. Kept separate from
    * [[flatten]] — negative assertions ("no cartesian anywhere") are
    * scoped to the query's OWN plan, not whatever the shared stage
    * cache happens to hold.
    */
  def flattenThroughCache(p: SparkPlan): Seq[SparkPlan] =
    flatten(p, throughCache = true)

  private def flatten(p: SparkPlan, throughCache: Boolean): Seq[SparkPlan] = {
    val nested = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
          if throughCache =>
        Seq(im.relation.cachedPlan)
      case _ => p.children
    }
    p +: nested.flatMap(flatten(_, throughCache))
  }
}
