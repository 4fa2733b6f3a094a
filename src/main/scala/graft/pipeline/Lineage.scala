package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** Pre-checkpoint plan registry: `localCheckpoint` replaces a frame's
  * logical plan with an opaque [[LogicalRDD]] leaf, which severs the
  * lineage plan AUDITORS need — BroadcastHintGuardSpec judges a
  * broadcast-hinted side by walking its plan for a structural row
  * bound, and a checkpointed `limit(1)` seed walks as "unknown RDD".
  * Routing checkpoints through [[Lineage.checkpoint]] records the
  * plan that PRODUCED the RDD, keyed by the RDD id, so the guard can
  * keep judging structurally (it re-runs its own bounded-walk on the
  * recorded plan — nothing here is a trusted claim) while execution
  * still gets the flat lineage the iterative loops need.
  *
  * Memory: one small analyzed plan per checkpoint call, for the JVM's
  * life. A full bench run makes a few hundred entries (the iterative
  * queries checkpoint a handful of frames each) — negligible next to
  * the session's own plan caches, and entries must outlive the query
  * that made them because guards inspect plans after construction.
  */
object Lineage {
  private val byRddId = new ConcurrentHashMap[Int, LogicalPlan]()

  /** `df.localCheckpoint(eager)` + record the pre-checkpoint analyzed
    * plan under the resulting RDD's id.
    */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val pre = df.queryExecution.analyzed
    val out = df.localCheckpoint(eager)
    out.queryExecution.logical match {
      case l: LogicalRDD => byRddId.put(l.rdd.id, pre); ()
      case _ => ()
    }
    out
  }

  /** The plan that produced checkpointed RDD `rddId`, if it was made
    * through [[checkpoint]].
    */
  def planFor(rddId: Int): Option[LogicalPlan] = Option(byRddId.get(rddId))

  /** Drop every recorded plan. Wired to application end by
    * [[StageCache.hookCleanup]]: RDD ids are PER-CONTEXT counters
    * starting at 0, so a context restart in the same JVM would alias a
    * stale (possibly bounded) plan onto a fresh RDD that happens to
    * reuse the id — and a plan auditor would judge the new frame by
    * the old context's plan.
    */
  def clear(): Unit = byRddId.clear()
}
