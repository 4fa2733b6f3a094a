package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.LogicalRDD

/** Id-only stand-in for a [[LogicalRDD]] leaf inside a REGISTERED plan.
  * The registry must not store the LogicalRDD itself: in an iterative
  * loop, round t's pre-checkpoint plan holds round t-1's checkpointed
  * RDD as a leaf, so a registry of raw plans chains every generation's
  * RDD strongly reachable for the JVM's life and ContextCleaner's
  * GC-driven unpersist of localCheckpoint blocks never fires —
  * corpus-scaled checkpoint blocks accumulate across a bench run. The
  * stub carries only the RDD id (what the auditors' walk re-resolves
  * through [[Lineage.planFor]] anyway) and the output attributes, so
  * the stored plan keeps no reference that pins blocks. Never executed:
  * it exists solely for the plan guards' structural walks.
  */
case class CheckpointRef(rddId: Int, output: Seq[Attribute]) extends LeafNode

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
    * plan under the resulting RDD's id. Nested [[LogicalRDD]] leaves
    * (earlier rounds' checkpoints) are stored as id-only
    * [[CheckpointRef]] stubs so the registry never pins their RDD
    * blocks — the guards' walk re-resolves a stub through [[planFor]]
    * exactly as it resolved the raw leaf.
    */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    // ...WithSubqueries: a plain transformUp rewrites only the main
    // tree, so an earlier checkpoint referenced inside an IN/EXISTS/
    // scalar subquery would stay a raw LogicalRDD in the registry and
    // keep pinning its blocks — the leak this stubbing exists to close.
    val pre = df.queryExecution.analyzed.transformUpWithSubqueries {
      case l: LogicalRDD => CheckpointRef(l.rdd.id, l.output)
    }
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
