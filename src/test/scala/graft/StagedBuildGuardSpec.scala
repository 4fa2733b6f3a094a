package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical
import org.scalatest.funsuite.AnyFunSuite

/** The staged-build half of the builder-side-effect close (round 16):
  * `Staged.disk` / the pipeline stages EXECUTE their build plans
  * during query construction on a cache miss — the same
  * never-in-the-returned-tree class as EagerWrites — and until this
  * spec their plans were only consulted for BOUNDEDNESS (when an
  * artifact backs a hinted or nested-loop side), never swept for
  * their own scale health. This sweeps every recorded build plan
  * (latest generation per tag, `Staged.recordedBuildPlans`) with the
  * three guards' logical checks:
  *
  *  - no partition-less window over unbounded input (DistributedRank's
  *    `__gr_shard_*` offsets cumulative exempt, as everywhere);
  *  - no broadcast HINT pinning an unbounded side;
  *  - no join without an equality conjunct where neither side is
  *    bounded — the LOGICAL approximation of BnljGuardSpec's physical
  *    check (build plans are registered as OPTIMIZED trees with
  *    checkpoint leaves stubbed to CheckpointRef — Stages.spillThrough
  *    — because the walk's recognizers are tuned to optimized shapes;
  *    re-planning them physically would re-run Catalyst per artifact
  *    for no new information: a non-equi unbounded×unbounded join IS
  *    the plan that becomes a corpus-scaled nested loop).
  *
  * diskKeyed (iterative) artifacts record no build plan and are out of
  * scope here — their loop structure is bounded by construction and
  * their lineage is checkpoint-truncated (SURVEY §4.4).
  */
class StagedBuildGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def isShardOffsets(w: logical.Window): Boolean =
    w.child.output.exists(_.name.startsWith("__gr_shard_"))

  private def offendersIn(tag: String, plan: logical.LogicalPlan): Seq[String] = {
    val windows = plan.collect {
      case w: logical.Window
          if w.partitionSpec.isEmpty && !isShardOffsets(w) &&
            !BoundedWalk.isBounded(w.child) =>
        s"$tag: partition-less window over unbounded input"
    }
    val hints = plan.collect { case j: logical.Join =>
      Seq((j.hint.leftHint, j.left), (j.hint.rightHint, j.right)).flatMap {
        case (h, side) =>
          if (h.exists(_.strategy.contains(logical.BROADCAST)) &&
              !BoundedWalk.isBounded(side))
            Some(s"$tag: broadcast-hinted unbounded side of ${j.joinType} join")
          else None
      }
    }.flatten
    val loops = plan.collect {
      case j: logical.Join
          if !j.condition.exists(c => BoundedWalk.conjuncts(c).exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          }) && !BoundedWalk.isBounded(j.left) &&
            !BoundedWalk.isBounded(j.right) =>
        s"$tag: ${j.joinType} join with no equality conjunct and two unbounded sides"
    }
    windows ++ hints ++ loops
  }

  test("every recorded staged build plan passes the three guard checks") {
    // Constructing the full query surface populates the registry
    // (plans are recorded hit or miss); the count assertion keeps the
    // sweep from passing vacuously if registration is ever bypassed.
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .foreach(name => SparkEntry.queries(name)(spark, sf))
    val recorded = graft.pipeline.Staged.recordedBuildPlans
    assert(recorded.size >= 30,
      s"only ${recorded.size} staged build plans recorded — the " +
        "construction sweep no longer reaches the staged family")
    val offenders = recorded.toSeq.sortBy(_._1).flatMap {
      case (tag, plan) => offendersIn(tag, plan)
    }
    assert(offenders.isEmpty,
      "staged build plans with scale defects:\n  " +
        offenders.mkString("\n  "))
  }

  test("a planted violating staged build is caught by the same checks") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val badWindow = docs.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    assert(offendersIn("planted", badWindow.queryExecution.analyzed).nonEmpty,
      "the planted global window escaped the staged-build checks")
    val badCross = docs.select("doc_id")
      .crossJoin(spark.read.parquet(s"$sf/events.parquet").select("event_id"))
    assert(offendersIn("planted", badCross.queryExecution.analyzed).nonEmpty,
      "the planted non-equi corpus join escaped the staged-build checks")
  }
}
