package graft

import org.apache.spark.sql.execution
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide regression gate for the round-11 lesson (the
  * GlobalWindowGuardSpec of join shapes): a broadcast nested-loop join
  * whose broadcast side scales with the corpus is a disguised
  * cartesian — O(N·M) comparisons that no executor count survives at
  * 100 TB (sim_rrf_fusion's dense arm shipped exactly this: a "query
  * sample" that was 1% OF THE CORPUS broadcast against all of it, and
  * was rebuilt on the staged IVF candidate index). Every
  * `SparkEntry.queries` physical plan is swept; a
  * BroadcastNestedLoopJoin or CartesianProduct is only legal when the
  * looped-against side is provably BOUNDED (independent of corpus
  * scale), recognized two ways:
  *
  *  - structurally, by [[BoundedWalk.boundedPhysical]] (see its
  *    scaladoc): literal limits, grand aggregates, domain-bounded
  *    group keys, unique-id literal panels, row_number caps over
  *    domain-bounded partitions, fixed-dimension scans, staged
  *    artifacts judged through their recorded build plans, and
  *    checkpointed frames judged through their recorded
  *    pre-checkpoint plans;
  *  - by allowlist below, each entry naming the bound that makes its
  *    nested loop legal (FIXED probe/query sets the corpus tables
  *    don't scale — never 1-in-N samples, which grow with the
  *    corpus).
  *
  * Adding a new nested loop means bounding it structurally, generating
  * candidates from an index (LSH bucket, IVF list, band join) instead,
  * or defending a new allowlist entry in review.
  *
  * The sweep inspects sparkPlan (planner output, pre-AQE, no
  * execution) so the gate stays cheap; streaming queries are excluded
  * because constructing their results replays real streaming
  * machinery.
  */
class BnljGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop sides are bounded by construction —
    * each entry names the bound. EMPTY as of round 15: the last holder
    * (agg_decile_lift's median-row attach) now states its
    * exactly-one-row bound as a literal limit(1) in the plan, so the
    * walk certifies it structurally. The guard is enforced everywhere
    * and claimed nowhere.
    */
  private val allowlist: Map[String, String] = Map.empty

  /** The subtree's row count is bounded independent of corpus scale —
    * the shared recognizer (one walk for both plan guards).
    */
  private def isBounded(p: SparkPlan): Boolean = BoundedWalk.boundedPhysical(p)

  private def offendingLoops(name: String): Seq[String] =
    loopsIn(SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan)

  test("no query plans a nested-loop join against an unbounded side") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .filterNot(allowlist.contains)
      .flatMap { name =>
        val loops = offendingLoops(name)
        if (loops.nonEmpty) Some(s"$name: ${loops.mkString("; ")}")
        else None
      }
    assert(offenders.isEmpty,
      s"corpus-scaled nested loops in:\n  " + offenders.mkString("\n  ") +
        "\nbound the side, generate candidates from an index, or defend an allowlist entry")
  }

  private def loopsIn(p: SparkPlan): Seq[String] =
    p.collect {
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case _ => b.right
        }
        if (isBounded(build)) None
        else Some(s"BroadcastNestedLoopJoin(${b.joinType}) with unbounded build side")
      case c: CartesianProductExec =>
        if (isBounded(c.left) || isBounded(c.right)) None
        else Some("CartesianProduct with two unbounded sides")
    }.flatten

  test("builder-side-effect writes pass the same nested-loop gate") {
    // EagerWrites records the physical plan of every eager builder
    // write (see GlobalWindowGuardSpec for the registration contract);
    // this applies the identical BNLJ/cartesian check to those plans.
    // Constructed explicitly so the registry assertion holds under
    // testOnly/-z isolation too, not just after this suite's own
    // all-queries test.
    SparkEntry.queries("pipeline_batch_envelope")(spark, sf)
    val entries = graft.pipeline.EagerWrites.all
    assert(entries.contains("pipeline_batch_envelope_jsonl"),
      "the known eager write is not registered — EagerWrites.run was bypassed")
    val offenders = entries.toSeq.sortBy(_._1).flatMap {
      case (tag, (_, phys)) =>
        val loops = loopsIn(phys)
        if (loops.nonEmpty) Some(s"$tag: ${loops.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"corpus-scaled nested loops in eager builder writes:\n  " +
        offenders.mkString("\n  "))
  }

  test("a planted violating eager write is caught by the registry sweep") {
    val tag = "test_planted_cartesian"
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val ev = spark.read.parquet(s"$sf/events.parquet").select("event_id")
    graft.pipeline.EagerWrites.record(tag, docs.crossJoin(ev))
    try {
      val caught = graft.pipeline.EagerWrites.all.get(tag)
        .map { case (_, phys) => loopsIn(phys) }.getOrElse(Nil)
      assert(caught.nonEmpty,
        "the planted corpus cross join escaped the registry sweep")
    } finally graft.pipeline.EagerWrites.remove(tag)
  }

  test("allowlisted queries still plan the nested loop they defend") {
    // An allowlist entry for a query that no longer plans ANY nested
    // loop at all is stale — fail so the list shrinks with the code.
    // (Checked against the loop's EXISTENCE, not its boundedness: the
    // planner's build-side choice follows cache statistics, so which
    // side of a small cross lands on the build side can flip with
    // suite execution order — the loop itself is the stable marker.)
    val stale = allowlist.keys.toSeq.sorted.filter { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.queryExecution.sparkPlan.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }.isEmpty
    }
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }
}
