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
  *  - structurally, walking the build side (either side for a
  *    cartesian) through row-preserving/shrinking nodes: a literal
  *    limit (GlobalLimit/TakeOrderedAndProject), a grand aggregate
  *    (grouping-less HashAggregate — exactly 1 row; the
  *    crossJoin(broadcast(stats)) scalar-attach idiom), or a
  *    driver-literal LocalTableScan;
  *  - by allowlist below, each entry naming the bound that makes its
  *    nested loop legal (FIXED probe/query sets the corpus tables
  *    don't scale: `vec_id < 10` panels, dimension-bounded grids —
  *    never 1-in-N samples, which grow with the corpus).
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
    * each entry names the bound.
    */
  private val allowlist: Map[String, String] = Map(
    "agg_chi2_independence" -> "marginal grids of the 5×25 seg×nation cross (dimension-bounded cells)",
    "agg_cohens_d" -> "per-segment stats panel (≤5 mktsegment rows) crossed onto the grid",
    "agg_decile_lift" -> "median-row attach: equi-select of exactly 1 row from the DistributedRank'd frame",
    "agg_kmv_sketch" -> "per-type k-minimum synopsis (k·n_types rows collapsed to arrays)",
    "dedup_decontaminate" -> "fixed 20-doc eval set (doc_id < 20) broadcast against the corpus",
    "sample_kcenter_coreset" -> "k=5 selected-center frame per greedy round (localCheckpoint leaf)",
    "sim_ann_binary" -> "10-query signature panel (QueryVecs) broadcast for the Hamming pass",
    "sim_ann_ivf_recall" -> "10-query probe panel (QueryVecs): the exact arm of the recall audit",
    "sim_ann_ivfpq" -> "Cents×MSub PQ codebook cross building the per-query ADC lookup table",
    "sim_ann_ivfpq_recall" -> "10-query exact arm + PQ codebook cross (recall audit)",
    "sim_ann_pq" -> "Cents×MSub PQ codebook cross building the per-query ADC lookup table",
    "sim_centroid_separation" -> "per-label centroid table (≤10 labels, dims collapsed to arrays)",
    "sim_cosine_topk" -> "10-query probe panel (QueryVecs) — the brute-force correctness baseline",
    "sim_int8_quantized" -> "10-query probe panel (QueryVecs)",
    "sim_matryoshka" -> "10-query probe panel (QueryVecs)",
    "sim_mips_topk" -> "10-query probe panel (QueryVecs)",
    "sim_query_expansion" -> "10-query probe panel (QueryVecs) joined with its own top-3 feedback vectors",
    "sim_recall_curve" -> "10-query exact arm of the recall audit",
    "sim_recall_graph_route" -> "10-query exact arm of the recall audit",
    "text_bpe_train3" -> "per-round argmax merge pair (1 localCheckpoint'd row per round)",
    "text_langid_confusion" -> "predicted-language domain (≤5 values) crossed to complete the confusion grid")

  /** The subtree's row count is bounded independent of corpus scale. */
  private def isBounded(p: SparkPlan): Boolean = p match {
    case _: execution.GlobalLimitExec => true
    // LocalLimit is NOT a bound: it caps rows per PARTITION, so the
    // subtree still scales with partition count. Only a global limit
    // (GlobalLimit / TakeOrderedAndProject) proves boundedness.
    case l: execution.LocalLimitExec => isBounded(l.child)
    case _: execution.TakeOrderedAndProjectExec => true
    case _: execution.LocalTableScanExec => true
    // spark.range(a, b): literal bounds by construction — the fixed
    // estimator/bucket/shard panels (AMS i∈[0,16), drift buckets,
    // zone-map shards).
    case _: execution.RangeExec => true
    case a: execution.aggregate.BaseAggregateExec =>
      // A grand aggregate is exactly one row; a grouped aggregate over
      // a bounded input is bounded by that input's bound.
      a.groupingExpressions.isEmpty || isBounded(a.child)
    case w: execution.window.WindowExec => isBounded(w.child)
    case j: execution.joins.BaseJoinExec =>
      isBounded(j.left) && isBounded(j.right)
    case u: execution.UnionExec => u.children.forall(isBounded)
    case g: execution.GenerateExec =>
      // explode() multiplies rows by a per-row factor; bounded only if
      // the input is (constant fan-out over a bounded frame).
      isBounded(g.child)
    case _: execution.LeafExecNode => false
    case other if other.children.size == 1 => isBounded(other.children.head)
    case _ => false
  }

  private def offendingLoops(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.sparkPlan.collect {
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
  }

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
