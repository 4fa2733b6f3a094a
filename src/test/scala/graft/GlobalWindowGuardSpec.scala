package graft

import org.apache.spark.sql.catalyst.plans.logical
import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide regression gate for the round-10 lesson: a window with an
  * EMPTY partition spec moves every input row through one reducer —
  * the single-node sort that dies first at 100 TB (agg_decile_lift and
  * win_rfm_scoring shipped with exactly this flaw and were rebuilt on
  * DistributedRank; the round-11 sweep then caught four more, fixed as
  * scalar-aggregate broadcasts or TakeOrdered limits). Every
  * `SparkEntry.queries` plan is swept here; a partition-less logical
  * Window is only legal when its input is provably BOUNDED
  * (driver-sized, independent of corpus scale), which is recognized
  * two ways:
  *
  *  - structurally: DistributedRank's shard-offset cumulative windows
  *    over its `__gr_shard_*` aggregate (≤ shards+1 rows by
  *    construction — the helper's private naming convention doubles as
  *    the plan marker);
  *  - structurally: a window whose input [[BoundedWalk.isBounded]]
  *    certifies — the literal-limit top-k shape (text_zipf_check's
  *    top-20 plans TakeOrderedAndProject and the window ranks ≤ k
  *    rows), domain-bounded aggregate grids (one row per language
  *    stratum, pmod-literal estimator buckets), and the rest of the
  *    shared recognizer's idioms;
  *  - by allowlist below, each entry naming the bound that makes it
  *    legal.
  *
  * Adding a new global window means partitioning it, rebuilding on
  * DistributedRank, or defending a new allowlist entry in review.
  *
  * The sweep inspects optimizedPlan (analysis + optimizer only — no
  * execution), so the gate stays cheap; the streaming family is
  * excluded because constructing those results replays real streaming
  * machinery and their event-time windows never plan WindowExec.
  */
class GlobalWindowGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose partition-less windows all run over driver-sized
    * inputs — each entry names the bound. EMPTY as of round 15: the
    * last two holders were rebuilt on DistributedRank
    * (layout_global_index's inline prototype now calls the helper it
    * prototyped; win_kaplan_meier's risk-set cumulative rides
    * withGlobalCumsum — its duration-day table grows with the corpus's
    * collection span, so the rebuild is the scale-right plan, not just
    * a certification fix). The guard is now enforced everywhere and
    * claimed nowhere.
    */
  private val allowlist: Map[String, String] = Map.empty

  /** DistributedRank's offsets cumulative: partition-less by design,
    * but over the ≤ shards+1-row aggregate of its `__gr_shard_*`
    * column.
    */
  private def isShardOffsets(w: logical.Window): Boolean =
    w.child.output.exists(_.name.startsWith("__gr_shard_"))

  private def globalWindows(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.optimizedPlan.collect {
      case w: logical.Window
          if w.partitionSpec.isEmpty && !isShardOffsets(w) &&
            !BoundedWalk.isBounded(w.child) => w
    }
  }

  test("no query plans a partition-less window over unbounded input") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .filterNot(allowlist.contains)
      .flatMap { name =>
        val globals = globalWindows(name)
        if (globals.nonEmpty) Some(s"$name (${globals.size} global windows)")
        else None
      }
    assert(offenders.isEmpty,
      s"partition-less windows over possibly-unbounded input in:\n  " +
        offenders.mkString("\n  ") +
        "\npartition them, rebuild on DistributedRank, or defend an allowlist entry")
  }

  test("allowlisted queries still contain the bounded global window they defend") {
    // An allowlist entry for a query that no longer plans ANY global
    // window is stale — fail so the list shrinks with the code.
    val stale = allowlist.keys.toSeq.sorted
      .filter(name => globalWindows(name).isEmpty)
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }

  private def registryOffenders(
      entries: Map[String, (logical.LogicalPlan,
        org.apache.spark.sql.execution.SparkPlan)]): Seq[String] =
    entries.toSeq.sortBy(_._1).flatMap { case (tag, (opt, _)) =>
      val globals = opt.collect {
        case w: logical.Window
            if w.partitionSpec.isEmpty && !isShardOffsets(w) &&
              !BoundedWalk.isBounded(w.child) => w
      }
      if (globals.nonEmpty) Some(s"$tag (${globals.size} global windows)")
      else None
    }

  test("builder-side-effect writes pass the same global-window gate") {
    // Plans executed eagerly during query CONSTRUCTION (e.g.
    // pipeline_batch_envelope's JSONL batch write) never appear in the
    // returned tree — EagerWrites records them and this sweep applies
    // the identical check. The known eager writer is constructed here
    // explicitly (not left to the main test above) so the nonEmpty
    // assertion holds under testOnly/-z isolation; it keeps this
    // sweep from passing vacuously if the registration route is ever
    // bypassed.
    SparkEntry.queries("pipeline_batch_envelope")(spark, sf)
    val entries = graft.pipeline.EagerWrites.all
    assert(entries.contains("pipeline_batch_envelope_jsonl"),
      "the known eager write is not registered — EagerWrites.run was bypassed")
    val offenders = registryOffenders(entries)
    assert(offenders.isEmpty,
      s"partition-less windows in eager builder writes:\n  " +
        offenders.mkString("\n  "))
  }

  test("a planted violating eager write is caught by the registry sweep") {
    val tag = "test_planted_global_window"
    val bad = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    graft.pipeline.EagerWrites.record(tag, bad)
    try {
      val offenders = registryOffenders(graft.pipeline.EagerWrites.all)
      assert(offenders.exists(_.startsWith(tag)),
        "the planted partition-less window escaped the registry sweep")
    } finally graft.pipeline.EagerWrites.remove(tag)
  }
}
