package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide regression gate for the round-12 lesson BnljGuardSpec
  * CANNOT catch: a `broadcast()` HINT pins its side to the build role
  * at ANY scale, so a hinted side that grows with the corpus is a
  * deferred executor/driver OOM even though the join itself is a
  * perfectly equi-keyed BroadcastHashJoin (sim_rrf_fusion's dense arm
  * shipped exactly this — a 1-in-100 corpus sample with embedding
  * vectors, pinned to broadcast). Un-hinted joins are exempt by
  * design: there AQE sizes the sides at runtime and demotes the
  * broadcast when it stops fitting — the hint is what removes that
  * safety net, so the hint is what this gate audits.
  *
  * Every non-streaming `SparkEntry.queries` OPTIMIZED logical plan is
  * swept (hints live on `Join.hint` after EliminateResolvedHint; no
  * physical planning or execution needed). A broadcast-hinted side is
  * legal when it is provably BOUNDED independent of corpus scale —
  * the structural idioms [[BoundedWalk]] recognizes (see its scaladoc
  * for the full list) — or defended by an allowlist entry below
  * naming a bound the walk cannot see.
  *
  * Adding a new broadcast hint means bounding the side one of those
  * ways, dropping the hint (let AQE decide), or defending an
  * allowlist entry in review.
  */
class BroadcastHintGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to hint sides whose bound the structural walk
    * cannot certify — each entry names the bound.
    */
  /** EMPTY as of round 15 — every hinted side in the inventory is
    * structurally certified by the walk. The last two entries defended
    * the classify chain's known/api dictionary hints; those hints were
    * DROPPED instead (the maps are vocabulary-sized, and repo policy is
    * that vocabulary-sized frames carry no hint — AQE broadcasts them
    * while they fit and shuffles the lookup joins at scale, which is
    * exactly where the reference's in-memory dicts would OOM). The
    * other round-15 retirements were structural: agg_decile_lift's
    * median attach carries a literal limit(1), layout_global_index
    * rides DistributedRank, and graph_bipartite_cf's degree tables
    * certify through the FK vocabulary traced across the
    * staged-artifact hop. The guard is enforced everywhere and claimed
    * nowhere.
    */
  private val allowlist: Map[String, String] = Map.empty

  private def hintsIn(plan: LogicalPlan): Seq[String] =
    plan.collect { case j: Join =>
      Seq((j.hint.leftHint, j.left, "left"),
          (j.hint.rightHint, j.right, "right"))
        .flatMap { case (h, side, label) =>
          if (h.exists(_.strategy.contains(BROADCAST)) &&
              !BoundedWalk.isBounded(side))
            Some(s"broadcast-hinted $label side of ${j.joinType} join " +
              s"is not provably bounded (${side.nodeName})")
          else None
        }
    }.flatten

  private def offendingHints(name: String): Seq[String] =
    hintsIn(SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan)

  test("builder-side-effect writes pass the same broadcast-hint gate") {
    // EagerWrites records the optimized logical plan of every eager
    // builder write (see GlobalWindowGuardSpec for the registration
    // contract); this applies the identical hinted-side check there.
    // Construct the known eager writer FIRST: the registry is JVM-wide
    // and this suite's own all-queries test runs AFTER this one, so
    // without the explicit construction the nonEmpty assertion only
    // held when another guard suite had already populated the registry
    // in the same JVM — testOnly/-z isolation failed spuriously.
    SparkEntry.queries("pipeline_batch_envelope")(spark, sf)
    val entries = graft.pipeline.EagerWrites.all
    assert(entries.contains("pipeline_batch_envelope_jsonl"),
      "the known eager write is not registered — EagerWrites.run was bypassed")
    val offenders = entries.toSeq.sortBy(_._1).flatMap {
      case (tag, (opt, _)) =>
        val bad = hintsIn(opt)
        if (bad.nonEmpty) Some(s"$tag: ${bad.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"corpus-scaled broadcast hints in eager builder writes:\n  " +
        offenders.mkString("\n  "))
  }

  test("a planted violating eager write is caught by the registry sweep") {
    val tag = "test_planted_broadcast_hint"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = docs.select("doc_id", "lang").join(
      org.apache.spark.sql.functions.broadcast(
        docs.select("doc_id", "n_chars")), "doc_id")
    graft.pipeline.EagerWrites.record(tag, planted)
    try {
      val caught = graft.pipeline.EagerWrites.all.get(tag)
        .map { case (opt, _) => hintsIn(opt) }.getOrElse(Nil)
      assert(caught.nonEmpty,
        "the planted corpus-sized broadcast hint escaped the registry sweep")
    } finally graft.pipeline.EagerWrites.remove(tag)
  }

  test("no query pins an unbounded side to broadcast by hint") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
      .filterNot(allowlist.contains)
      .flatMap { name =>
        val bad = offendingHints(name)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString("; ")}") else None
      }
    assert(offenders.isEmpty,
      s"corpus-scaled broadcast hints in:\n  " + offenders.mkString("\n  ") +
        "\nbound the side, drop the hint (AQE sizes it at runtime), " +
        "or defend an allowlist entry")
  }

  test("allowlisted queries still plan the hinted broadcast they defend") {
    // An entry whose query no longer hints any unprovable side is
    // STALE — it would silently exempt a future regression.
    val stale = allowlist.keys.toSeq.sorted
      .filter(name => offendingHints(name).isEmpty)
    assert(stale.isEmpty, s"stale allowlist entries: ${stale.mkString(", ")}")
  }
}
