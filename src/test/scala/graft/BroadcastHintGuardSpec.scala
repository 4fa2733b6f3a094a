package graft

import org.apache.spark.sql.catalyst.expressions._
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
  * legal when it is provably BOUNDED independent of corpus scale,
  * recognized by the repo's documented bounded idioms:
  *
  *  - a literal global limit (the fixed-panel cap);
  *  - a grand (grouping-less) aggregate — exactly one row (the
  *    crossJoin(broadcast(stats)) scalar attach);
  *  - a grouped aggregate whose every key is DOMAIN-bounded: a fixed
  *    enum of the synthetic model ([[domainBoundedCols]]) or
  *    DistributedRank's `__gr_shard_*`/`__gr_grp_*` columns (the
  *    ≤ groups×shards offsets tables — the helper's own hints);
  *  - a filter pinning a UNIQUE id to a literal range
  *    (`vec_id < 10`, `doc_id < 20` — the fixed eval panels; ids are
  *    unique in embeddings/documents, so the row count is the
  *    literal);
  *  - a scan of a fixed dimension (region/nation), of a STAR
  *    dimension (customer/supplier/part — the documented
  *    broadcast-dim pattern: they scale orders of magnitude below the
  *    facts and several queries pin them to demonstrate the star
  *    join), or of a disk-staged panel artifact whose builder caps it
  *    (`lex_qterms`/`ivf_qprobes`);
  *  - local/range relations, and any chain / join / union / window /
  *    generate over only bounded inputs (persisted Staged frames are
  *    judged through their cached physical subtree);
  *  - or an allowlist entry below naming a bound the walk cannot see.
  *
  * Adding a new broadcast hint means bounding the side one of these
  * ways, dropping the hint (let AQE decide), or defending an
  * allowlist entry in review.
  */
class BroadcastHintGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to hint sides whose bound the structural walk
    * cannot certify — each entry names the bound.
    */
  private val allowlist: Map[String, String] = Map(
    "agg_countmin" -> "the 4×64 CountMin grid: keys are stack-literal row ids × pmod-64 buckets",
    "agg_bloom_membership" -> "the 256-slot bloom bit array: keys are pmod-256 bit positions",
    "agg_assoc_rules" -> "frequent-item tables keyed on the 25-brand p_brand catalog (mean-cut subset)",
    "agg_decile_lift" -> "the median-row attach: crk = (nn+1) div 2 equi-selects exactly 1 row",
    "agg_weighted_median" -> "the crossing-bucket rows: rk = 1 per l_returnflag group (≤|flags| rows)",
    "graph_bipartite_cf" -> "supplier-degree tables: supplier-DIMENSION-keyed aggregates of the edge artifact",
    "join_dsv2_runtime_prune" -> "demo pin: the runtime filter under test only exists when this side broadcasts; production bound is the filter's selectivity",
    "layout_global_index" -> "the inline ≤33-row shard-offset cumulative (the DistributedRank prototype, shard = id div width)",
    "pipeline_batch_envelope" -> "the reference's term-classification dictionary (api) — its own in-memory dict, dimension-bounded in the reference's model",
    "pipeline_nested_enrich" -> "the reference's known/api dictionaries (same bound as pipeline_batch_envelope)",
    "sample_kcenter_coreset" -> "the k=5 selected-center frame (localCheckpoint leaf hides the bound)",
    "sim_ann_pq" -> "the PQ codebook: Cents×MSub literal grid behind a Lloyd-checkpointed leaf",
    "sim_ann_ivfpq" -> "the PQ codebook (same Cents×MSub grid) + the vec_id<10 panel behind the checkpointed assignment",
    "sim_ann_ivfpq_recall" -> "the PQ codebook + 10-query exact arm (both behind checkpointed leaves)",
    "sim_query_expansion" -> "the expanded-query panel qe: ≤10 panel queries × their top-3 feedback rows",
    "win_seasonal_baseline" -> "the per-(event_type, hour-of-day) baseline grid: ≤ |types|×24 rows")

  /** Columns whose value DOMAIN is a fixed enum of the synthetic data
    * model (TESTDATA.md) or of the reference's label scheme — a
    * grouped aggregate keyed only on these is grid-bounded at any
    * corpus size.
    */
  private val domainBoundedCols = Set(
    "event_type", "lang", "source", "label",
    "l_returnflag", "l_linestatus", "c_mktsegment", "p_brand",
    "main_type")

  /** Unique row ids (one row per value in their table) — a filter
    * pinning one to a literal range is a fixed panel.
    */
  private val uniqueIdCols = Set("vec_id", "doc_id")

  /** Parquet leaves bounded (or dimension-scaled and deliberately
    * pinned) at any corpus size: fixed dims, star dims, and
    * disk-staged artifacts whose BUILDERS cap them (the limits ran
    * before the write — Similarity.lexQueryTerms and the ivf probe
    * panel).
    */
  private val boundedLeafNames = Seq(
    "region.parquet", "nation.parquet",
    "customer.parquet", "supplier.parquet", "part.parquet",
    "lex_qterms", "ivf_qprobes")

  private def groupKeysBounded(keys: Seq[Expression]): Boolean =
    keys.nonEmpty && keys.forall {
      case a: Attribute =>
        domainBoundedCols.contains(a.name) ||
          a.name.startsWith("__gr_shard_") || a.name.startsWith("__gr_grp_")
      case _ => false
    }

  /** A conjunct pinning a unique id column to a literal range. */
  private def idPanelPredicate(cond: Expression): Boolean = {
    def isIdAttr(e: Expression) = e match {
      case a: Attribute => uniqueIdCols.contains(a.name)
      case _ => false
    }
    cond.exists {
      case LessThan(a, _: Literal) => isIdAttr(a)
      case LessThanOrEqual(a, _: Literal) => isIdAttr(a)
      case EqualTo(a, _: Literal) => isIdAttr(a)
      case In(a, vs) => isIdAttr(a) && vs.forall(_.isInstanceOf[Literal])
      case _ => false
    }
  }

  private def boundedLeaf(p: LeafNode): Boolean = p match {
    case _: LocalRelation => true
    case _: Range => true
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.exists(pth =>
            boundedLeafNames.exists(pth.toString.contains))
        case _ => false
      }
    case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      // Persisted (Staged) frame: judge the CACHED physical subtree.
      boundedPhysical(m.cachedPlan)
    case _ => false
  }

  /** Physical twin of [[isBounded]] for cached subtrees. */
  private def boundedPhysical(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution
    p match {
      case _: execution.GlobalLimitExec => true
      case l: execution.LocalLimitExec => boundedPhysical(l.child)
      case _: execution.TakeOrderedAndProjectExec => true
      case _: execution.LocalTableScanExec => true
      case _: execution.RangeExec => true
      case a: execution.aggregate.BaseAggregateExec =>
        a.groupingExpressions.isEmpty ||
          groupKeysBounded(a.groupingExpressions) ||
          boundedPhysical(a.child)
      case f: execution.FilterExec =>
        idPanelPredicate(f.condition) || boundedPhysical(f.child)
      case w: execution.window.WindowExec => boundedPhysical(w.child)
      case j: execution.joins.BaseJoinExec =>
        boundedPhysical(j.left) && boundedPhysical(j.right)
      case u: execution.UnionExec => u.children.forall(boundedPhysical)
      case g: execution.GenerateExec => boundedPhysical(g.child)
      case sc: execution.FileSourceScanExec =>
        sc.relation.location.rootPaths.exists(pth =>
          boundedLeafNames.exists(pth.toString.contains))
      case _: execution.LeafExecNode => false
      case other if other.children.size == 1 =>
        boundedPhysical(other.children.head)
      case _ => false
    }
  }

  /** The subtree's row count is bounded independent of corpus scale. */
  private def isBounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit => true
    case l: LocalLimit => isBounded(l.child)
    case a: Aggregate =>
      a.groupingExpressions.isEmpty ||
        groupKeysBounded(a.groupingExpressions) ||
        isBounded(a.child)
    case f: Filter => idPanelPredicate(f.condition) || isBounded(f.child)
    case w: Window => isBounded(w.child)
    case j: Join => isBounded(j.left) && isBounded(j.right)
    case u: Union => u.children.forall(isBounded)
    case g: Generate => isBounded(g.child)
    case leaf: LeafNode => boundedLeaf(leaf)
    case other if other.children.size == 1 => isBounded(other.children.head)
    case _ => false
  }

  private def offendingHints(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.optimizedPlan.collect { case j: Join =>
      Seq((j.hint.leftHint, j.left, "left"),
          (j.hint.rightHint, j.right, "right"))
        .flatMap { case (h, side, label) =>
          if (h.exists(_.strategy.contains(BROADCAST)) && !isBounded(side))
            Some(s"broadcast-hinted $label side of ${j.joinType} join " +
              s"is not provably bounded (${side.nodeName})")
          else None
        }
    }.flatten
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
