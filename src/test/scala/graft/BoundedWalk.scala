package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution

/** The repo's ONE structural bounded-row-count recognizer, shared by
  * the plan guards (BroadcastHintGuardSpec judges broadcast-hinted
  * sides, BnljGuardSpec judges nested-loop sides). A subtree is
  * "bounded" when its row count provably does NOT scale with the
  * corpus, certified by the documented idioms:
  *
  *  - a literal global limit (GlobalLimit / TakeOrderedAndProject —
  *    the Panels.fixed cap);
  *  - a grand (grouping-less) aggregate — exactly one row;
  *  - a grouped aggregate whose every key is DOMAIN-bounded: a fixed
  *    enum of the synthetic model ([[domainBoundedCols]]),
  *    DistributedRank's `__gr_shard_*` columns (its `__gr_grp_*` copy
  *    of the caller's group column is traced, not name-trusted), or
  *    an expression with a literal-bounded range (calendar parts,
  *    pmod-by-literal — Year excluded: a corpus's time span grows),
  *    traced through defining aliases/unions/generators
  *    ([[resolveDefs]], logical side);
  *  - a whole conjunct pinning a UNIQUE id ([[uniqueIdCols]]) to a
  *    literal range over a fan-out-free child — the fixed eval
  *    panels (a join under the filter would re-scale the panel);
  *  - a whole conjunct capping a row_number() whose window partitions
  *    only by domain-bounded keys, or by keys whose VALUES originate
  *    from a bounded subtree ([[valueBounded]] — the per-panel-query
  *    top-k idiom) — ≤ |domain|·k rows regardless of the child;
  *  - a grouped aggregate keyed on such value-bounded attrs (the
  *    per-panel-query feedback fold);
  *  - a scan of a fixed/star dimension ([[boundedTables]], final path
  *    segment equality), of a disk-staged artifact whose RECORDED
  *    build plan ([[graft.pipeline.Staged.buildPlanFor]]) is itself
  *    bounded by this walk, or of the capped panel artifacts whose
  *    builders bound a joined frame the walk cannot size
  *    ([[boundedStagedTags]]);
  *  - a localCheckpoint leaf whose pre-checkpoint plan, recorded by
  *    [[graft.pipeline.Lineage]], is bounded by this walk;
  *  - local/range relations, and any chain / join / union / window /
  *    generate over only bounded inputs (persisted frames are judged
  *    through their cached physical subtree).
  *
  * Nothing here trusts a claim: the registries carry PLANS, and the
  * walk re-judges them structurally.
  */
object BoundedWalk {

  /** Columns whose value DOMAIN is a fixed enum of the synthetic data
    * model (TESTDATA.md) or of the reference's label scheme — a
    * grouped aggregate keyed only on these is grid-bounded at any
    * corpus size.
    */
  val domainBoundedCols: Set[String] = Set(
    "event_type", "lang", "source", "label",
    "l_returnflag", "l_linestatus", "c_mktsegment", "p_brand",
    "main_type",
    // The langid eval harness's two language-valued columns: true_lang
    // is the corpus lang label, pred_lang ranges over the classifier's
    // fixed stopword-list language set — both fixed enums, NOT generic
    // names (the fe722c8 rule: only domain-specific names enter here).
    "true_lang", "pred_lang")

  /** Unique row ids (one row per value in their table) — a filter
    * pinning one to a literal range is a fixed panel.
    */
  val uniqueIdCols: Set[String] = Set("vec_id", "doc_id")

  /** Each unique id's HOME table — the only corpus scan where THAT id
    * is one-row-per-value by construction. A disk-staged artifact
    * written after a fan-out join re-enters the walk as an opaque
    * parquet leaf where the id can repeat corpus-many times, so the
    * id-panel rule must not treat every leaf as fan-out-free
    * (final-segment match, like [[boundedTables]]); and the knowledge
    * is keyed PER ID, not per table — a doc_id panel over
    * embeddings.parquet (vec_id's home, where doc_id would not be
    * one-row-per-value) certifies nothing.
    */
  val uniqueIdHomeTables: Map[String, String] = Map(
    "doc_id" -> "documents.parquet", "vec_id" -> "embeddings.parquet")

  /** Fixed/star dimension tables, matched by the leaf path's FINAL
    * segment (not substring — a future artifact whose path merely
    * contains "part.parquet" must not inherit the bound).
    */
  val boundedTables: Set[String] = Set(
    "region.parquet", "nation.parquet",
    "customer.parquet", "supplier.parquet", "part.parquet")

  /** Columns whose VALUE SET is a subset of a bounded dimension's key
    * set — the dimensions' own keys plus the synthetic model's foreign
    * keys into them (TESTDATA.md mirrors TPC-H referential integrity).
    * A grouped aggregate keyed on one has at most |dimension| rows no
    * matter how large the fact table it reads: the walk's stand-in for
    * the foreign-key knowledge a catalog would carry. Fact-table keys
    * (o_orderkey, l_orderkey, event/doc/vec ids) are deliberately
    * absent — their domains are corpus-scaled. Like
    * [[domainBoundedCols]], the name certifies only at a source leaf;
    * aliases are traced to their definitions.
    */
  val dimFkCols: Set[String] = Set(
    "s_suppkey", "l_suppkey", "ps_suppkey",
    "p_partkey", "l_partkey", "ps_partkey",
    "c_custkey", "o_custkey",
    "n_nationkey", "c_nationkey", "s_nationkey",
    "r_regionkey", "n_regionkey")

  /** Staged panel artifacts whose builders cap a JOINED frame the walk
    * cannot size from the build plan alone (the panel limit runs
    * before a fan-out join, so the artifact is panel-bounded but not
    * plan-top-limited). Matched as `tag-` prefix of the final path
    * segment — staged dirs are named `tag-<planhash>-<datahash>`.
    */
  val boundedStagedTags: Seq[String] = Seq("lex_qterms", "ivf_qprobes")

  /** Split a predicate into top-level conjuncts: a bounding
    * comparison only counts when it is a WHOLE conjunct — under an OR
    * or NOT it no longer bounds the output (`vec_id < 10 OR cond`
    * passes every cond row).
    */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Typed-Dataset operators that can emit MANY rows per input row
    * while being plain unary nodes — the generic one-child fall-through
    * must never walk through them (a 1-row frame flatMapping a
    * collected corpus-sized array is the same hazard as exploding it).
    * Matched by node name so logical and physical twins share one list.
    */
  private def fanoutOperator(nodeName: String): Boolean = {
    val n = nodeName.stripSuffix("Exec")
    n == "MapPartitions" || n == "MapGroups" || n == "MapInPandas" ||
      n == "MapInArrow" || n.startsWith("FlatMap")
  }

  /** No node between `p` and its leaves can INCREASE row multiplicity:
    * joins, unions, generators, and typed fan-out operators are out;
    * filters/projections/windows/sorts preserve or shrink rows, and an
    * aggregate emits at most one row per input group. Guards the
    * id-panel rule: `filter(doc_id < k)` bounds the OUTPUT only while
    * nothing below the filter duplicated the id (a join under the
    * filter re-scales the panel by its fan-out). LEAVES are not free by
    * default: an opaque parquet leaf may be a staged artifact WRITTEN
    * after a fan-out join (the id repeats corpus-many times inside it),
    * so a file leaf qualifies only as the id's home table, a bounded
    * dimension, or a staged artifact whose RECORDED build plan is
    * itself fan-out free; checkpoint/cache leaves recurse through their
    * registries like the bounded walk does.
    */
  private def fanoutFree(p: LogicalPlan, ids: Set[String]): Boolean = p match {
    // A LITERAL-fan-out generator multiplies each id's row count by a
    // corpus-independent constant (posexplode over an array(…) of
    // literal length — the subvector-unnest idiom), so an id panel
    // stays |panel|·n: allowed. A DATA-array explode is not.
    case g: Generate => boundedGenerator(g.generator) && fanoutFree(g.child, ids)
    case _: Join | _: Union => false
    case leaf: LeafNode => fanoutFreeLeaf(leaf, ids)
    case a: Aggregate => fanoutFree(a.child, ids)
    case other if other.children.size == 1 =>
      !fanoutOperator(other.nodeName) && fanoutFree(other.children.head, ids)
    case _ => false
  }

  /** `ids` are the pinned panel ids the enclosing filter bounds: the
    * leaf qualifies as a home table only for ONE OF THOSE ids — a
    * doc_id panel over vec_id's home table would treat a leaf as
    * one-row-per-value for an id that is not.
    */
  private def fanoutFreeLeafPath(pathStr: String, ids: Set[String]): Boolean = {
    val seg = leafFsPath(pathStr).stripSuffix("/").split('/').last
    ids.exists(id => uniqueIdHomeTables.get(id).contains(seg)) ||
      boundedTables.contains(seg) ||
      stagedTagHash(pathStr).exists { case (tag, h) =>
        graft.pipeline.Staged.buildPlanFor(tag, h).exists(fanoutFree(_, ids))
      }
  }

  private def fanoutFreeLeaf(p: LeafNode, ids: Set[String]): Boolean = p match {
    case _: LocalRelation => true
    case _: Range => true
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.nonEmpty &&
            fs.location.rootPaths.forall(pth =>
              fanoutFreeLeafPath(pth.toString, ids))
        case _ => false
      }
    case l: execution.LogicalRDD =>
      graft.pipeline.Lineage.planFor(l.rdd.id).exists(fanoutFree(_, ids))
    case c: graft.pipeline.CheckpointRef =>
      graft.pipeline.Lineage.planFor(c.rddId).exists(fanoutFree(_, ids))
    case m: execution.columnar.InMemoryRelation =>
      fanoutFreePhys(m.cachedPlan, ids)
    case _ => false
  }

  private def fanoutFreePhys(
      p: execution.SparkPlan, ids: Set[String]): Boolean = p match {
    // See the logical twin: literal-fan-out generators are allowed.
    case g: execution.GenerateExec =>
      boundedGenerator(g.generator) && fanoutFreePhys(g.child, ids)
    case _: execution.joins.BaseJoinExec | _: execution.UnionExec => false
    case _: execution.LocalTableScanExec => true
    case _: execution.RangeExec => true
    case sc: execution.FileSourceScanExec =>
      sc.relation.location.rootPaths.nonEmpty &&
        sc.relation.location.rootPaths.forall(pth =>
          fanoutFreeLeafPath(pth.toString, ids))
    case r: execution.RDDScanExec =>
      graft.pipeline.Lineage.planFor(r.rdd.id).exists(fanoutFree(_, ids))
    case m: execution.columnar.InMemoryTableScanExec =>
      fanoutFreePhys(m.relation.cachedPlan, ids)
    case aq: execution.adaptive.AdaptiveSparkPlanExec =>
      fanoutFreePhys(aq.inputPlan, ids)
    case q: execution.adaptive.QueryStageExec => fanoutFreePhys(q.plan, ids)
    case _: execution.LeafExecNode => false
    case a: execution.aggregate.BaseAggregateExec =>
      fanoutFreePhys(a.child, ids)
    case other if other.children.size == 1 =>
      !fanoutOperator(other.nodeName) && fanoutFreePhys(other.children.head, ids)
    case _ => false
  }

  /** Leaf-level name trust: a fixed-enum domain column or a dimension
    * FK — consulted ONLY where alias tracing bottoms out at a source
    * leaf (see the Attribute case of [[domainBoundedExpr]]).
    * __gr_shard_* is handled separately there: it is alias-defined by
    * design (DistributedRank's own literal math), so it is exempt from
    * the trace-first rule. __gr_grp_* is deliberately NOT trusted by
    * name: it is a copy of the CALLER's group column, so the walk
    * traces it through its defining alias like any other attribute.
    */
  private def leafNameBounded(a: Attribute): Boolean =
    domainBoundedCols.contains(a.name) || dimFkCols.contains(a.name)

  /** The generator's PER-ROW fan-out is a literal: stack(n, …) emits
    * exactly n rows, explode/posexplode of a literal-length array (or
    * a literal-bounded sequence) emits that many. explode of a DATA
    * array is NOT bounded — a 1-row frame holding a collected
    * corpus-sized array explodes right back to corpus rows, so
    * `Generate over bounded child` alone proves nothing.
    */
  private def boundedGenerator(gen: Expression): Boolean = gen match {
    case st: Stack => st.children.head.isInstanceOf[Literal]
    case e: ExplodeBase => e.child match {
      case _: CreateArray => true
      // Constant folding turns array(lit…)/sequence(lit, lit) into one
      // literal array value — fixed length by definition.
      case _: Literal => true
      case sq: Sequence =>
        sq.start.isInstanceOf[Literal] && sq.stop.isInstanceOf[Literal]
      case _ => false
    }
    case _ => false
  }

  /** A plan scope an attribute's defining expressions can be resolved
    * in. Two concrete scopes — logical and physical — because tracing
    * must CROSS persisted-cache boundaries: a logical walk hitting an
    * InMemoryRelation continues positionally into the cached PHYSICAL
    * subtree (exprIds remap across the boundary; names and positions
    * survive), where the defining aliases actually live.
    */
  private sealed trait Scope {
    def resolve(a: Attribute): Seq[(Expression, Scope)]
  }
  private final case class LScope(p: LogicalPlan) extends Scope {
    def resolve(a: Attribute): Seq[(Expression, Scope)] = resolveDefs(a, p)
  }
  private final case class PScope(p: execution.SparkPlan) extends Scope {
    def resolve(a: Attribute): Seq[(Expression, Scope)] = resolveDefsPhys(a, p)
  }

  /** Positional hop across a cache boundary: outer attribute index →
    * the inner (cached) plan's attribute at the same position.
    */
  private def crossCache(a: Attribute, outerOut: Seq[Attribute],
      inner: execution.SparkPlan): Seq[(Expression, Scope)] = {
    val idx = outerOut.indexWhere(_.exprId == a.exprId)
    if (idx < 0 || idx >= inner.output.length) Nil
    else Seq((inner.output(idx): Expression, PScope(inner)))
  }

  /** Poison definition for resolved-but-untraceable cases: an
    * expression no recognizer certifies, so returning it (instead of
    * Nil) blocks the caller's bare-name fallback. CreateArray is used
    * only as "some uncertifiable expression" — it never certifies.
    */
  private def poisonDef(scope: Scope): Seq[(Expression, Scope)] =
    Seq((CreateArray(Nil): Expression, scope))

  /** The ONE stagecache gate — under-cache-root check plus
    * `tag-<hash>-<fp>` recovery — shared by the row-count walks
    * ([[boundedLeafPath]], [[fanoutFreeLeafPath]]) and the resolution
    * hop ([[stagedBuildDefs]]), so a change to Staged's artifact
    * naming or directory layout can never be mirrored in only some of
    * them. Trailing separator on the root: a SIBLING like
    * .../stagecacheX must not pass the gate.
    */
  /** (scheme, authority, path) of a leaf location, with the local
    * defaults normalized (no scheme ≡ `file`, no authority ≡ ""): the
    * containment check below must compare FULLY-QUALIFIED locations —
    * a bare-path comparison would let a REMOTE artifact
    * (hdfs://host/<same-path-as-cacheRoot>/tag-h-fp) pass as a local
    * stagecache artifact and be judged by the local registry.
    */
  private[graft] def leafFsQualified(
      pathStr: String): (String, String, String) =
    try {
      val u = new org.apache.hadoop.fs.Path(pathStr).toUri
      val p = Option(u.getPath).filter(_.nonEmpty).getOrElse(pathStr)
      (Option(u.getScheme).getOrElse("file"),
        Option(u.getAuthority).getOrElse(""), p)
    } catch { case _: IllegalArgumentException => ("file", "", pathStr) }

  private[graft] def underCacheRoot(pathStr: String): Boolean = {
    val (rs, ra, rp) = leafFsQualified(graft.pipeline.Staged.cacheRoot)
    val (ls, la, lp) = leafFsQualified(pathStr)
    ls == rs && la == ra && lp.startsWith(rp.stripSuffix("/") + "/")
  }

  /** (tag, plan hash) of a stagecache artifact directory. The hash pins
    * registry lookups to the generation that produced THIS artifact —
    * the registry is last-write-wins per tag.
    */
  private def stagedTagHash(pathStr: String): Option[(String, String)] =
    if (!underCacheRoot(pathStr)) None
    else {
      val seg = leafFsPath(pathStr).stripSuffix("/").split('/').last
      "^([A-Za-z0-9_]+)-(\\d+)-[0-9a-f]+$".r.findFirstMatchIn(seg)
        .map(g => (g.group(1), g.group(2)))
    }

  /** Resolution hop across a disk-staged artifact boundary: a staged
    * parquet leaf's column is DEFINED by the recorded build plan's
    * same-named output column (exprIds do not survive the write/read
    * roundtrip; names do, and parquet field names are unique — NOT
    * positional, because the reading scan may be column-pruned). This
    * is what lets a domain/FK bound survive the `l_suppkey AS s`
    * rename inside a staged build: the trace continues into the
    * recorded plan instead of stopping at an opaque leaf. A stagecache
    * leaf WITHOUT a recorded build plan (diskKeyed artifacts record
    * nothing by design; stale generations) is RESOLVED-BUT-UNTRACEABLE,
    * not a source leaf: poison it so a corpus column laundered into a
    * domain/FK name inside an unregistered staged build can never ride
    * bare-name trust. Original corpus/dimension tables (not under the
    * cache root) keep leaf name trust — that is the model's anchor.
    */
  private def stagedBuildDefs(
      a: Attribute, roots: Seq[String],
      here: Scope): Seq[(Expression, Scope)] =
    roots match {
      case Seq(single) if underCacheRoot(single) =>
        (for {
          th <- stagedTagHash(single)
          plan <- graft.pipeline.Staged.buildPlanFor(th._1, th._2)
          out <- plan.output.find(_.name == a.name)
        } yield Seq((out: Expression, LScope(plan): Scope)))
          .getOrElse(poisonDef(here))
      // A multi-root stagecache leaf is equally untraceable; multi-root
      // NON-cache leaves fall through to name trust like any source.
      case several if several.exists(underCacheRoot) => poisonDef(here)
      case _ => Nil
    }

  /** Resolution hop across a checkpoint boundary — the staged-leaf
    * rule's checkpoint twin: a LogicalRDD / CheckpointRef /
    * RDDScanExec leaf made through Lineage.checkpoint resolves into
    * the REGISTERED pre-checkpoint plan (exprIds survive
    * localCheckpoint, so match by exprId first; unique column name is
    * the fallback). An UNREGISTERED checkpoint is opaque — poison,
    * never bare-name trust, or a corpus column aliased to a domain/FK
    * name and then checkpointed would certify an unbounded frame.
    */
  private def checkpointDefs(
      a: Attribute, rddId: Int, here: Scope): Seq[(Expression, Scope)] =
    graft.pipeline.Lineage.planFor(rddId) match {
      case Some(plan) =>
        plan.output.find(_.exprId == a.exprId)
          // Name fallback only when the name is UNIQUE in the recorded
          // output: a pre-checkpoint JOIN plan can carry duplicate
          // column names, and picking the first would resolve the
          // attribute against an arbitrary same-named column. (ExprIds
          // normally hit — RDD ids never cross JVMs — so this path
          // covers exprId remapping across cache boundaries only.)
          .orElse {
            val byName = plan.output.filter(_.name == a.name)
            if (byName.lengthCompare(1) == 0) byName.headOption else None
          }
          .map(out => Seq((out: Expression, LScope(plan): Scope)))
          .getOrElse(poisonDef(here))
      case None => poisonDef(here)
    }

  /** Feeder expressions of generator output slot `idx` — shared by the
    * logical and physical resolvers.
    */
  private def generatorFeeders(gen: Expression, idx: Int): Seq[Expression] =
    gen match {
      // stack(n, e_00..e_0f, e_10..): output column idx is fed by slot
      // idx of every row — all n feeder expressions count.
      case st: Stack =>
        val numRows = st.children.head match {
          case Literal(n: Int, _) => n
          case _ => 0
        }
        if (numRows <= 0) Nil
        else {
          val numFields =
            math.ceil((st.children.length - 1).toDouble / numRows).toInt
          (0 until numRows).flatMap { r =>
            val pos = 1 + r * numFields + idx
            // Out-of-range slots fill with NULL — a 1-value domain.
            if (pos < st.children.length) Some(st.children(pos)) else None
          }
        }
      case ex: ExplodeBase => ex.child match {
        case CreateArray(items, _) => items
        case _ => Nil
      }
      case _ => Nil
    }

  /** Where attribute `a` is DEFINED: the candidate expressions (plus
    * the scope each reads from) that produce its values, found by
    * walking defining Project/Aggregate/Window nodes (pass-through
    * attributes recurse into the child). Multi-candidate cases — a
    * Union column is fed positionally by every branch, a generator
    * column by every row's slot expression — return ALL feeders: the
    * attribute's domain is bounded only when every candidate's is.
    * Empty = unresolvable (treated unbounded).
    */
  private def resolveDefs(
      a: Attribute, plan: LogicalPlan): Seq[(Expression, Scope)] = {
    def inList(exprs: Seq[NamedExpression], child: LogicalPlan) =
      exprs.collectFirst {
        case al: Alias if al.exprId == a.exprId =>
          Seq((al.child: Expression, LScope(child): Scope))
      }
    plan match {
      case p: Project =>
        inList(p.projectList, p.child).getOrElse(resolveDefs(a, p.child))
      case ag: Aggregate =>
        inList(ag.aggregateExpressions, ag.child)
          .getOrElse(resolveDefs(a, ag.child))
      case w: Window =>
        inList(w.windowExpressions, w.child).getOrElse(resolveDefs(a, w.child))
      case g: Generate =>
        val idx = g.generatorOutput.indexWhere(_.exprId == a.exprId)
        if (idx < 0) resolveDefs(a, g.child)
        else {
          val fs = generatorFeeders(g.generator, idx)
          // No recoverable feeders (explode of a DATA array, non-literal
          // stack) is RESOLVED-BUT-UNPROVABLE, not a leaf: return the
          // generator itself as a poison definition so the caller never
          // falls back to bare-name trust for `explode(…).as("lang")`.
          if (fs.isEmpty) Seq((g.generator: Expression, LScope(g.child): Scope))
          else fs.map(e => (e, LScope(g.child): Scope))
        }
      case u: Union =>
        // Positional lineage: the union column's values are the union
        // of every branch's column at the same position.
        val idx = u.output.indexWhere(_.exprId == a.exprId)
        if (idx < 0) Nil
        else u.children.map(c => (c.output(idx): Expression, LScope(c): Scope))
      case j: Join =>
        val l = resolveDefs(a, j.left)
        if (l.nonEmpty) l else resolveDefs(a, j.right)
      case m: execution.columnar.InMemoryRelation =>
        crossCache(a, m.output, m.cachedPlan)
      // The leaf hops below fire ONLY when the leaf actually outputs
      // the attribute (exprId membership, like crossCache): the Join
      // case above walks left-first, and an unguarded hop at a
      // left-side leaf would bind a RIGHT-side attribute to a
      // same-named column of the left's registered plan (name-fallback
      // cross-side laundering) — or poison it and never consult the
      // right side at all.
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.outputSet.contains(a) =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            stagedBuildDefs(a, fs.location.rootPaths.map(_.toString), LScope(r))
          case _ => Nil
        }
      case l: execution.LogicalRDD if l.outputSet.contains(a) =>
        checkpointDefs(a, l.rdd.id, LScope(l))
      case c: graft.pipeline.CheckpointRef if c.outputSet.contains(a) =>
        checkpointDefs(a, c.rddId, LScope(c))
      case _: LeafNode => Nil
      case other if other.children.size == 1 =>
        resolveDefs(a, other.children.head)
      case _ => Nil
    }
  }

  /** Physical twin of [[resolveDefs]] — runs inside cached subtrees. */
  private def resolveDefsPhys(
      a: Attribute, p: execution.SparkPlan): Seq[(Expression, Scope)] = {
    def inList(exprs: Seq[NamedExpression], child: execution.SparkPlan) =
      exprs.collectFirst {
        case al: Alias if al.exprId == a.exprId =>
          Seq((al.child: Expression, PScope(child): Scope))
      }
    p match {
      case pr: execution.ProjectExec =>
        inList(pr.projectList, pr.child).getOrElse(resolveDefsPhys(a, pr.child))
      case ag: execution.aggregate.BaseAggregateExec =>
        inList(ag.resultExpressions, ag.child)
          .getOrElse(resolveDefsPhys(a, ag.child))
      case w: execution.window.WindowExec =>
        inList(w.windowExpression, w.child)
          .getOrElse(resolveDefsPhys(a, w.child))
      case g: execution.GenerateExec =>
        val idx = g.generatorOutput.indexWhere(_.exprId == a.exprId)
        if (idx < 0) resolveDefsPhys(a, g.child)
        else {
          val fs = generatorFeeders(g.generator, idx)
          // See the logical twin: poison, never name-trust, a generator
          // output without recoverable feeders.
          if (fs.isEmpty) Seq((g.generator: Expression, PScope(g.child): Scope))
          else fs.map(e => (e, PScope(g.child): Scope))
        }
      case u: execution.UnionExec =>
        val idx = u.output.indexWhere(_.exprId == a.exprId)
        if (idx < 0) Nil
        else u.children.map(c => (c.output(idx): Expression, PScope(c): Scope))
      case j: execution.joins.BaseJoinExec =>
        val l = resolveDefsPhys(a, j.left)
        if (l.nonEmpty) l else resolveDefsPhys(a, j.right)
      case m: execution.columnar.InMemoryTableScanExec =>
        // Hop through the RELATION's full output, never the scan's: the
        // scan is column-PRUNED, so its positions do not align with the
        // cached plan's — m.output-based indexing mapped a pruned
        // p_brand scan onto the cached plan's column 0 (the basket
        // key). relation.output is position-aligned with cachedPlan
        // .output by construction; the scan's attrs share its exprIds.
        crossCache(a, m.relation.output, m.relation.cachedPlan)
      // See the logical twin: leaf hops require output membership.
      case sc: execution.FileSourceScanExec if sc.outputSet.contains(a) =>
        stagedBuildDefs(a, sc.relation.location.rootPaths.map(_.toString),
          PScope(sc))
      case r: execution.RDDScanExec if r.outputSet.contains(a) =>
        checkpointDefs(a, r.rdd.id, PScope(r))
      case aq: execution.adaptive.AdaptiveSparkPlanExec =>
        resolveDefsPhys(a, aq.inputPlan)
      case q: execution.adaptive.QueryStageExec => resolveDefsPhys(a, q.plan)
      case _: execution.LeafExecNode => Nil
      case other if other.children.size == 1 =>
        resolveDefsPhys(a, other.children.head)
      case _ => Nil
    }
  }

  /** The expression's VALUE DOMAIN is a fixed-size set at any corpus
    * scale: a literal, a domain-enum column (by name, or traced
    * through its defining expressions in `scope`), a bounded calendar
    * part, or a pmod-by-literal.
    */
  private def domainBoundedExpr(e: Expression, scope: Option[Scope]): Boolean =
    e match {
      case _: Literal => true
      case a: Attribute =>
        // __gr_shard_* is DistributedRank's reserved infrastructure
        // prefix — values ∈ [0, nShards] by its own literal decimal
        // math, and the prefix is ALIAS-defined by design, so it is
        // exempt from the trace-first rule below. The reservation is a
        // checked invariant, not review: BoundedWalkSpec pins that no
        // main source outside DistributedRank.scala mints the prefix.
        a.name.startsWith("__gr_shard_") || (scope match {
          // A DOMAIN/FK name certifies only when no defining alias is
          // locatable (the attribute is a source column read off a
          // leaf): an `.as("lang")` re-label of a corpus-valued
          // expression must be judged by its traced definition, or the
          // rename-not-alias convention for domain keys is enforced
          // only by review, never by the walk.
          case None => leafNameBounded(a)
          case Some(sc) =>
            val defs = sc.resolve(a)
            if (defs.isEmpty) leafNameBounded(a)
            else defs.forall { case (d, sub) => domainBoundedExpr(d, Some(sub)) }
        })
      // Year is deliberately ABSENT: a corpus whose time span grows
      // with its size grows its distinct-year count too.
      case _: Hour | _: Minute | _: Second | _: DayOfWeek | _: WeekDay |
          _: DayOfMonth | _: DayOfYear | _: Month | _: Quarter => true
      case Pmod(_, _: Literal, _) => true
      case c: Cast => domainBoundedExpr(c.child, scope)
      case al: Alias => domainBoundedExpr(al.child, scope)
      // A struct FIELD's domain is its feeder expressions' domains:
      // `explode(array(struct(lit(0)…), struct(lit(1)…))).getField(x)`
      // (the RFM metric-id idiom) resolves the struct attribute's
      // feeders (the CreateNamedStructs) and checks the one field.
      case gs: GetStructField =>
        def fieldOf(e: Expression): Option[Expression] = e match {
          case cs: CreateNamedStruct if gs.ordinal < cs.valExprs.length =>
            Some(cs.valExprs(gs.ordinal))
          case _ => None
        }
        gs.child match {
          case att: Attribute => scope.exists { sc =>
            val defs = sc.resolve(att)
            defs.nonEmpty && defs.forall { case (d, sub) =>
              fieldOf(d).exists(domainBoundedExpr(_, Some(sub)))
            }
          }
          case other => fieldOf(other).exists(domainBoundedExpr(_, scope))
        }
      // Branching selects FROM its branches: the output domain is the
      // union of the branch domains, so a CASE/IF/COALESCE whose every
      // branch is domain-bounded is too — the classifier idiom
      // (`CASE WHEN stopword-hits THEN 'en' … ELSE 'und'`) certifies by
      // its literal branches, not by what its predicates read.
      case cw: CaseWhen =>
        cw.branches.forall { case (_, v) => domainBoundedExpr(v, scope) } &&
          cw.elseValue.forall(domainBoundedExpr(_, scope))
      case i: If =>
        domainBoundedExpr(i.trueValue, scope) &&
          domainBoundedExpr(i.falseValue, scope)
      case c: Coalesce => c.children.forall(domainBoundedExpr(_, scope))
      case _ => false
    }

  /** The DISTINCT VALUE COUNT of attribute `a` in `plan`'s output is
    * corpus-independent: its values ORIGINATE from a bounded subtree
    * (e.g. the fixed panel side of a join), even when the frame
    * carrying them is corpus-sized — a join/filter/pass-through
    * projection can only shrink a column's value set, never grow it.
    * A grouped aggregate keyed on such attrs has ≤ Π per-key distinct
    * values rows; a row_number cap over them keeps ≤ k·Π rows. Window
    * and aggregate FUNCTION outputs are explicitly not value-bounded
    * (a rank's value set grows with its partition size).
    */
  private def valueBounded(a: Attribute, plan: LogicalPlan): Boolean =
    if (!plan.outputSet.contains(a)) false
    else if (isBounded(plan)) true
    else plan match {
      case p: Project =>
        p.projectList.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(att: Attribute) => valueBounded(att, p.child)
          case Some(_) => false
          case None => valueBounded(a, p.child)
        }
      case ag: Aggregate =>
        ag.aggregateExpressions.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(att: Attribute) => valueBounded(att, ag.child)
          case Some(_) => false // aggregate-function outputs excluded
          case None => valueBounded(a, ag.child) // grouping pass-through
        }
      case w: Window =>
        // rank/lead/etc. outputs are NOT value-bounded by provenance.
        if (w.windowExpressions.exists(_.exprId == a.exprId)) false
        else valueBounded(a, w.child)
      case j: Join =>
        (j.left.outputSet.contains(a) && valueBounded(a, j.left)) ||
          (j.right.outputSet.contains(a) && valueBounded(a, j.right))
      case _: LeafNode => false
      case other if other.children.size == 1 =>
        valueBounded(a, other.children.head)
      case _ => false
    }

  /** Physical twin of [[valueBounded]]. */
  private def valueBoundedPhys(
      a: Attribute, p: execution.SparkPlan): Boolean =
    if (!p.outputSet.contains(a)) false
    else if (boundedPhysical(p)) true
    else p match {
      case pr: execution.ProjectExec =>
        pr.projectList.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(att: Attribute) => valueBoundedPhys(att, pr.child)
          case Some(_) => false
          case None => valueBoundedPhys(a, pr.child)
        }
      case ag: execution.aggregate.BaseAggregateExec =>
        ag.resultExpressions.collectFirst {
          case al: Alias if al.exprId == a.exprId => al.child
        } match {
          case Some(att: Attribute) => valueBoundedPhys(att, ag.child)
          case Some(_) => false
          case None => valueBoundedPhys(a, ag.child)
        }
      case w: execution.window.WindowExec =>
        if (w.windowExpression.exists(_.exprId == a.exprId)) false
        else valueBoundedPhys(a, w.child)
      case j: execution.joins.BaseJoinExec =>
        (j.left.outputSet.contains(a) && valueBoundedPhys(a, j.left)) ||
          (j.right.outputSet.contains(a) && valueBoundedPhys(a, j.right))
      case aq: execution.adaptive.AdaptiveSparkPlanExec =>
        valueBoundedPhys(a, aq.inputPlan)
      case q: execution.adaptive.QueryStageExec => valueBoundedPhys(a, q.plan)
      case _: execution.LeafExecNode => false
      case other if other.children.size == 1 =>
        valueBoundedPhys(a, other.children.head)
      case _ => false
    }

  /** A whole conjunct pinning a unique id column to a literal range.
    * The id certifies by NAME only where alias tracing bottoms out at
    * a source leaf — the same trace-first rule as domain/FK names: a
    * corpus column renamed to doc_id (directly or inside a staged
    * build, which the resolution hops see through) would otherwise
    * turn `filter(doc_id < k)` into a corpus-growing "panel".
    */
  /** Returns the set of LEAF id names pinned by whole conjuncts (the
    * name where alias tracing bottoms out — what the downstream
    * home-table check must key on), empty when no conjunct pins one.
    */
  private def idPanelIds(cond: Expression, scope: Scope): Set[String] = {
    // The name at the trace's bottom, when EVERY resolution branch
    // bottoms out at the same unique-id leaf name.
    def leafIdName(e: Expression, sc: Scope): Option[String] = e match {
      case a: Attribute =>
        val defs = sc.resolve(a)
        if (defs.isEmpty) Some(a.name).filter(uniqueIdCols.contains)
        else {
          val names = defs.map { case (d, sub) => leafIdName(d, sub) }
          if (names.nonEmpty && names.forall(_.isDefined) &&
              names.flatten.toSet.size == 1) names.head
          else None
        }
      case al: Alias => leafIdName(al.child, sc)
      case c: Cast => leafIdName(c.child, sc)
      case _ => None
    }
    conjuncts(cond).flatMap {
      case LessThan(a, _: Literal) => leafIdName(a, scope)
      case LessThanOrEqual(a, _: Literal) => leafIdName(a, scope)
      case EqualTo(a, _: Literal) => leafIdName(a, scope)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        leafIdName(a, scope)
      case _ => None
    }.toSet
  }

  /** A whole conjunct capping a row_number() whose window partitions
    * only by domain-bounded keys: ≤ |key domain| · k rows no matter
    * how large the window's input — the per-group argmax /
    * crossing-bucket idiom. Only row_number: rank/dense_rank admit
    * unbounded ties at the cap.
    */
  def rankCapPredicate(cond: Expression, child: LogicalPlan): Boolean = {
    def rankAttr(e: Expression) = e match {
      case a: Attribute => boundedRowNumber(a, child)
      case _ => false
    }
    conjuncts(cond).exists {
      case EqualTo(a, _: Literal) => rankAttr(a)
      case LessThanOrEqual(a, _: Literal) => rankAttr(a)
      case LessThan(a, _: Literal) => rankAttr(a)
      case _ => false
    }
  }

  /** `a` is a row_number() over partition keys that are all
    * domain-bounded (or value-bounded by provenance), found by
    * walking down to its defining Window.
    */
  private def boundedRowNumber(a: Attribute, plan: LogicalPlan): Boolean =
    plan match {
      case w: Window =>
        w.windowExpressions.exists {
          case al: Alias if al.exprId == a.exprId =>
            al.child match {
              case WindowExpression(_: RowNumber, spec) =>
                spec.partitionSpec.nonEmpty &&
                  spec.partitionSpec.forall(e =>
                    domainBoundedExpr(e, Some(LScope(w.child))) || (e match {
                      case att: Attribute => valueBounded(att, w.child)
                      case _ => false
                    }))
              case _ => false
            }
          case _ => false
        } || boundedRowNumber(a, w.child)
      // A fan-out (join/generate/union/typed flatMap) or a regrouping
      // aggregate between the cap and its window voids the
      // <= |partitions|*k guarantee — each capped row re-multiplies.
      case _: Join | _: Union | _: Generate | _: Aggregate => false
      case _: LeafNode => false
      case other if other.children.size == 1 =>
        !fanoutOperator(other.nodeName) && boundedRowNumber(a, other.children.head)
      case _ => false
    }

  /** Physical twin of [[boundedRowNumber]] for cached/physical
    * subtrees (no alias tracing: physical partition specs reference
    * attributes directly).
    */
  private def boundedRowNumberPhys(
      a: Attribute, plan: execution.SparkPlan): Boolean = plan match {
    case w: execution.window.WindowExec =>
      w.windowExpression.exists {
        case al: Alias if al.exprId == a.exprId =>
          al.child match {
            case WindowExpression(_: RowNumber, spec) =>
              spec.partitionSpec.nonEmpty &&
                spec.partitionSpec.forall(e =>
                  domainBoundedExpr(e, Some(PScope(w.child))) || (e match {
                    case att: Attribute => valueBoundedPhys(att, w.child)
                    case _ => false
                  }))
            case _ => false
          }
        case _ => false
      } || boundedRowNumberPhys(a, w.child)
    case _: execution.joins.BaseJoinExec | _: execution.UnionExec |
        _: execution.GenerateExec | _: execution.aggregate.BaseAggregateExec =>
      false
    case _: execution.LeafExecNode => false
    case other if other.children.size == 1 =>
      !fanoutOperator(other.nodeName) && boundedRowNumberPhys(a, other.children.head)
    case _ => false
  }

  private def rankCapPredicatePhys(
      cond: Expression, child: execution.SparkPlan): Boolean = {
    def rankAttr(e: Expression) = e match {
      case a: Attribute => boundedRowNumberPhys(a, child)
      case _ => false
    }
    conjuncts(cond).exists {
      case EqualTo(a, _: Literal) => rankAttr(a)
      case LessThanOrEqual(a, _: Literal) => rankAttr(a)
      case LessThan(a, _: Literal) => rankAttr(a)
      case _ => false
    }
  }

  /** The leaf path's final segment names a bounded table, a capped
    * panel artifact, or a staged artifact whose recorded build plan is
    * itself bounded. Staged-tag recovery only applies to paths UNDER
    * the stage-cache root: an unrelated directory that merely matches
    * the `tag-<hash>-<fp>` naming must not be judged by a registered
    * tag's plan (the registry describes stagecache artifacts only).
    */
  /** Filesystem-path view of a leaf location: `file:`, `file://`, and
    * `file:///` spellings (and any other scheme) all normalize to the
    * bare URI path — a literal `stripPrefix("file:")` left
    * `//`-qualified roots with extra slashes, silently failing the
    * under-cache-root gate and spuriously de-certifying staged
    * artifacts on such Hadoop configurations.
    */
  private def leafFsPath(pathStr: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(pathStr).toUri.getPath
      if (p == null || p.isEmpty) pathStr else p
    } catch { case _: IllegalArgumentException => pathStr }

  private def boundedLeafPath(pathStr: String): Boolean = {
    val seg = leafFsPath(pathStr).stripSuffix("/").split('/').last
    boundedTables.contains(seg) ||
      (underCacheRoot(pathStr) &&
        boundedStagedTags.exists(t => seg.startsWith(s"$t-"))) ||
      // Staged dirs are `tag-<hash>-<fp>`: the shared gate recovers tag
      // AND hash and the artifact is judged by the build plan Staged
      // recorded for it (never diskKeyed's declarative stand-in keys,
      // which record nothing).
      stagedTagHash(pathStr).exists { case (tag, h) =>
        graft.pipeline.Staged.buildPlanFor(tag, h).exists(isBounded)
      }
  }

  private def boundedLeaf(p: LeafNode): Boolean = p match {
    case _: LocalRelation => true
    case _: Range => true
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          // forall, not exists: a multi-path relation mixing a bounded
          // dimension with a corpus table is corpus-scaled.
          fs.location.rootPaths.nonEmpty &&
            fs.location.rootPaths.forall(pth => boundedLeafPath(pth.toString))
        case _ => false
      }
    case l: execution.LogicalRDD =>
      // Checkpointed frame: judge the recorded PRE-checkpoint plan.
      graft.pipeline.Lineage.planFor(l.rdd.id).exists(isBounded)
    case c: graft.pipeline.CheckpointRef =>
      // Nested checkpoint inside a REGISTERED plan (Lineage stores
      // LogicalRDD leaves as id-only stubs so the registry never pins
      // their RDD blocks) — resolve exactly like the raw leaf.
      graft.pipeline.Lineage.planFor(c.rddId).exists(isBounded)
    case m: execution.columnar.InMemoryRelation =>
      // Persisted (Staged) frame: judge the CACHED physical subtree.
      boundedPhysical(m.cachedPlan)
    case _ => false
  }

  /** The LOGICAL subtree's row count is bounded independent of corpus
    * scale.
    */
  def isBounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit => true
    // LocalLimit is NOT a bound: it caps rows per PARTITION, so the
    // subtree still scales with partition count.
    case l: LocalLimit => isBounded(l.child)
    case a: Aggregate =>
      a.groupingExpressions.isEmpty ||
        (a.groupingExpressions.nonEmpty && a.groupingExpressions.forall(k =>
          domainBoundedExpr(k, Some(LScope(a.child))) || (k match {
            case att: Attribute => valueBounded(att, a.child)
            case _ => false
          }))) ||
        isBounded(a.child)
    case f: Filter =>
      { val ids = idPanelIds(f.condition, LScope(f.child))
        ids.nonEmpty && fanoutFree(f.child, ids) } ||
        rankCapPredicate(f.condition, f.child) ||
        isBounded(f.child)
    case w: Window => isBounded(w.child)
    case j: Join => isBounded(j.left) && isBounded(j.right)
    case u: Union => u.children.forall(isBounded)
    case g: Generate => boundedGenerator(g.generator) && isBounded(g.child)
    case leaf: LeafNode => boundedLeaf(leaf)
    case other if other.children.size == 1 =>
      !fanoutOperator(other.nodeName) && isBounded(other.children.head)
    case _ => false
  }

  /** The PHYSICAL subtree's row count is bounded independent of corpus
    * scale — same idioms as [[isBounded]]; cached and checkpointed
    * leaves recurse back into the logical walk through the registries.
    */
  def boundedPhysical(p: execution.SparkPlan): Boolean = p match {
    case _: execution.GlobalLimitExec => true
    case l: execution.LocalLimitExec => boundedPhysical(l.child)
    case _: execution.TakeOrderedAndProjectExec => true
    case _: execution.LocalTableScanExec => true
    // spark.range(a, b): literal bounds by construction — the fixed
    // estimator/bucket/shard panels (AMS i∈[0,16), drift buckets,
    // zone-map shards).
    case _: execution.RangeExec => true
    case a: execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty ||
        (a.groupingExpressions.nonEmpty && a.groupingExpressions.forall(k =>
          domainBoundedExpr(k, Some(PScope(a.child))) || (k match {
            case att: Attribute => valueBoundedPhys(att, a.child)
            case _ => false
          }))) ||
        boundedPhysical(a.child)
    case f: execution.FilterExec =>
      { val ids = idPanelIds(f.condition, PScope(f.child))
        ids.nonEmpty && fanoutFreePhys(f.child, ids) } ||
        rankCapPredicatePhys(f.condition, f.child) ||
        boundedPhysical(f.child)
    case w: execution.window.WindowExec => boundedPhysical(w.child)
    case j: execution.joins.BaseJoinExec =>
      boundedPhysical(j.left) && boundedPhysical(j.right)
    case u: execution.UnionExec => u.children.forall(boundedPhysical)
    case g: execution.GenerateExec =>
      boundedGenerator(g.generator) && boundedPhysical(g.child)
    case sc: execution.FileSourceScanExec =>
      sc.relation.location.rootPaths.nonEmpty &&
        sc.relation.location.rootPaths.forall(pth =>
          boundedLeafPath(pth.toString))
    case m: execution.columnar.InMemoryTableScanExec =>
      boundedPhysical(m.relation.cachedPlan)
    case r: execution.RDDScanExec =>
      graft.pipeline.Lineage.planFor(r.rdd.id).exists(isBounded)
    // AQE wrappers are LEAVES that hide their subtrees (cached plans
    // are built under AdaptiveSparkPlanExec; materialized stages are
    // QueryStageExec) — judge the wrapped plan.
    case a: execution.adaptive.AdaptiveSparkPlanExec =>
      boundedPhysical(a.inputPlan)
    case q: execution.adaptive.QueryStageExec => boundedPhysical(q.plan)
    case _: execution.LeafExecNode => false
    case other if other.children.size == 1 =>
      !fanoutOperator(other.nodeName) && boundedPhysical(other.children.head)
    case _ => false
  }
}
