package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation WITH pointer jumping —
  * the clustering step a dedup pipeline runs over its candidate-pair
  * graph (cluster id = component-min node, the deterministic keeper).
  *
  * Each round does two monotone label-lowering steps:
  *   1. propagate: label(u) <- min(label(u), min over neighbours v of
  *      label(v)) — one shuffle join plus one min-aggregate;
  *   2. shortcut (pointer jumping): label(u) <- label(label(u)) — one
  *      self-join on the label. Every label value is itself a node id
  *      in the same component (invariant: labels only ever take values
  *      of in-component node ids, and label(x) <= x), so the jump is
  *      always defined and only lowers labels.
  *
  * Shortcutting is what turns the O(diameter) plain propagation into
  * O(log n) worst case: on a path graph the reach roughly doubles per
  * round (same asymptotic bound as the alternating large-star/
  * small-star formulation, with one fewer shuffle per round — both are
  * the standard MapReduce-CC constructions, cf. Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14).
  * Duplicate clusters are near-cliques (every member collides with most
  * others in some LSH band) and converge in 2-3 rounds regardless; the
  * log bound is for pathological chains. The driver carries only a
  * convergence bit per round — never data.
  *
  * At a fixpoint the labels ARE the component minima: step 1 at a
  * fixpoint forces label(u) <= label(v) across every (symmetric) edge,
  * hence label constant per component; the constant is an in-component
  * id <= the component min, hence exactly the min.
  */
object ConnectedComponents {

  /** `pairs`: two long columns (a, b), undirected edges. Returns
    * (id, cluster) for every node appearing in at least one pair.
    *
    * @throws IllegalStateException if maxRounds elapse without reaching
    *         a fixpoint (never silently-wrong labels — the DuckDB
    *         oracle computes the true components recursively).
    */
  def clusters(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxRounds: Int = 50): DataFrame = {
    val (labels, rounds, converged) = clustersDetailed(pairs, a, b, maxRounds)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $rounds rounds " +
          s"(maxRounds=$maxRounds); with pointer jumping this needs " +
          "~log2(n) rounds — the input graph is larger than maxRounds allows")
    labels
  }

  /** [[clusters]] plus the round count and convergence bit — the spec
    * surface for asserting the O(log n) bound on chain graphs.
    */
  def clustersDetailed(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxRounds: Int = 50): (DataFrame, Int, Boolean) = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .persist()
    // Size the LOOP's shuffle width to the graph, not the session
    // default: an iterative job re-pays fixed per-stage latency every
    // round × every shuffle, so a long-diameter graph (log2(diam)
    // rounds of 4 shuffles each) over few edges drowns in scheduling
    // at the session's width — the same right-sizing AQE applies to
    // one-shot plans, done once here for the whole loop (AQE cannot
    // see across localCheckpoint'd rounds). Never raised ABOVE the
    // session conf: a 10^12-edge graph keeps the cluster's width.
    val spark = pairs.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(confKey)
    val loopWidth = math.max(1L,
      math.min(saved.toLong, edges.count() / EdgesPerPartition + 1))
    spark.conf.set(confKey, loopWidth.toString)
    try clustersLoop(edges, loopWidth.toInt, maxRounds)
    finally spark.conf.set(confKey, saved)
  }

  /** Edges per shuffle partition in the iterative loops: ~16 bytes per
    * (src, dst) row puts this at the standard 64-256 MB partition
    * target.
    */
  private val EdgesPerPartition = 4000000L

  /** Partition-local union-find seed labels — the two-phase CC
    * contraction: each partition solves its OWN subgraph exactly in one
    * imperative pass (union by min, path compression), so the
    * distributed rounds that follow only have to bridge
    * CROSS-partition chains. A path that never leaves its partition
    * costs zero rounds; the worst case drops from log2(graph diameter)
    * to log2(cross-partition diameter). This is the one place the
    * engine runs per-partition imperative logic — the standard
    * large-graph CC trick (partition-local contraction before the
    * message rounds), impossible to express relationally without
    * paying the rounds it exists to avoid.
    *
    * Invariants the propagate+shortcut loop needs still hold: every
    * seed label is an in-component node id (the local component's
    * minimum), and label(x) <= x. A node split across partitions gets
    * the min of its local roots. Node ids must be integral (every
    * caller keys on long ids).
    */
  private def localSeed(edges: DataFrame, loopWidth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.coalesce(math.max(1, loopWidth))
      .select(col("src").cast("long").as("_1"),
        col("dst").cast("long").as("_2"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a)
          val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        parent.keysIterator.map(k => (k, find(k)))
      }
      .toDF("id", "label")
      .groupBy("id").agg(min(col("label")).as("label"))
  }

  private def clustersLoop(edges: DataFrame, loopWidth: Int,
      maxRounds: Int): (DataFrame, Int, Boolean) = {
    var labels = localSeed(edges, loopWidth).persist()
    var converged = false
    var rounds = 0
    // The checkpointed RDD backing the previous round's labels frame.
    // localCheckpoint persists outside the cache manager, so
    // Dataset.unpersist() is a no-op on it; without an explicit
    // RDD.unpersist each round's blocks linger in executor storage until
    // the ContextCleaner GCs the dropped reference — unbounded across a
    // long run. We extract it from the LogicalRDD leaf and release it as
    // soon as the next round has materialized.
    var prevCheckpointed: Option[RDD[_]] = None
    while (!converged && rounds < maxRounds) {
      val prop = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr"))
      // Step 1: min over self + neighbours. Persisted because step 2
      // self-joins it (Spark shares no subtree between self-join sides).
      val stepped = labels.join(prop, col("id") === col("src"), "left_outer")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("mid"))
        .persist()
      // Step 2: pointer jump label <- label(label). Both steps only
      // lower labels, so "nothing changed across the composite round"
      // implies a fixpoint of step 1 alone — the convergence probe
      // (carrying old + new in one frame, one action per round) is
      // sound for the combined round.
      val parent = stepped.select(col("id").as("pid"), col("mid").as("plabel"))
      // Eager localCheckpoint, not persist: each round's plan references
      // the previous round's TWICE (the self-join), so without lineage
      // truncation the logical plan doubles per round and a log2(n)-round
      // run OOMs the driver on plan bookkeeping alone. Checkpointing
      // per iteration is the standard iterative-algorithm shape (cf.
      // GraphFrames' checkpointInterval); blocks live in executor
      // storage, the driver still carries only the convergence bit.
      val next = stepped.join(parent, col("mid") === col("pid"), "left_outer")
        .select(col("id"), col("old"),
          coalesce(col("plabel"), col("mid")).as("label"))
        .localCheckpoint(true)
      converged = next.filter(col("label") =!= col("old")).limit(1).count() == 0L
      stepped.unpersist()
      labels.unpersist() // round 0's plain persist; no-op once checkpointed
      // `next` is eagerly materialized (localCheckpoint(true)), so the
      // previous round's checkpoint blocks are no longer referenced.
      prevCheckpointed.foreach(_.unpersist(blocking = false))
      prevCheckpointed = next.queryExecution.analyzed.collectFirst {
        case r: LogicalRDD => r.rdd
      }
      labels = next
      rounds += 1
    }
    edges.unpersist()
    (labels.select(col("id"), col("label").as("cluster")), rounds, converged)
  }

  /** Alternating large-star / small-star connected components — the
    * OTHER standard MapReduce-CC construction (Kiveris et al., SoCC'14,
    * "Connected Components in MapReduce and Beyond", Alg. 2/3), kept as
    * a first-class alternative to [[clusters]] because its costs land
    * differently at scale: it shuffles EDGES (whose count shrinks
    * toward a star forest each round) where label propagation shuffles
    * a fixed node-labels table; on high-degree near-clique dup graphs
    * the first large-star round collapses most of the edge mass onto
    * component minima. Both converge to identical labels (pinned in
    * ConnectedComponentsSpec).
    *
    * One round = large-star then small-star over canonical (u < v)
    * edges, m = min of the closed neighborhood:
    *   large-star(x): emit (m, y) for y in Γ(x), y > x
    *   small-star(x): emit (m, y) for y in Γ(x) ∪ {x}, y <= x
    * m <= y always (m is the closed-neighborhood min), so emissions are
    * born canonical. At the fixpoint the edge set IS the star forest
    * (root = component min); labels read off as each node's min
    * neighbor. Each phase is eagerly localCheckpoint'ed: the
    * symmetrize-union references the edge frame twice, so an
    * uncheckpointed round would double both plan and execution.
    */
  def clustersStar(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxRounds: Int = 50): DataFrame = {
    val (labels, rounds, converged) = clustersStarDetailed(pairs, a, b, maxRounds)
    if (!converged)
      throw new IllegalStateException(
        s"large-star/small-star did not converge in $rounds rounds (maxRounds=$maxRounds)")
    labels
  }

  /** [[clustersStar]] plus round count and convergence bit. */
  def clustersStarDetailed(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxRounds: Int = 50): (DataFrame, Int, Boolean) = {
    val nodes = pairs.select(col(a).as("id"))
      .union(pairs.select(col(b).as("id"))).distinct().persist()
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val sym = e.select(col("u").as("x"), col("v").as("y"))
        .union(e.select(col("v").as("x"), col("u").as("y")))
      val m = sym.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
      val base = sym.join(m, "x")
      val out =
        if (large) base.filter(col("y") > col("x"))
          .select(col("m").as("u"), col("y").as("v"))
        else base.filter(col("y") <= col("x"))
          .select(col("m").as("u"), col("y").as("v"))
          // small-star also re-links x itself to m (the emission that
          // keeps a node attached when all its neighbors are larger).
          .union(m.select(col("m").as("u"), col("x").as("v")))
      out.filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    }
    var prev: Option[RDD[_]] = None
    def swap(df: DataFrame): DataFrame = {
      prev.foreach(_.unpersist(blocking = false))
      prev = df.queryExecution.analyzed.collectFirst { case r: LogicalRDD => r.rdd }
      df
    }
    var edges = swap(pairs
      .select(least(col(a), col(b)).as("u"), greatest(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true))
    var converged = false
    var rounds = 0
    // Same loop-scoped shuffle right-sizing as [[clustersDetailed]]:
    // never above the session conf, ~4M edges per partition below it.
    val spark = pairs.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(confKey)
    val loopWidth = math.max(1L,
      math.min(saved.toLong, edges.count() / EdgesPerPartition + 1))
    spark.conf.set(confKey, loopWidth.toString)
    try while (!converged && rounds < maxRounds) {
      val ls = phase(edges, large = true)
      val next = phase(ls, large = false)
      // Sound fixpoint probe: the canonical edge sets are equal. Counts
      // first (one cached aggregate each), EXCEPT only to confirm.
      converged = next.count() == edges.count() &&
        next.except(edges).limit(1).count() == 0L
      // ls's checkpoint blocks are dead once `next` materialized.
      ls.queryExecution.analyzed.collectFirst { case r: LogicalRDD => r.rdd }
        .foreach(_.unpersist(blocking = false))
      edges = swap(next)
      rounds += 1
    } finally spark.conf.set(confKey, saved)
    val roots = edges.groupBy(col("v").as("id")).agg(min("u").as("root"))
    val labels = nodes.join(roots, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
    nodes.unpersist()
    (labels, rounds, converged)
  }
}
