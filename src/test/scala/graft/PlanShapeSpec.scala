package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape of the round-6 scale operators: the claims the
  * Scaladocs make ("broadcast ADC lookup", "equi-join rounds, never a
  * cross product") asserted against the executed plans, so a future
  * refactor that silently degrades one to a shuffle or a cartesian
  * fails here instead of at 100 TB.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("join_star_schema: four broadcast joins, no shuffle before the agg") {
    val df = SparkEntry.queries("join_star_schema")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj == 4, s"expected all 4 dim joins broadcast, got $bhj")
    // The only exchanges allowed: the broadcasts themselves and the
    // final 30-row aggregate/sort — never a fact-side shuffle join.
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "a dim join degraded to a sort-merge join")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "a dim join degraded to a shuffled hash join")
  }

  test("graph_hits top-20s plan as TakeOrdered, never a global rank window") {
    val df = SparkEntry.queries("graph_hits")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val tops = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec])
    assert(tops == 2, s"expected 2 per-role TakeOrdered, got $tops")
    // The only window allowed is the bounded <=40-row rank labeler:
    // a WindowExec whose child is a node-dimension table would mean
    // the top-20 regressed to a global rank sort.
    val wins = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(wins <= 1, s"unexpected extra windows: $wins")
  }

  test("sim_ann_multiprobe keeps the probe expansion on the broadcast side") {
    val df = SparkEntry.queries("sim_ann_multiprobe")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "bucket-probe join must be a broadcast hash join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "multi-probe must never plan a cartesian product")
  }

  test("sim_ann_pq scores codes against a BROADCAST lookup table") {
    val df = SparkEntry.queries("sim_ann_pq")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "ADC lookup join must be a broadcast hash join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "PQ scoring must never plan a cartesian product")
  }

  test("graph_pagerank rounds are equi-joins, never cross products") {
    val df = SparkEntry.queries("graph_pagerank")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "rank propagation must never plan a cartesian product")
    // Every node keeps at least the teleport mass; total nodes = parts
    // that ship + suppliers (disjoint id spaces).
    assert(rows.forall(_.getLong(1) >= 150000L),
      "every rank must carry at least the teleport term")
  }

  test("join_null_aware_anti plans the single-key NAAJ, not a nested loop") {
    val df = SparkEntry.queries("join_null_aware_anti")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists {
      case b: BroadcastHashJoinExec => b.isNullAwareAntiJoin
      case _ => false
    }, "NOT IN must plan as a null-aware broadcast anti join")
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "NOT IN must not degrade to a broadcast nested loop")
  }

  test("sql_lateral_join decorrelates to rank pruning, not a per-row loop") {
    val df = SparkEntry.queries("sql_lateral_join")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    // The correlated ORDER BY/LIMIT subquery must become the window
    // top-k plan: WindowGroupLimit prunes each partition to k rows
    // BEFORE the exchange (the thing that makes LATERAL survive a
    // 100 TB probe side), joined back with a hash join — never a
    // nested-loop re-execution per outer row.
    assert(nodes.exists(_.getClass.getSimpleName == "WindowGroupLimitExec"),
      "correlated LIMIT must plan WindowGroupLimit rank pruning")
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "lateral must decorrelate to an equi join")
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) &&
      !nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "lateral must not plan a per-row nested loop")
  }

  test("layout_global_index keeps the data-path window shard-partitioned") {
    val df = SparkEntry.queries("layout_global_index")(spark, sf)
    assert(df.collect().length > 0)
    val wins = PlanFlatten.flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    // The idx-assigning window must partition by shard; the only
    // unpartitioned window allowed is the 33-row offsets cumulative.
    val idxWins = wins.filter(_.windowExpression.exists(
      _.exists { case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        a.name == "idx" || a.name.startsWith("row_number")
      case _ => false }))
    assert(wins.nonEmpty, "expected window operators in the plan")
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      "only the driver-sized offsets cumulative may be unpartitioned")
    assert(idxWins.forall(_.partitionSpec.nonEmpty),
      "the per-row index window must be partitioned by shard")
  }

  test("agg_decile_lift: every data-path window is shard-partitioned") {
    // The round-10 flaw (three corpus-global unpartitioned windows)
    // pinned over the whole producing pipeline: the only partition-less
    // window allowed are DistributedRank's driver-sized shard-offset
    // cumulatives, recognizable by the helper's __gr_shard_* marker in
    // their child output; the ordinal windows must partition by shard.
    // r18: the query eager-checkpoints its 10-row decile table, so the
    // rank windows live BEHIND a LogicalRDD leaf of the final physical
    // plan — the pin re-walks the Lineage-recorded producing plans
    // (the same adversarial resolution BoundedWalk uses) and judges
    // the LOGICAL Window operators found there, plus any physical
    // WindowExec still in the plan. (partitionSpec nonEmpty, child
    // output names) carry over 1:1 between the two forms.
    val df = SparkEntry.queries("agg_decile_lift")(spark, sf)
    assert(df.collect().nonEmpty)
    val phys = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val physWins = phys
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec =>
        (w.partitionSpec.nonEmpty, w.child.output.map(_.name),
          w.windowExpression.toString) }
    def logicalWins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Seq[(Boolean, Seq[String], String)] = {
      val here = p.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          (w.partitionSpec.nonEmpty, w.child.output.map(_.name),
            w.windowExpressions.toString)
      }
      val nested = p.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          graft.pipeline.Lineage.planFor(l.rdd.id).toSeq.flatMap(logicalWins)
        case c: graft.pipeline.CheckpointRef =>
          graft.pipeline.Lineage.planFor(c.rddId).toSeq.flatMap(logicalWins)
      }.flatten
      here ++ nested
    }
    val ckptWins = phys.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec =>
        graft.pipeline.Lineage.planFor(r.rdd.id).toSeq.flatMap(logicalWins)
    }.flatten
    val wins = physWins ++ ckptWins
    assert(wins.nonEmpty, "expected window operators in the (recorded) plan")
    wins.filter(!_._1).foreach { case (_, childNames, exprStr) =>
      assert(childNames.exists(_.startsWith("__gr_shard_")),
        s"non-offsets global window found: $exprStr")
    }
    assert(wins.exists(_._1),
      "the ordinal windows must be shard-partitioned")
  }

  test("win_rfm_scoring: every data-path window is shard-partitioned") {
    val df = SparkEntry.queries("win_rfm_scoring")(spark, sf)
    assert(df.collect().nonEmpty)
    val wins = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.output.exists(_.name.startsWith("__gr_shard_")),
        s"non-offsets global window found: ${w.windowExpression}")
    }
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "the ordinal windows must be shard-partitioned")
  }

  test("agg_zscore_standardize broadcasts the stats back, no second fact shuffle") {
    val df = SparkEntry.queries("agg_zscore_standardize")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "per-group stats must rejoin the fact via broadcast")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("hybrid retrieval stage 1 is a term equi-join, never a cross product") {
    val df = SparkEntry.queries("sim_hybrid_retrieval")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "lexical scoring must join on the term key, not fan out all pairs")
  }

  test("hybrid retrieval and RRF fusion read ONE shared lexical top-30 artifact") {
    // The lexical first stage is query-independent and both consumers
    // rank a prefix of the same panel ranking — the round-13 trim
    // staged it once (Similarity.lexTop30). This pin fails if either
    // consumer regresses to rebuilding the posting join inline, which
    // would silently re-pay the corpus-side scoring per run.
    def scansLexTop30(name: String): Boolean = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan).exists {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location.rootPaths.exists(_.toString.contains("lex_top30"))
        case _ => false
      }
    }
    assert(scansLexTop30("sim_hybrid_retrieval"),
      "hybrid stage 1 must read the staged lex_top30 artifact")
    assert(scansLexTop30("sim_rrf_fusion"),
      "the RRF lexical arm must read the staged lex_top30 artifact")
  }

  test("temporal SCD2 join keys on the entity, interval as join filter") {
    val df = SparkEntry.queries("join_temporal_scd2")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "point-in-interval must ride the user_id equi-key")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "a BNL here means the equi-key was lost and the dim side exploded")
  }

  test("NSW NN-descent build round: any cross-shaped join has a 1-row side") {
    // The round-8 fix for the last corpus-quadratic stage: the index
    // build must propose candidates from neighbors-of-neighbors
    // equi-joins, never an all-pairs product. The only nested-loop
    // joins allowed are the 1-row max(vec_id) broadcasts; a future
    // regression to crossJoin(e, e) puts corpus-sized rows on both
    // sides and fails here.
    val df = graft.queries.Similarity.nswBuildRoundForSpec(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "NN-descent must never plan a cartesian product")
    nodes.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.foreach { b =>
      val sideRows = b.children.map { c =>
        PlanFlatten.flatten(c)
          .flatMap(_.metrics.get("numOutputRows").map(_.value))
          .headOption.getOrElse(0L)
      }
      assert(sideRows.min <= 1,
        s"nested-loop join with side rows $sideRows: all-pairs regression")
    }
  }

  test("sim_graph_route beam search plans equi-joins only") {
    val df = SparkEntry.queries("sim_graph_route")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "routing must expand the frontier by equi-join, never a product")
  }

  test("text_pmi_collocations: bounded shuffles, no cartesian") {
    val df = SparkEntry.queries("text_pmi_collocations")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "PMI joins ride the word keys (1-row total is a broadcast)")
    val shuffles = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles <= 6,
      s"PMI grew to $shuffles shuffles — the one-corpus-shuffle plan regressed")
  }

  test("graph_bfs_distance relax rounds stay equi-joins") {
    val df = SparkEntry.queries("graph_bfs_distance")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "min-relax must join on edge dst, never a product")
  }

  test("pipeline_graph_edges plans no cartesian product") {
    val df = SparkEntry.queries("pipeline_graph_edges")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("dedup_chunk_exact stages the chunk stream: documents scanned at most once") {
    // The r9 double-scan: unstaged, the tokenize+chunk+md5 explode fed
    // both the freq aggregate and the join-back probe as two separate
    // documents.parquet scans. Staged (Staged.disk "chunk_fps"), the
    // final plan reads the staged artifact/cache and the raw documents
    // table appears at most once anywhere behind the cache boundary.
    val df = SparkEntry.queries("dedup_chunk_exact")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val docScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(docScans.size <= 1,
      s"chunk stream must be staged — found ${docScans.size} documents scans")
  }

  test("str_fuzzy_match candidates come from an equi join, never a cross product") {
    val df = SparkEntry.queries("str_fuzzy_match")(spark, sf)
    df.collect()
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]) &&
      !nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "deletion-neighborhood matching must stay an equi join")
  }

  test("web_robots_policy rule matching is a broadcast equi join, never a LIKE loop") {
    val df = SparkEntry.queries("web_robots_policy")(spark, sf)
    df.collect()
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "rule lookup must be a broadcast hash join on (group, prefix)")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]) &&
      !nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "rule matching must never degrade to a nested loop over the rules")
  }

  test("pipeline_snapshot_diff keys the full outer on doc_id, no cartesian") {
    val df = SparkEntry.queries("pipeline_snapshot_diff")(spark, sf)
    df.collect()
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]) &&
      !nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "snapshot diff must stay a keyed join")
  }

  test("scan_bucket_pruned reads a strict subset of the buckets") {
    val df = SparkEntry.queries("scan_bucket_pruned")(spark, sf)
    assert(df.collect().nonEmpty)
    val scans = PlanFlatten.flatten(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // The bucketed-table scan carries the pruned bucket set; 5 IN-list
    // literals hash into at most 5 of the 8 buckets.
    val pruned = scans.flatMap(_.optionalBucketSet).map(_.cardinality())
    assert(pruned.nonEmpty, "scan must carry a pruned bucket set")
    assert(pruned.head <= 5 && pruned.head < 8,
      s"expected <=5 of 8 buckets selected, got ${pruned.head}")
  }

  test("join_asof_nearest fuses both direction frames into ONE window pass") {
    // The backward and forward matches share (partition, ordering), so
    // Spark must plan a single WindowExec — a second window (or a
    // pairwise time-distance join) would double the sort cost the
    // operator exists to avoid. The only other sort in the plan is the
    // driver-compare ORDER BY.
    val df = SparkEntry.queries("join_asof_nearest")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    val wins = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(wins == 1, s"expected one fused window pass, found $wins")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "nearest asof must never plan a pairwise time join")
  }

  test("join_knn_classify broadcasts the bounded probe side") {
    // The intended shape IS a broadcast nested loop (the probe side is
    // the bounded 1-in-100 sample; every base row must be scored) —
    // what must never happen is a shuffled cartesian of the two sides.
    val df = SparkEntry.queries("join_knn_classify")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "probe scoring must broadcast the bounded probe side")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "probe scoring must never plan a shuffled cartesian")
  }

  test("sample_mixture_epochs attaches rates by broadcast, scan stays shuffle-free") {
    val df = SparkEntry.queries("sample_mixture_epochs")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the 5-row rate dim must attach via broadcast hash join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "the mixture plan must never plan a cartesian")
  }

  test("text_line_dedup stages the line stream: documents scanned at most once") {
    // Same discipline as dedup_chunk_exact: the line explode feeds both
    // the DF aggregate and the join-back probe, so it must come from
    // the one staged artifact, never two corpus scans.
    val df = SparkEntry.queries("text_line_dedup")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val docScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(docScans.size <= 1,
      s"line stream must be staged — found ${docScans.size} documents scans")
  }

  test("dedup_prefix_filter self-joins the STAGED prefix index: no documents rescan") {
    // The candidate join reads the prefix index on both sides; unstaged
    // it would re-run tokenize + explode + freq join twice. The staged
    // artifact means the executed plan reads parquet stage files, and
    // the only allowed documents scan is the (also staged) ngram_sets
    // build — i.e. zero direct documents scans in the final plan.
    val df = SparkEntry.queries("dedup_prefix_filter")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val docScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }
    assert(docScans.isEmpty,
      s"prefix join must read the staged index — found ${docScans.size} documents scans")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "prefix filtering must never plan a cartesian product")
  }

  test("sim_ann_binary stage-1 scan joins against BROADCAST query signatures") {
    val df = SparkEntry.queries("sim_ann_binary")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
      || nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the Hamming pass must broadcast the query side")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "the funnel must never plan a cartesian product")
  }

  test("pipeline_gdpr_erasure cascades via joins, never a cartesian") {
    val df = SparkEntry.queries("pipeline_gdpr_erasure")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 4)
    // The audit contract itself: nothing requested survives erasure.
    assert(rows.forall(_.getAs[Long]("leftover") == 0L),
      "leftover keys after erasure — the cascade is broken")
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "erasure must never plan a cartesian product")
  }

  test("sim_rrf_fusion's dense probe broadcast is a fixed limit-bounded panel") {
    // The round-12 flaw: the dense arm force-broadcast a 1-in-100
    // corpus SAMPLE as its query panel — a side that grows with the
    // corpus and OOMs at 100 TB. The panel is now a fixed 100-id eval
    // set; this pin asserts every c_id-keyed broadcast join (the
    // probe→inverted-list candidate join) builds from a subtree that
    // carries a literal LIMIT, so a future edit cannot quietly put an
    // unbounded side back on the broadcast.
    val df = SparkEntry.queries("sim_rrf_fusion")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    val cJoins = nodes.collect {
      case b: BroadcastHashJoinExec
          if (b.leftKeys ++ b.rightKeys)
            .exists(_.references.exists(_.name == "c_id")) => b
    }
    assert(cJoins.nonEmpty, "dense candidates must come from the c_id list join")
    cJoins.foreach { b =>
      val build = b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
        case _ => b.right
      }
      // The cap either appears inline (GlobalLimit/TakeOrdered in the
      // build subtree) or the build side reads the disk-staged
      // `ivf_qprobes` panel artifact — whose BUILDER
      // (Similarity.lexQueryTerms's dense counterpart) applies the
      // limit before anything is written; a scan of that artifact is a
      // scan of an already-capped ≤100·NProbe-row table.
      val flat = PlanFlatten.flattenThroughCache(build)
      val capped = flat.exists {
        case _: org.apache.spark.sql.execution.GlobalLimitExec => true
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
        case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
          sc.relation.location.rootPaths.exists(_.toString.contains("ivf_qprobes"))
        case _ => false
      }
      assert(capped,
        "the c_id-join broadcast side must be the LIMIT-capped probe panel " +
          "(inline limit or the staged ivf_qprobes artifact), " +
          "not a corpus-scaled sample")
    }
  }
}
