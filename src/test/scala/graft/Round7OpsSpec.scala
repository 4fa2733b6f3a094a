package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan shapes and data invariants of the round-7 selection / ER /
  * index operators: every scale claim a Scaladoc makes (binned
  * equi-joins, broadcast-back stats, lossless bitmaps, shard-composed
  * skylines) is asserted here against the executed plan or recomputed
  * brute-force, so a refactor that silently degrades one fails at test
  * time instead of at 100 TB.
  */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def noPairwiseBlowup(nodes: Seq[org.apache.spark.sql.execution.SparkPlan], what: String): Unit = {
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]) &&
      !nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"$what must stay an equi join, never a cross/nested-loop product")
  }

  test("sample_importance_dsir broadcasts the 128-bucket ratio table; keeps top 20% per language") {
    val df = SparkEntry.queries("sample_importance_dsir")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // The ratio join now lives inside the Staged(...) persist boundary
    // (round 8 staged the gram stream), so the pin must look through
    // InMemoryRelation.cachedPlan — the executed plan's own nodes only
    // show the table-cache scan.
    val nodes = PlanFlatten.flattenThroughCache(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "the bucket-ratio table must rejoin grams via broadcast")
    // The only non-equi join allowed is the broadcast of the ONE-ROW
    // totals onto the 128-row bucket table (a scalar attach); the
    // gram-side joins must never plan a cartesian product.
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "DSIR gram scoring must never plan a cartesian product")
    // keep == rank <= ceil(n_lang / 5), exactly.
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      val kept = rs.count(_.getBoolean(5))
      assert(kept == (n + 4) / 5, s"$lang kept $kept of $n, want ceil(n/5)")
    }
  }

  test("join_spatial_radius is a binned equi join; every match is within R") {
    val df = SparkEntry.queries("join_spatial_radius")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    noPairwiseBlowup(PlanFlatten.flatten(df.queryExecution.executedPlan),
      "grid-binned radius matching")
    assert(rows.forall(_.getLong(3) <= 100L * 100L),
      "d2_min must satisfy the exact radius predicate")
  }

  test("layout_bitmap_index is lossless: popcount co-occurrence equals exact distinct count") {
    val rows = SparkEntry.queries("layout_bitmap_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4),
        s"bitmap co_docs ${r.getLong(3)} != exact ${r.getLong(4)} for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("select_pareto_skyline equals the brute-force skyline (shard pre-filter is invisible)") {
    val df = SparkEntry.queries("select_pareto_skyline")(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // Brute-force reference: O(n^2) dominance per priority over the
    // exact (cents, epoch-day) coordinates the query uses.
    import org.apache.spark.sql.functions._
    import graft.queries.QDef
    import QDef.money
    val base = QDef.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        (money(col("o_totalprice")) * 100).cast("long").as("p"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = base.filter { case (_, pri, p, d) =>
      !base.exists { case (_, pri2, p2, d2) =>
        pri2 == pri && p2 >= p && d2 >= d && (p2 > p || d2 > d)
      }
    }.map(t => (t._1, t._2)).toSet
    assert(got == want, s"skyline mismatch: got ${got.size}, want ${want.size}")
  }

  test("graph_bipartite_cf: equi-join candidates, top-5 per target, jaccard bounded") {
    val df = SparkEntry.queries("graph_bipartite_cf")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    noPairwiseBlowup(PlanFlatten.flatten(df.queryExecution.executedPlan),
      "co-supply candidate generation")
    assert(rows.forall(_.getLong(1) <= 5L), "rk must be capped at 5")
    assert(rows.forall(r => r.getLong(6) >= 0L && r.getLong(6) <= 1000000L),
      "jaccard micros must lie in [0, 1e6]")
  }

  test("text_rake_keywords broadcasts word scores back onto occurrences") {
    val df = SparkEntry.queries("text_rake_keywords")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "vocabulary-sized word scores must rejoin via broadcast")
    noPairwiseBlowup(nodes, "RAKE scoring")
    assert(rows.forall(_.getLong(2) >= 1L), "every phrase occurs at least once")
  }

  test("join_record_linkage: blocking is equi-join only; match arm is exact-truth") {
    val df = SparkEntry.queries("join_record_linkage")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    noPairwiseBlowup(PlanFlatten.flatten(df.queryExecution.executedPlan),
      "multi-pass blocking")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_true cannot exceed n_pairs")
      if (r.getString(0) == "match")
        assert(r.getLong(2) == r.getLong(1),
          "the +40 name agreement only fires on true pairs here, so match precision must be 1.0")
    }
  }

  test("pipeline_curation_e2e: stage counts are monotone decreasing and every stage filters") {
    val rows = SparkEntry.queries("pipeline_curation_e2e")(spark, sf).collect()
    assert(rows.length == 5)
    val counts = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    counts.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"every funnel stage must filter: saw $a -> $b")
    }
  }

  test("sim_mips_topk: every augmented vector is unit norm, ranking follows raw dot") {
    val rows = SparkEntry.queries("sim_mips_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(5) - 1.0) < 1e-9,
      s"aug_norm must be exactly 1.0 after rounding, got ${r.getDouble(5)}"))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    }
  }

  test("sim_recall_graph_route: one row per query, recall consistent with hits") {
    val rows = SparkEntry.queries("sim_recall_graph_route")(spark, sf).collect()
    assert(rows.length == 10, "one audit row per query vector")
    rows.foreach { r =>
      val (hits, bp) = (r.getLong(1), r.getLong(2))
      assert(hits >= 0 && hits <= 3)
      assert(bp == hits * 10000 / 3, "recall_bp must be derived from n_hit")
    }
    // The tuned HNSW router (round 11: layered descent entry, beam 12,
    // keep 12) scores 0.80 at sf0.001 / 0.90 at sf0.01 — pin a floor
    // well above the round-10 scan-entry router's worst (0.53) so a
    // navigability regression in any layer's build fails here.
    val mean = rows.map(_.getLong(1)).sum / 10.0 / 3.0
    assert(mean >= 0.7, s"mean recall@3 regressed to $mean")
  }

  test("win_bollinger_bands: integer alert decision matches the displayed bands") {
    val rows = SparkEntry.queries("win_bollinger_bands")(spark, sf).collect()
    assert(rows.nonEmpty)
    val alerts = rows.count(_.getBoolean(6))
    assert(alerts > 0 && alerts < rows.length,
      "both alert arms must be populated")
    rows.foreach { r =>
      val (v, mean, sigma) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      val flagged = r.getBoolean(6)
      val margin = math.abs(v - mean) - 2 * sigma
      // Displayed values are rounded to 4 places; only assert when the
      // margin is clearly outside the rounding noise.
      if (math.abs(margin) > 1e-3)
        assert(flagged == margin > 0,
          s"alert=$flagged disagrees with |$v-$mean| vs 2*$sigma")
    }
  }

  test("sample_dsir_shift: selected beats the matched-rate random control, inverse loses") {
    val rows = SparkEntry.queries("sample_dsir_shift")(spark, sf).collect()
    assert(rows.length == 4)
    val tvd = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(tvd("a_selected") < tvd("b_random_ctl"),
      s"DSIR selection must beat a same-rate random control: $tvd")
    assert(tvd("b_random_ctl") < tvd("c_inverse"),
      s"anti-selection must be the worst arm: $tvd")
  }

  test("DQ pair: clean star schema profiles 100% match; uniform prices fail Benford") {
    val edges = SparkEntry.queries("profile_join_health")(spark, sf).collect()
    assert(edges.length == 3)
    edges.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 10000,
        s"synthetic FK edges are referentially clean: $r")
    }
    val benford = SparkEntry.queries("agg_benford_first_digit")(spark, sf).collect()
    assert(benford.nonEmpty)
    val l1 = benford.head.getLong(5)
    assert(l1 > 1000,
      s"uniform prices must deviate clearly from Benford, l1=$l1 bp")
    assert(benford.forall(_.getLong(5) == l1),
      "the L1 total must be the same scalar on every row")
  }

  test("agg_welch_ttest folds both halves in one scan of events, no join") {
    val df = SparkEntry.queries("agg_welch_ttest")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    val scans = nodes.collect { case f: FileSourceScanExec => f }
    assert(scans.size == 1,
      s"conditional aggregation must read events once, saw ${scans.size} scans")
    assert(!nodes.exists(_.getClass.getSimpleName.contains("Join")),
      "the two-sample fold must not plan any join")
    // n_a + n_b together cover every event of the type; both arms live.
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0),
      "mid-month cut must populate both halves at every SF")
  }
}
