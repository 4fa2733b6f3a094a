package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reproducibility under re-partitioning — the 100 TB portability
  * claim behind every "fold-order-free / engine-exact" Scaladoc in the
  * inventory: the same query must produce byte-identical results
  * whether the shuffle fans out over 3 partitions or 7 (a cluster
  * resize, AQE coalesce, or spot-loss re-plan must never change an
  * answer). Each probe query was chosen because its family is the one
  * that BREAKS under naive spellings: double aggregation (fold order),
  * window ties (underspecified order), iterative integer graph rounds,
  * quantized LM scores, and array-shipped sketch synopses.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val probes = Seq(
    "agg_hash_group",     // DECIMAL sums: fold-order-free by construction
    "win_rank_dedup",     // window with tie-broken total order
    "graph_pagerank",     // iterative integer rounds
    "text_lm_score",      // integer-ppm quantized probabilities
    "agg_kmv_sketch",     // array synopsis + floor-div estimators
    "sim_bitext_margin",  // quantized-int margin normalizers (round 9)
    "web_url_canonical",  // canonical-key keep-first aggregate (round 9)
    "dedup_band_sweep",          // per-config bucket self-joins (round 10)
    "text_perplexity_buckets",   // ntile over tie-broken total order (round 10)
    "multimodal_vad_segments",   // RMS doubles from exact-int sums (round 10)
    "multimodal_aspect_bucket",  // in-row integer argmin (round 10)
    "text_line_dedup",           // staged explode + DF join-back (round 10)
    "profile_token_budget",      // broadcast-total ppm shares (round 10)
    "web_path_template",         // partial-distinct template agg (round 10)
    "multimodal_phash_clusters", // iterative CC over banded pairs (round 10)
    "graph_label_propagation",   // tie-broken sync LPA rounds (round 10)
    "win_seasonal_baseline",     // integer seasonal-threshold flags (round 10)
    "text_canary_scan",          // broadcast-needle containment scan (round 10)
    "agg_ols_trend",             // decimal-exact regression sums (round 10)
    "join_asof_nearest",         // two-frame single-sort nearest asof (round 10)
    "win_rolling_median7",       // selected-element rolling median (round 10)
    "sample_split_exact",        // rank-threshold exact quotas (round 10)
    "win_collapse_runs",         // gaps-and-islands run encoding (round 10)
    "agg_weighted_median",       // decimal cumulative-weight selection (round 10)
    "sim_cluster_purity",        // argmax purity over staged IVF lists (round 10)
    "dedup_prefix_filter",       // freq-ordered prefix index + integer gate (round 10)
    "agg_chi2_independence",     // rx-then-decimal-window-sum statistic (round 10)
    "win_kaplan_meier",          // in-order factor fold over sorted steps (round 10)
    "agg_moments_skew_kurt",     // decimal power sums -> IEEE tree (round 10)
    "win_theil_sen",             // positional median of pair slopes (round 10)
    "agg_ks_test",               // integer D numerator + squared gate (round 10)
    "win_markov_transitions",    // (ts, event_id)-totalized lag pairs (round 10)
    "win_rfm_scoring",           // ntile quintiles under total orders (round 10)
    "sim_ann_binary",            // sign-bit sigs + integer Hamming funnel (round 10)
    "dedup_lcp_adjacent",        // blocked SNM lag + native LCP kernel (round 10)
    "sample_dedup_weighted",     // window-count cluster size over pk (round 16)
    "str_fuzzy_match",           // grouped deletion index: collect_set order must not leak (round 16)
    "pipeline_batch_envelope")   // string-prefix-keyed global rank ordinals (round 16)

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  for (name <- probes)
    test(s"$name is invariant under shuffle-partition count") {
      val conf = "spark.sql.shuffle.partitions"
      val saved = spark.conf.get(conf)
      try {
        spark.conf.set(conf, "3")
        val narrow = rows(name)
        spark.conf.set(conf, "7")
        val wide = rows(name)
        assert(narrow === wide,
          s"$name changed results when shuffle width changed 3 -> 7")
        assert(narrow.nonEmpty, s"$name returned no rows")
      } finally spark.conf.set(conf, saved)
    }

  // The deployment-aware claim itself: DistributedRank derives its
  // shard count from `spark.sql.shuffle.partitions` (min-clamped to
  // 32), so re-sizing the session's shuffle width for a cluster must
  // (a) actually change the planned shard width on the helper's two
  // heaviest consumers and (b) never change their results — the rank
  // is exact at any shard layout.
  for (name <- Seq("layout_global_index", "text_vocab_coverage_curve"))
    test(s"$name follows the session shard conf and is stable at 8 vs 64") {
      val conf = "spark.sql.shuffle.partitions"
      val saved = spark.conf.get(conf)
      try {
        // The shard count appears as the width divisor in the bounds
        // aggregate: `… / cast(N as decimal…` in the analyzed plan.
        def divisor(n: Int) = s"/ cast($n as decimal"
        spark.conf.set(conf, "8")
        val at8 = rows(name)
        // 8 min-clamps to 32 shards: per-shard sorts must never drop
        // below the local default just because a test narrowed the
        // shuffle width.
        val plan8 = SparkEntry.queries(name)(spark, sf)
          .queryExecution.analyzed.toString
        assert(plan8.contains(divisor(32)) && !plan8.contains(divisor(64)),
          s"$name at partitions=8 did not clamp to 32 shards")
        spark.conf.set(conf, "64")
        val at64 = rows(name)
        val plan64 = SparkEntry.queries(name)(spark, sf)
          .queryExecution.analyzed.toString
        assert(plan64.contains(divisor(64)),
          s"$name at partitions=64 did not derive 64 shards")
        assert(at8 === at64,
          s"$name changed results when shard count changed 32 -> 64")
        assert(at8.nonEmpty, s"$name returned no rows")
      } finally spark.conf.set(conf, saved)
    }
}
