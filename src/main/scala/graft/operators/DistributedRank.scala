package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordinals and quantile buckets over a total order
  * WITHOUT a partition-less window on the data path.
  *
  * `row_number()/ntile(k) OVER (ORDER BY …)` puts every row through ONE
  * window partition — the single-reducer sort that dies first at
  * 100 TB. This reproduces both, exactly, with the shard-offset
  * pattern (the layout_global_index plan, generalized):
  *
  *   1. one tiny min/max aggregate fixes the ordering key's range;
  *   2. rows shard deterministically by value into `shards` bounded
  *      ranges (equal keys always share a shard, so the within-shard
  *      sort is total once the tiebreak is appended);
  *   3. per-shard counts — map-side combined, ≤ `shards` rows —
  *      cumulate into shard offsets and broadcast back. The offsets
  *      cumulative is the only partition-less window, over the
  *      driver-sized shard table, never over data;
  *   4. ordinal = shard offset + rank within the shard.
  *
  * At 100 TB the shard count scales with the cluster — the default
  * derives from `spark.sql.shuffle.partitions` (min-clamped to 32,
  * see [[defaultShards]]), so sizing the session's shuffle width for
  * the cluster sizes the per-shard sorts with it; every heavy
  * operator here is per-shard. Value-range sharding is skew-exposed
  * when one key value dominates — but so is any rank over that order:
  * a rank among equal keys is tiebreak-arbitrary anyway, and the
  * callers here rank metrics (quality scores, recency, spend) whose
  * domains spread by construction.
  */
object DistributedRank {

  /** The helpers persist their keyed input (it is read three times per
    * invocation — see [[withGlobalRank]]); this bounded FIFO releases
    * those persists so a long-lived JVM (a 369-query bench, a service)
    * does not accumulate one MEMORY_AND_DISK copy per invocation for
    * its lifetime. Eviction is deferred, not immediate: unpersisting
    * when the caller's action completes is not observable from here.
    * SERIAL-QUERY INVARIANT: this window is safe because queries
    * execute one action at a time in this JVM (bench/verify both do)
    * and the deepest live nesting in the repo is three rank passes
    * feeding one action (win_rfm_scoring's fold,
    * layout_skipping_audit's union) — so the last-8 window only ever
    * evicts frames whose actions have finished. A future PARALLEL
    * bench breaks that premise: concurrent queries could push >8 live
    * persists and evictions would silently become recompute storms.
    * [[livePersistCount]] keeps the window observable (the spec pins
    * eviction), and an evicted frame that IS re-read just recomputes —
    * slower, never wrong.
    */
  private val MaxLivePersists = 8
  private val persisted = new java.util.ArrayDeque[DataFrame]()
  private def persistScoped(df: DataFrame): DataFrame = persisted.synchronized {
    val p = df.persist()
    persisted.addLast(p)
    while (persisted.size > MaxLivePersists) {
      val victim = persisted.removeFirst()
      // NonFatal only: an unpersist of a stopped-session frame is
      // ignorable bookkeeping, but an OOM/VM error must propagate —
      // the old catch-all Throwable could swallow those too.
      try victim.unpersist(false)
      catch {
        case scala.util.control.NonFatal(t) =>
          System.err.println(s"[rank] unpersist on eviction failed: ${t.getMessage}")
      }
    }
    p
  }

  /** Live entries in the persist FIFO — test observability for the
    * eviction window (never exceeds [[MaxLivePersists]]).
    */
  private[graft] def livePersistCount: Int =
    persisted.synchronized(persisted.size)

  /** Deployment-aware default shard count: `spark.sql.shuffle.partitions`
    * min-clamped to 32. The helpers' per-shard sorts put N/shards rows
    * through each task, so the shard count must scale WITH the cluster
    * — a constant 32 is right at local[32] but serializes a 1000-core
    * cluster's sort through 32 tasks. Every helper takes `shards = 0`
    * to mean "derive from the session conf"; an explicit positive
    * count still wins (tests pin exact shard layouts).
    */
  private[graft] def defaultShards(df: DataFrame): Int =
    math.max(32,
      try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case scala.util.control.NonFatal(_) => 32 })

  /** Adds column `out` = row_number() OVER (ORDER BY key [DESC], tie
    * ASC) as an exact 1-based global ordinal. `key` must cast
    * losslessly to long (callers with an rx-rounded double key lift it
    * onto its integer grid first); `tie` must totalize the order
    * within equal keys. The full long range is legal for the key: the
    * shard width and shard assignment compute their differences in
    * DECIMAL(38,0), so a key span past Long.MaxValue (e.g. full-range
    * hash keys) cannot wrap.
    *
    * The keyed input is persisted here: the helper reads it three
    * times (bounds aggregate, per-shard counts, final join), and
    * column pruning differentiates those subtrees enough that
    * exchange reuse alone re-ran corpus-scale inputs per reference
    * (the coverage-curve shingle aggregate paid its dominant scan 3×).
    */
  def withGlobalRank(df: DataFrame, key: Column, tie: Column,
      desc: Boolean = false, shards: Int = 0,
      out: String = "grk"): DataFrame = {
    // Same collision contract as withGroupedRank/withGlobalLead: a
    // pre-existing `out` column would be silently REPLACED by
    // withColumn — fail at the call instead.
    require(!df.columns.contains(out),
      s"withGlobalRank output column '$out' already exists in the input")
    val nShards = if (shards > 0) shards else defaultShards(df)
    val kc = s"__gr_key_$out"
    val sc = s"__gr_shard_$out"
    val oc = s"__gr_off_$out"
    val keyed = persistScoped(df.withColumn(kc, key.cast("long")))
    val bounds = keyed.agg(min(kc).as("__gr_mn"), max(kc).as("__gr_mx"))
      .select(col("__gr_mn"),
        // Width stays DECIMAL: `span div N` (IntegralDivide) returns
        // LONG and WRAPS when span/N exceeds Long.MaxValue (a full-long
        // key span with a small shard count made the width 0 — divide
        // by zero downstream). floor(span / N) + 1 in decimal is the
        // same value whenever div would not wrap, and never wraps.
        expr(s"CAST(floor((CAST(__gr_mx AS DECIMAL(38,0)) - __gr_mn)" +
          s" / $nShards) + 1 AS DECIMAL(38,0))").as("__gr_w"))
    val sharded = keyed.crossJoin(broadcast(bounds))
      .withColumn(sc,
        expr(s"(CAST($kc AS DECIMAL(38,0)) - __gr_mn) div __gr_w"))
      .drop("__gr_mn", "__gr_w")
    // Driver-sized (≤ shards+1 rows) cumulative — the one allowed
    // partition-less window; shard order mirrors the rank direction.
    val offW = Window
      .orderBy(if (desc) col(sc).desc else col(sc).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(sc).agg(count(lit(1)).as("__gr_c"))
      .withColumn(oc, coalesce(sum("__gr_c").over(offW), lit(0L)))
      .select(col(sc), col(oc))
    val ordW = Window.partitionBy(sc)
      .orderBy(if (desc) col(kc).desc else col(kc).asc, tie)
    sharded.join(broadcast(offsets), sc)
      .withColumn(out, (col(oc) + row_number().over(ordW)).cast("long"))
      .drop(kc, sc, oc)
  }

  /** Adds column `out` = row_number() OVER (PARTITION BY grp ORDER BY
    * key [DESC], tie ASC) — [[withGlobalRank]] for SEVERAL independent
    * total orders in one pass (one bounds aggregate, one counts
    * aggregate, one offset join for all groups instead of one rank
    * pipeline per group). Shard ranges are PER GROUP (the bounds
    * aggregate keys on the group — still one tiny broadcast table),
    * so every group spreads across all shards even when group key
    * domains differ by orders of magnitude (cents vs day counts) and
    * no group serializes through one reducer; the offsets cumulative
    * is partitioned by group over the (groups × shards)-row count
    * table. Intended for a SMALL group domain (layout variants,
    * metric names) — a corpus-scaled group column would make the
    * offsets table corpus-scaled.
    */
  /** `totalOut`: when set, also emits each group's TOTAL row count
    * under that column name — the per-shard counts aggregate already
    * holds every number needed (a whole-partition sum over the bounded
    * groups × shards table), so callers that scale the rank by the
    * group size (file-assignment ordinals: `((rk-1)*files) div n`)
    * avoid a separate count aggregate + join against the keyed input.
    */
  def withGroupedRank(df: DataFrame, grp: Column, key: Column,
      tie: Column, desc: Boolean = false, shards: Int = 0,
      out: String = "grk", totalOut: Option[String] = None): DataFrame = {
    // `out`/`totalOut` join back onto the caller's columns; a collision
    // would surface only as an ambiguous-column failure at the caller's
    // action — fail here, at the call, instead.
    require(!df.columns.contains(out),
      s"withGroupedRank: output column '$out' already exists in the input")
    totalOut.foreach { tc =>
      require(tc != out && !df.columns.contains(tc),
        s"withGroupedRank: total column '$tc' collides with an input column or '$out'")
    }
    val nShards = if (shards > 0) shards else defaultShards(df)
    val gc = s"__gr_grp_$out"
    val kc = s"__gr_key_$out"
    val sc = s"__gr_shard_$out"
    val oc = s"__gr_off_$out"
    val keyed = persistScoped(
      df.withColumn(gc, grp).withColumn(kc, key.cast("long")))
    val bounds = keyed.groupBy(gc)
      .agg(min(kc).as("__gr_mn"), max(kc).as("__gr_mx"))
      .select(col(gc), col("__gr_mn"),
        // Same DECIMAL width rationale as withGlobalRank.
        expr(s"CAST(floor((CAST(__gr_mx AS DECIMAL(38,0)) - __gr_mn)" +
          s" / $nShards) + 1 AS DECIMAL(38,0))").as("__gr_w"))
    val sharded = keyed.join(broadcast(bounds), Seq(gc))
      .withColumn(sc,
        expr(s"(CAST($kc AS DECIMAL(38,0)) - __gr_mn) div __gr_w"))
      .drop("__gr_mn", "__gr_w")
    // Group-partitioned (never partition-less) cumulative over the
    // bounded (groups × shards) count table; shard order mirrors the
    // rank direction.
    val offW = Window.partitionBy(gc)
      .orderBy(if (desc) col(sc).desc else col(sc).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val counts = sharded.groupBy(gc, sc).agg(count(lit(1)).as("__gr_c"))
    val offsets0 = counts
      .withColumn(oc, coalesce(sum("__gr_c").over(offW), lit(0L)))
    val offsets = totalOut.fold(offsets0) { tc =>
      offsets0.withColumn(tc,
        sum("__gr_c").over(Window.partitionBy(gc)))
    }.select(col(gc) +: col(sc) +: col(oc) +:
      totalOut.map(col).toSeq: _*)
    val ordW = Window.partitionBy(gc, sc)
      .orderBy(if (desc) col(kc).desc else col(kc).asc, tie)
    sharded.join(broadcast(offsets), Seq(gc, sc))
      .withColumn(out, (col(oc) + row_number().over(ordW)).cast("long"))
      .drop(gc, kc, sc, oc)
  }

  /** Adds column `out` = sum(weight) OVER (ORDER BY key, tie ROWS
    * UNBOUNDED PRECEDING) — an exact INCLUSIVE global running total,
    * same shard-offset shape as [[withGlobalRank]]: per-shard weight
    * sums cumulate into broadcast offsets (the only partition-less
    * window, over the driver-sized shard table), and the data-path
    * cumulative is partitioned by shard. `weight` must cast losslessly
    * to long.
    */
  def withGlobalCumsum(df: DataFrame, key: Column, tie: Column,
      weight: Column, shards: Int = 0,
      out: String = "gcs"): DataFrame = {
    // Same collision contract as withGroupedRank/withGlobalLead.
    require(!df.columns.contains(out),
      s"withGlobalCumsum output column '$out' already exists in the input")
    val nShards = if (shards > 0) shards else defaultShards(df)
    val kc = s"__gr_key_$out"
    val wc = s"__gr_wt_$out"
    val sc = s"__gr_shard_$out"
    val oc = s"__gr_off_$out"
    // Same triple-read and key-span rationale as withGlobalRank.
    val keyed = persistScoped(df.withColumn(kc, key.cast("long"))
      .withColumn(wc, weight.cast("long")))
    val bounds = keyed.agg(min(kc).as("__gr_mn"), max(kc).as("__gr_mx"))
      .select(col("__gr_mn"),
        // Width stays DECIMAL: `span div N` (IntegralDivide) returns
        // LONG and WRAPS when span/N exceeds Long.MaxValue (a full-long
        // key span with a small shard count made the width 0 — divide
        // by zero downstream). floor(span / N) + 1 in decimal is the
        // same value whenever div would not wrap, and never wraps.
        expr(s"CAST(floor((CAST(__gr_mx AS DECIMAL(38,0)) - __gr_mn)" +
          s" / $nShards) + 1 AS DECIMAL(38,0))").as("__gr_w"))
    val sharded = keyed.crossJoin(broadcast(bounds))
      .withColumn(sc,
        expr(s"(CAST($kc AS DECIMAL(38,0)) - __gr_mn) div __gr_w"))
      .drop("__gr_mn", "__gr_w")
    val offW = Window.orderBy(col(sc).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(sc).agg(sum(wc).as("__gr_c"))
      .withColumn(oc, coalesce(sum("__gr_c").over(offW), lit(0L)))
      .select(col(sc), col(oc))
    val ordW = Window.partitionBy(sc).orderBy(col(kc).asc, tie)
      .rowsBetween(Window.unboundedPreceding, 0)
    sharded.join(broadcast(offsets), sc)
      .withColumn(out, col(oc) + sum(wc).over(ordW))
      .drop(kc, wc, sc, oc)
  }

  /** Adds column `out` = lead(key) OVER (ORDER BY key) — each row's
    * global SUCCESSOR key in the total order, in ONE pass over the
    * shard layout. `key` values must be DISTINCT (callers dedup
    * first); the global maximum gets NULL, like lead().
    *
    * The naive distributed spelling is an ordinal self-join: rank
    * every row ([[withGlobalRank]] — itself three reads of the keyed
    * input), then join rk ↔ rk+1 — two more reads of the ranked frame.
    * This helper needs no ordinal at all: within a value-range shard,
    * `lead()` over the shard partition pairs successors directly; the
    * only cross-shard successors are each shard's MAX paired with the
    * next NONEMPTY shard's MIN, read off the ≤shards-row per-shard
    * bounds aggregate with a lead() over the driver-sized shard table
    * (the same "only partition-less window is over the shard table"
    * discipline as the rank offsets). One shard-partitioned sort, one
    * tiny aggregate, one broadcast join — at 100 TB every heavy
    * operator is per-shard, same as the rank.
    */
  def withGlobalLead(df: DataFrame, key: Column, shards: Int = 0,
      out: String = "glead"): DataFrame = {
    require(!df.columns.contains(out),
      s"withGlobalLead: output column '$out' already exists in the input")
    val nShards = if (shards > 0) shards else defaultShards(df)
    val kc = s"__gr_key_$out"
    val sc = s"__gr_shard_$out"
    // Same triple-read and full-long-range key-span rationale as
    // withGlobalRank (bounds aggregate, within-shard window, per-shard
    // edge aggregate all read the keyed frame).
    val keyed = persistScoped(df.withColumn(kc, key.cast("long")))
    val bounds = keyed.agg(min(kc).as("__gr_mn"), max(kc).as("__gr_mx"))
      .select(col("__gr_mn"),
        // Width stays DECIMAL: `span div N` (IntegralDivide) returns
        // LONG and WRAPS when span/N exceeds Long.MaxValue (a full-long
        // key span with a small shard count made the width 0 — divide
        // by zero downstream). floor(span / N) + 1 in decimal is the
        // same value whenever div would not wrap, and never wraps.
        expr(s"CAST(floor((CAST(__gr_mx AS DECIMAL(38,0)) - __gr_mn)" +
          s" / $nShards) + 1 AS DECIMAL(38,0))").as("__gr_w"))
    val sharded = keyed.crossJoin(broadcast(bounds))
      .withColumn(sc,
        expr(s"(CAST($kc AS DECIMAL(38,0)) - __gr_mn) div __gr_w"))
      .drop("__gr_mn", "__gr_w")
    // Next nonempty shard's minimum, per shard: empty shards have no
    // row here, so lead() skips them by construction. ≤ shards rows —
    // the one allowed partition-less window, over the shard table.
    val edges = sharded.groupBy(sc)
      .agg(min(kc).as("__gr_emn"))
      .withColumn("__gr_nxt",
        lead("__gr_emn", 1).over(Window.orderBy(col(sc).asc)))
      .select(col(sc), col("__gr_nxt"))
    // Within a shard lead() pairs successors; the shard's max row
    // (lead null) pairs with the next nonempty shard's min.
    val inW = Window.partitionBy(sc).orderBy(col(kc).asc)
    sharded
      .withColumn(out, lead(kc, 1).over(inW))
      .join(broadcast(edges), sc)
      .withColumn(out, coalesce(col(out), col("__gr_nxt")))
      .drop(kc, sc, "__gr_nxt")
  }

  /** ntile(k) reconstructed from an exact global ordinal: with n rows,
    * the first n mod k tiles take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the
    * positional definition Spark and DuckDB share, in pure integer
    * arithmetic (identical in both engines; all operands nonnegative,
    * so floor-vs-truncate division never diverges). `rank` and `n` are
    * column NAMES of the 1-based ordinal and the total row count.
    */
  def ntileFromRank(rank: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE
      WHEN $rank <= (($n div $k) + 1) * ($n % $k)
        THEN ($rank - 1) div (($n div $k) + 1) + 1
      ELSE ($n % $k)
        + ($rank - (($n div $k) + 1) * ($n % $k) - 1)
          div greatest($n div $k, 1) + 1
      END AS BIGINT)""")
}
