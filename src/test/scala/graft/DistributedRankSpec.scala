package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistributedRank

/** DistributedRank vs the single-partition windows it replaces: the
  * shard-offset ordinal must equal row_number() OVER (ORDER BY …) and
  * the positional reconstruction must equal ntile(k) — for BOTH parity
  * branches of ntile's definition (n divisible by k hides the uneven-
  * tile branch entirely; the sf0.01 corpus sizes are all divisible, so
  * without these cases the formula's ELSE arm would ship untested).
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Keys with heavy duplication (mod 7) so ties cross shard-width
    * boundaries; unique tiebreak totalizes.
    */
  private def sample(n: Int) =
    (1 to n).map(i => ((i * 31 % 7).toLong, i.toLong)).toDF("k", "id")

  test("withGlobalRank equals the global row_number, asc and desc") {
    for (desc <- Seq(false, true); n <- Seq(1, 7, 37, 100)) {
      val df = sample(n)
      val w = if (desc) Window.orderBy(col("k").desc, col("id"))
        else Window.orderBy(col("k").asc, col("id"))
      val expected = df.withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = DistributedRank
        .withGlobalRank(df, col("k"), col("id"), desc = desc, shards = 4, out = "rk")
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == expected, s"desc=$desc n=$n")
    }
  }

  test("ntileFromRank equals ntile(k) including uneven tiles") {
    for (n <- Seq(1, 3, 7, 10, 37, 101); k <- Seq(3, 5, 10)) {
      val df = sample(n)
      val expected = df
        .withColumn("t", ntile(k).over(
          Window.orderBy(col("k"), col("id"))).cast("long"))
        .select("id", "t").as[(Long, Long)].collect().toMap
      val got = DistributedRank
        .withGlobalRank(df, col("k"), col("id"), shards = 4, out = "rk")
        .withColumn("nn", lit(n.toLong))
        .withColumn("t", DistributedRank.ntileFromRank("rk", "nn", k))
        .select("id", "t").as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n k=$k")
    }
  }

  test("withGroupedRank equals per-group row_number, asc and desc") {
    // Group domain 3 (the layout-audit/RFM shape) with key magnitudes
    // differing 10^4 per group — exercises the PER-GROUP shard bounds
    // (shared bounds would clump the small-domain groups into one
    // shard) — and duplicated keys so ties cross shard boundaries
    // within every group.
    for (desc <- Seq(false, true); n <- Seq(1, 7, 37, 100)) {
      val df = (1 to n).map { i =>
        val g = i % 3
        val scale = math.pow(10000.0, g.toDouble).toLong
        (g.toLong, (i * 31 % 7).toLong * scale - 3 * scale, i.toLong)
      }.toDF("g", "k", "id")
      val w = if (desc) Window.partitionBy("g").orderBy(col("k").desc, col("id"))
        else Window.partitionBy("g").orderBy(col("k").asc, col("id"))
      val expected = df.withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = DistributedRank
        .withGroupedRank(df, col("g"), col("k"), col("id"),
          desc = desc, shards = 4, out = "rk")
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == expected, s"desc=$desc n=$n")
    }
  }

  test("withGlobalRank survives a key span past Long.MaxValue") {
    // The Scaladoc claims the DECIMAL(38,0) shard math cannot wrap on
    // the full long range (the r12 overflow directive): pin it with
    // keys AT Long.MinValue/Long.MaxValue plus spread values whose
    // span (max − min) overflows 64-bit subtraction. A naive long
    // `(k - mn) div w` here either throws under ANSI or shards rows
    // negatively and mis-ranks.
    val keys = Seq(Long.MinValue, Long.MinValue + 7, -3L, 0L, 11L,
      Long.MaxValue - 5, Long.MaxValue) ++
      (1 to 25).map(i => i.toLong * 712_345_678_901L - 4_000_000_000_000L)
    val df = keys.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    for (desc <- Seq(false, true)) {
      val w = if (desc) Window.orderBy(col("k").desc, col("id"))
        else Window.orderBy(col("k").asc, col("id"))
      val expected = df.withColumn("rk", row_number().over(w).cast("long"))
        .select("id", "rk").as[(Long, Long)].collect().toMap
      val got = DistributedRank
        .withGlobalRank(df, col("k"), col("id"), desc = desc,
          shards = 4, out = "rk")
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == expected, s"desc=$desc")
    }
  }

  test("withGlobalCumsum equals the inclusive running total, extremes included") {
    // First direct unit pin for the cumsum variant (previously only
    // query-level coverage): must equal sum(w) OVER (ORDER BY k, id
    // ROWS UNBOUNDED PRECEDING) exactly, including duplicated keys
    // crossing shard bounds AND a key span past Long.MaxValue (the
    // helper duplicates the DECIMAL(38,0) shard math, so the rank
    // test alone does not cover this copy).
    val base = (1 to 80).map(i =>
      ((i * 31 % 7).toLong, (i % 5 + 1).toLong, i.toLong))
    val extremes = Seq((Long.MinValue, 3L, 1000L), (Long.MaxValue, 2L, 1001L),
      (Long.MinValue + 11, 1L, 1002L), (Long.MaxValue - 4, 4L, 1003L))
    val df = (base ++ extremes).toDF("k", "w", "id")
    val w = Window.orderBy(col("k").asc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cs", sum(col("w")).over(w))
      .select("id", "cs").as[(Long, Long)].collect().toMap
    val got = DistributedRank
      .withGlobalCumsum(df, col("k"), col("id"), col("w"),
        shards = 4, out = "cs")
      .select("id", "cs").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("withGroupedRank totalOut carries each group's exact row count") {
    // The skipping-audit shape: the file-assignment ordinal needs the
    // group total next to the rank, and totalOut must equal count(*)
    // per group on every row — derived from the counts aggregate, not
    // a separate pass over the keyed input.
    val df = (1 to 100).map(i =>
        ((i % 3).toLong, (i * 31 % 7).toLong, i.toLong))
      .toDF("g", "k", "id")
    val expected = df.groupBy("g").count()
      .as[(Long, Long)].collect().toMap
    val out = DistributedRank.withGroupedRank(df, col("g"), col("k"),
      col("id"), shards = 4, out = "rk", totalOut = Some("n"))
    val rows = out.select(col("g"), col("n"), col("rk")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)),
        s"group ${r.getLong(0)}: total ${r.getLong(1)}")
    }
    // ranks still dense 1..n per group with the total attached
    val maxRk = out.groupBy("g").agg(max("rk").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(maxRk == expected)
  }

  test("withGroupedRank plans no partition-less window at all") {
    val df = DistributedRank.withGroupedRank(
      (1 to 100).map(i => ((i % 3).toLong, (i * 31 % 7).toLong, i.toLong))
        .toDF("g", "k", "id"),
      col("g"), col("k"), col("id"), shards = 4, out = "rk")
    df.collect()
    val wins = PlanFlatten.flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "grouped rank must partition even its offsets cumulative (by group)")
  }

  test("withGlobalLead equals lead(k) over the global order, across shard bounds") {
    // Distinct keys (the helper's contract) spread so shard boundaries
    // fall between successors, plus the full-long-range extremes (the
    // helper carries its own copy of the DECIMAL(38,0) shard math).
    // Sparse enough that SOME value-range shards are EMPTY — the
    // boundary lead() must skip them, not pair with a hole.
    val keys = Seq(Long.MinValue, Long.MinValue + 9, -5L, 2L, 3L, 17L,
      900L, 901L, Long.MaxValue - 2, Long.MaxValue) ++
      (1 to 20).map(i => i.toLong * 517_111L + 40_000L)
    val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "id")
    val expected = df
      .withColumn("nk", lead(col("k"), 1).over(Window.orderBy("k")))
      .select("k", "nk").as[(Long, Option[Long])].collect().toMap
    for (shards <- Seq(1, 4, 16)) {
      val got = DistributedRank
        .withGlobalLead(df, col("k"), shards = shards, out = "nk")
        .select("k", "nk").as[(Long, Option[Long])].collect().toMap
      assert(got == expected, s"shards=$shards")
    }
  }

  test("withGlobalLead plans no partition-less window over the data path") {
    val df = DistributedRank.withGlobalLead(
      (1 to 500).map(i => (i.toLong * 7, i.toLong)).toDF("k", "id"),
      col("k"), shards = 8, out = "nk")
    df.collect()
    val wins = PlanFlatten.flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    assert(wins.count(_.partitionSpec.isEmpty) <= 1,
      "only the <=shards-row boundary lead may be unpartitioned")
  }

  test("default shard count follows spark.sql.shuffle.partitions, clamped at 32") {
    // The helpers' own 100 TB claim: per-shard sort width must scale
    // with the cluster, so the derived default reads the session's
    // shuffle width (min-clamped to 32 so a narrow local session never
    // under-shards) and an explicit positive count still wins.
    val df = sample(10)
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      assert(DistributedRank.defaultShards(df) == 128)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      assert(DistributedRank.defaultShards(df) == 32)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("persistScoped eviction stays observable and bounded") {
    // The FIFO's serial-query invariant (DistributedRank.scala): many
    // sequential invocations must never hold more than the window's 8
    // live persists — a future parallel-bench change that breaks the
    // invariant shows up here as an unbounded count.
    (1 to 12).foreach { i =>
      DistributedRank.withGlobalRank(sample(5), col("k"), col("id"),
        shards = 2, out = s"rk$i").count()
    }
    assert(DistributedRank.livePersistCount <= 8,
      s"persist FIFO leaked: ${DistributedRank.livePersistCount} live")
  }

  test("withGroupedRank rejects output-column collisions at the call") {
    val df = sample(10).withColumn("n", lit(1L))
    intercept[IllegalArgumentException] {
      DistributedRank.withGroupedRank(df, col("k"), col("k"), col("id"),
        out = "id")
    }
    intercept[IllegalArgumentException] {
      DistributedRank.withGroupedRank(df, col("k"), col("k"), col("id"),
        out = "rk", totalOut = Some("n"))
    }
    intercept[IllegalArgumentException] {
      DistributedRank.withGroupedRank(df, col("k"), col("k"), col("id"),
        out = "rk", totalOut = Some("rk"))
    }
    // The global variants carry the same contract — a silent
    // withColumn overwrite of a caller column is data loss.
    intercept[IllegalArgumentException] {
      DistributedRank.withGlobalRank(df, col("k"), col("id"), out = "id")
    }
    intercept[IllegalArgumentException] {
      DistributedRank.withGlobalCumsum(df, col("k"), col("id"), col("n"),
        out = "n")
    }
  }

  test("within-shard window partitions by shard; only the offsets cumulative is global") {
    val df = DistributedRank.withGlobalRank(
      sample(100), col("k"), col("id"), shards = 4, out = "rk")
    df.collect()
    val wins = PlanFlatten.flatten(df.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      "only the driver-sized offsets cumulative may be unpartitioned")
  }
}
