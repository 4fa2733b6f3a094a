package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staged-artifact layer is load-bearing (≈50 cross-JVM parquet
  * artifacts feed the bench), and its known trap is a SILENT STALE
  * SERVE: `Staged.diskKeyed` artifacts are keyed on the DECLARATIVE
  * seed plan, so editing a build's logic without changing its seed
  * plan (or its tag) keeps serving the old parquet. This spec pins the
  * two properties that make the cache self-invalidating where it can
  * be, so the remaining discipline ("fold non-plan parameters into the
  * tag") is the only thing left to remember:
  *
  *  1. the plan fingerprint moves when ANY part of the declarative
  *     plan moves (literal, column set, input path) and is stable
  *     across re-derivations of the same plan — the property the
  *     cross-JVM key depends on;
  *  2. `spillThrough` REBUILDS when the seed plan changes and serves
  *     the committed artifact without re-running the build when it
  *     does not; stale generations are reclaimed only once IDLE past
  *     the prune grace (r17) — a fresh sibling may be another plan
  *     flavor a concurrently-used configuration still reads (see
  *     StagedPruneGraceSpec for the grace's own planted test).
  */
class StagedInvalidationSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    Staged.planFingerprint(df.queryExecution.logical)

  test("plan fingerprint moves with the seed plan and is stable across re-derivations") {
    val base = spark.read.parquet(s"$sf/region.parquet")
    val a = base.filter(col("r_regionkey") > 0).select("r_name")
    // Same plan, derived twice: the fingerprint must not depend on
    // expression ids or object identity (the semanticHash failure mode
    // that made every JVM a cache miss).
    val a2 = spark.read.parquet(s"$sf/region.parquet")
      .filter(col("r_regionkey") > 0).select("r_name")
    assert(fp(a) === fp(a2))
    // A perturbed literal — the smallest logic edit — must move it.
    assert(fp(a) !== fp(base.filter(col("r_regionkey") > 1).select("r_name")))
    // A different projection must move it.
    assert(fp(a) !== fp(base.filter(col("r_regionkey") > 0).select("r_regionkey")))
  }

  test("spillThrough rebuilds on a perturbed seed plan; prunes only idle generations") {
    val tmp = java.nio.file.Files.createTempDirectory("stagecache-inv").toString
    System.setProperty("graft.stagecache.dir", tmp)
    try {
      val tag = "inv_probe"
      val parent = new java.io.File(s"$tmp/${new java.io.File(sf).getName}")
      def entries() = Option(parent.listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.startsWith(s"$tag-")).toSeq.sorted
      val seedA = spark.read.parquet(s"$sf/region.parquet")
        .filter(col("r_regionkey") > 0)
      var builds = 0
      def run(seed: org.apache.spark.sql.DataFrame): Long =
        Staged.spillThrough(spark, sf, tag)(seed) { builds += 1; seed }.count()

      val n1 = run(seedA)
      assert(builds === 1 && entries().size === 1)
      val gen1 = entries().head

      // Same seed plan again: committed artifact served, no rebuild.
      assert(run(seedA) === n1)
      assert(builds === 1, "unchanged seed plan must serve the committed artifact")
      assert(entries() === Seq(gen1))

      // Perturbed seed plan (the logic edit): new key, rebuild. The
      // previous generation is FRESH (seconds idle), so the graced
      // prune must keep it — it could be another configuration's live
      // flavor (the r17 16-vs-32-core lesson).
      val seedB = spark.read.parquet(s"$sf/region.parquet")
        .filter(col("r_regionkey") > 1)
      run(seedB)
      assert(builds === 2, "a changed seed plan must invalidate the cache key")
      val afterB = entries()
      assert(afterB.size === 2 && afterB.contains(gen1),
        "a fresh sibling generation must survive a new commit (prune grace)")
      val gen2 = afterB.filterNot(_ == gen1).head

      // Age the ORIGINAL generation past the grace and perturb again:
      // now it is reclaimable, while the still-fresh second one stays.
      new java.io.File(parent, gen1)
        .setLastModified(System.currentTimeMillis() - 25L * 3600 * 1000)
      val seedC = spark.read.parquet(s"$sf/region.parquet")
        .filter(col("r_regionkey") > 2)
      run(seedC)
      assert(builds === 3)
      val afterC = entries()
      assert(!afterC.contains(gen1),
        "an idle-past-grace stale generation must be reclaimed")
      assert(afterC.contains(gen2) && afterC.size === 2,
        "the fresh sibling must still survive")
    } finally {
      System.clearProperty("graft.stagecache.dir")
      ()
    }
  }
}
