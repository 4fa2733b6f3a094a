package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the stagecache prune's idle grace (round 17) — the disk-cache
  * twin of StreamRunsPruneSpec. spillThrough used to delete EVERY
  * other generation of a tag the moment a new one committed; a sibling
  * can be the same tag under a different plan FLAVOR a concurrently
  * used configuration still reads (observed: a 16-core Verify keyed
  * the persisted-upstream builds differently from the 32-core bench —
  * an InMemoryRelation leaf canonicalizes with its physical plan,
  * which embeds the shuffle-partition count — and the graceless prune
  * destroyed the 32-flavor artifacts behind the next record bench).
  * Now only generations idle past the 24 h staged grace are reclaimed
  * (NOT the 2 h scratch grace — alternating configurations routinely
  * run more than 2 h apart, round 18 per ADVICE), and hits touch
  * mtime so an in-use generation never ages out.
  */
class StagedPruneGraceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a committing generation reclaims idle siblings, keeps fresh ones") {
    import org.apache.spark.sql.functions._
    val tag = s"prunegrace${System.nanoTime() % 1000000}"
    val parent = new java.io.File(
      s"${graft.pipeline.Staged.cacheRoot}/${new java.io.File(sf).getName}")
    parent.mkdirs()
    def plant(name: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(parent, name)
      d.mkdirs()
      d.setLastModified(System.currentTimeMillis() - ageMs)
      d
    }
    // Same generation-name shape as real entries: tag-<planFp>-<dataFp>.
    val stale = plant(s"$tag-111111-aaaaaaaaaaaaaaaa", 25L * 3600 * 1000)
    val spaced = plant(s"$tag-333333-cccccccccccccccc", 3L * 3600 * 1000)
    val fresh = plant(s"$tag-222222-bbbbbbbbbbbbbbbb", 60 * 1000)
    try {
      val out = graft.pipeline.Staged.disk(spark, sf, tag) {
        spark.read.parquet(s"$sf/region.parquet").select(col("r_regionkey"))
      }
      assert(out.count() > 0)
      assert(!stale.exists(),
        "a 25 h-idle stale generation survived the stagecache prune")
      assert(spaced.exists(),
        "a 3 h-idle sibling generation was pruned — plan flavors used " +
          "by configurations alternating more than 2 h apart must " +
          "survive (the prune must use the 24 h staged grace)")
      assert(fresh.exists(),
        "a fresh (1 min-idle) sibling generation was pruned — another " +
          "plan flavor in concurrent use must survive a new commit")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      // The unique per-run tag is never read again in this JVM, so
      // removing its directories leaves no dangling consumer.
      Option(parent.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(tag)).foreach(rm)
    }
  }
}
