package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamRuns

/** Pins the staged-generation prune's idle grace (round 17). The old
  * prune deleted EVERY other generation of a (tag, kind) the moment a
  * new one committed — including other SCALE DIRS' trees, whose data
  * fingerprint differs by construction — so each sf0.01 verify run
  * destroyed the sf0.1 staged trees and the next bench re-staged them
  * cold inside its first-touch stream queries (the r16 record-spike
  * mechanism), and a concurrent JVM still streaming from an older
  * generation could have its source deleted mid-stream. The prune now
  * only reclaims generations idle past the 24 h STAGED-dir grace —
  * the same one sweepAged gives `staged-` dirs, NOT the 2 h scratch
  * grace: runs are routinely spaced more than 2 h apart, and a
  * 2 h-graced sibling prune would re-destroy the other scale dir's
  * tree on every such session (round 18, per ADVICE). Reuse touches
  * mtime, so live trees never age out.
  */
class StreamRunsPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plant(name: String, ageMs: Long): java.io.File = {
    val d = new java.io.File(StreamRuns.scratchRoot, name)
    d.mkdirs()
    val ok = new java.io.File(d, "_SUCCESS")
    java.nio.file.Files.write(ok.toPath, Array.emptyByteArray)
    d.setLastModified(System.currentTimeMillis() - ageMs)
    d
  }

  test("committing a generation prunes only idle siblings, keeps fresh ones") {
    import org.apache.spark.sql.functions._
    // Unique tag per JVM run so leftover state can never make this
    // vacuous; the planted names copy the real generation shape
    // (tag-kind-planFp-dataFp) so the prefix filter matches them.
    val tag = s"prunespec${System.nanoTime() % 1000000}"
    val stale = plant(s"staged-$tag-2-11111111-aaaaaaaaaaaaaaaa",
      25L * 3600 * 1000) // idle 25 h — past the 24 h staged grace
    val spaced = plant(s"staged-$tag-2-33333333-cccccccccccccccc",
      3L * 3600 * 1000) // idle 3 h — runs spaced past the 2 h scratch
                        // grace; MUST survive (the ADVICE r18 gap)
    val fresh = plant(s"staged-$tag-2-22222222-bbbbbbbbbbbbbbbb",
      60 * 1000) // idle 1 min — e.g. another scale dir's live tree
    try {
      // Force a MISS for this tag: no generation with this plan/data
      // fingerprint exists, so stageAsFiles writes one and runs the
      // prune for the tag.
      val df = spark.read.parquet(s"$sf/region.parquet").select(col("r_regionkey"))
      val out = StreamRuns.stageAsFiles(df, tag, 2, sf)
      assert(new java.io.File(out, "_SUCCESS").exists())
      assert(!stale.exists(),
        "a 25 h-idle stale generation survived the prune")
      assert(spaced.exists(),
        "a 3 h-idle sibling generation was pruned — runs spaced past " +
          "the 2 h scratch grace must keep their cross-scale-dir " +
          "trees (the sibling prune must use the 24 h staged grace)")
      assert(fresh.exists(),
        "a fresh (1 min-idle) sibling generation was pruned — " +
          "cross-scale-dir trees and concurrently-streamed sources " +
          "must survive a new commit (the r16 record-spike mechanism)")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      Option(new java.io.File(StreamRuns.scratchRoot).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.contains(tag)).foreach(rm)
    }
  }
}
