package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The streaming scratch lifecycle that round 12's sweep made
  * dangerous: [[StreamRuns.stageAsFiles]] memoizes staged source
  * directories for the JVM's lifetime while an age-based sweep (this
  * JVM's or a concurrent one's) may delete scratch directories. The
  * contract pinned here:
  *
  *  - a memoized entry whose directory has been deleted externally is
  *    detected and RE-STAGED (no dead-path serves);
  *  - an intact entry is reused (no duplicate staging) and its mtime
  *    is refreshed on reuse, so the sweep's idle-time grace period
  *    never reclaims a live source;
  *  - staged sources carry the sweep-exempt `staged-` prefix.
  */
class StreamScratchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def df = {
    import spark.implicits._
    (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("stageAsFiles re-stages when the memoized directory was swept away") {
    val d1 = StreamRuns.stageAsFiles(df, "scratchspec", 2, sfDir)
    assert(new java.io.File(d1, "_SUCCESS").exists())
    assert(new java.io.File(d1).getName.startsWith("staged-"),
      "staged sources must carry the sweep-exempt prefix")

    // Intact entry: reused, not re-staged.
    val d2 = StreamRuns.stageAsFiles(df, "scratchspec", 2, sfDir)
    assert(d2 === d1, "an intact staged source must be reused")

    // mtime refresh on reuse: age the dir artificially, touch via reuse.
    val dir = new java.io.File(d1)
    assert(dir.setLastModified(System.currentTimeMillis() - 3L * 3600 * 1000))
    StreamRuns.stageAsFiles(df, "scratchspec", 2, sfDir)
    assert(System.currentTimeMillis() - dir.lastModified() < 600000L,
      "reuse must refresh the staged dir's mtime so sweeps measure idle time")

    // External deletion (a sweep from another JVM): the cache must not
    // serve the dead path.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
    assert(!dir.exists())
    val d3 = StreamRuns.stageAsFiles(df, "scratchspec", 2, sfDir)
    assert(new java.io.File(d3, "_SUCCESS").exists(),
      "a swept staged source must be re-staged, not served dead")
    // The re-staged copy must actually be readable.
    assert(spark.read.parquet(d3).count() === 50L)
    // Cross-JVM determinism: the generation name is a pure function of
    // (tag, files, plan fingerprint, input-data fingerprint), so the
    // re-staged copy lands at the SAME path a fresh JVM would probe —
    // that is what lets the driver's bench reuse the builder's copies.
    assert(d3 === d1,
      "re-staging must reproduce the deterministic generation path")
  }
}
