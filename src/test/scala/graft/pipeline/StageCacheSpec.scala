package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The cross-JVM stage cache must key on the INPUT DATA, not just the
  * build plan: the driver regenerates /root/testdata in place between
  * rounds with byte-identical plans, and a plan-hash-only key would
  * silently serve staged parquet computed from the previous generation.
  */
class StageCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("in-place input rewrite invalidates the spill-through cache") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stagecache-in").toFile.getAbsolutePath
    val cacheDir = Files.createTempDirectory("stagecache-out").toFile.getAbsolutePath
    val prev = sys.props.get("graft.stagecache.dir")
    sys.props("graft.stagecache.dir") = cacheDir
    try {
      def build = spark.read.parquet(s"$dir/in.parquet")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))

      Seq(1L, 2L).toDF("v").write.mode("overwrite").parquet(s"$dir/in.parquet")
      val r1 = Staged.spillThrough(spark, dir, "t")(build)(build).collect()
      assert(r1.head.getLong(0) == 3L)

      // Same plan, same paths — only the data (and thus size/mtime)
      // changes. A plan-hash-only key would reread the stale artifact.
      Seq(10L, 20L, 30L).toDF("v").write.mode("overwrite").parquet(s"$dir/in.parquet")
      val r2 = Staged.spillThrough(spark, dir, "t")(build)(build).collect()
      assert(r2.head.getLong(0) == 60L,
        s"cache served stale generation: got ${r2.head.getLong(0)}, want 60")

      // Growth stays bounded WITHOUT destroying possibly-live siblings:
      // the fresh previous generation survives the new commit (it could
      // be another configuration's live flavor — the r17 prune grace,
      // pinned with both arms in StagedPruneGraceSpec), and is
      // reclaimed once idle past the grace — model that by aging it and
      // forcing the next rewrite's prune.
      val parent = new java.io.File(s"$cacheDir/${new java.io.File(dir).getName}")
      val afterRewrite = Option(parent.listFiles()).getOrElse(Array.empty)
      assert(afterRewrite.length == 2,
        s"expected old+new generations under the grace, got ${afterRewrite.length}")
      afterRewrite.foreach(
        _.setLastModified(System.currentTimeMillis() - 25L * 3600 * 1000))
      Seq(100L).toDF("v").write.mode("overwrite").parquet(s"$dir/in.parquet")
      val r3 = Staged.spillThrough(spark, dir, "t")(build)(build).collect()
      assert(r3.head.getLong(0) == 100L)
      val afterAged = Option(parent.listFiles()).getOrElse(Array.empty)
      assert(afterAged.length == 1,
        s"idle-past-grace generations must be reclaimed, got ${afterAged.length}")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stagecache.dir") = v
        case None => sys.props -= "graft.stagecache.dir"
      }
    }
  }
}
