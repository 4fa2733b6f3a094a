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

      // And the stale generation was evicted when the new one was
      // written — the cache holds exactly the live fingerprinted entry
      // (unbounded growth across testdata regenerations would fill the
      // disk at sf0.1 artifact sizes).
      val entries = new java.io.File(s"$cacheDir/${new java.io.File(dir).getName}")
        .listFiles()
      assert(entries != null && entries.length == 1,
        s"expected one live cache generation, got ${Option(entries).map(_.length)}")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.stagecache.dir") = v
        case None => sys.props -= "graft.stagecache.dir"
      }
    }
  }
}
