package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sink_compacted must actually compact: bounded file count from the
  * range partitioning + record cap, and non-overlapping (source,
  * doc_id) ranges across files so parquet min/max stats support range
  * pruning on the read key.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("compaction writes few size-capped files with disjoint key ranges") {
    val df = SparkEntry.queries("sink_compacted")(spark, sf)
    val n = df.count()
    assert(n > 0)
    // Same path builder as the query, so a scratch-layout change
    // cannot silently split the two.
    val out = new java.io.File(graft.queries.QDef.scratch(
      s"compact_${new java.io.File(sf).getName}"))
    val listed = out.listFiles()
    assert(listed != null, s"compacted output missing at $out")
    val files = listed.filter(_.getName.endsWith(".parquet"))
    val maxFiles = math.max(2, math.ceil(n / 3000.0).toInt + 1)
    assert(files.nonEmpty && files.length <= maxFiles,
      s"expected <= $maxFiles compacted files, got ${files.length}")
    // Per-file key ranges must not overlap (monotone layout).
    val ranges = files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(struct(col("source"), col("doc_id"))).as("lo"),
          max(struct(col("source"), col("doc_id"))).as("hi"))
        .head()
      (r.getStruct(0), r.getStruct(1))
    }
    def key(s: org.apache.spark.sql.Row) = (s.getString(0), s.getLong(1))
    val sorted = ranges.map { case (lo, hi) => (key(lo), key(hi)) }
      .sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(Ordering[(String, Long)].lt(hiA, loB),
          s"file key ranges overlap: $hiA vs $loB")
      case _ => ()
    }
  }
}
