package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Completeness of the prefix-filtered exact similarity join: AllPairs/
  * PPJoin prefix filtering is an EXACT method — every pair with Jaccard
  * >= t over the 3-gram shingle-hash sets must surface. The spec
  * brute-forces all O(n^2) pairs at sf0.001 (250 docs — the quadratic
  * oracle is affordable there and nowhere else) and asserts set
  * equality with the query's output, plus the integer threshold gate's
  * exactness on the boundary.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("prefix-filter join ≡ brute-force Jaccard >= 4/5 at sf0.001") {
    val got = SparkEntry.queries("dedup_prefix_filter")(spark, sf)
      .select("doc_a", "doc_b", "n_inter", "size_a", "size_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // Brute force: same shingle sets, all pairs, exact rational gate.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).trim.toLowerCase
          .replaceAll("\\s+", " ").split(" ").toSeq
        val sh = if (toks.length < 3) Seq.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSeq
        val hs = sh.map { g =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8"))
          java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
        }.distinct.sorted
        (r.getLong(0), hs)
      }
      .filter(_._2.nonEmpty)

    val expect = (for {
      (ida, sa) <- docs.iterator
      (idb, sb) <- docs.iterator if ida < idb
      inter = sa.toSet.intersect(sb.toSet).size.toLong
      if inter * 5 >= (sa.length + sb.length - inter) * 4
    } yield (ida, idb, inter, sa.length.toLong, sb.length.toLong)).toSet

    assert(got == expect,
      s"prefix filter missed ${(expect -- got).size} pairs, " +
        s"invented ${(got -- expect).size}")
    assert(expect.nonEmpty, "no qualifying pairs at sf0.001 — spec is vacuous")
  }
}
