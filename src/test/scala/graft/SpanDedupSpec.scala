package graft

import org.scalatest.funsuite.AnyFunSuite

/** Span-level ExactSubstr invariants: published spans must equal the
  * brute-force recompute (fingerprint every K-gram, mark repeats,
  * merge overlapping token ranges), spans must be maximal — disjoint
  * with true gaps between them — and the K=4 anchor floor must make
  * SUB-8 duplicated spans visible (the round-10 k=8 floor silently hid
  * every 4-7-token duplicated phrase).
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 4

  test("spans equal the brute-force recompute and are maximal") {
    val rows = SparkEntry.queries("dedup_span_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)

    // Disjoint + maximal per doc: consecutive spans cannot touch or
    // overlap (they would have merged), and every span covers >= K
    // tokens with a sane gram count.
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.foreach { case (_, s, e, n) =>
        assert(e - s >= K - 1 && n >= 1 && n <= e - s - K + 2)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"spans [$e1] and [$s2] should have merged")
        case _ =>
      }
    }

    // Brute-force reference over the whole corpus.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split("\\s+", -1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val grams = for {
      (id, tks) <- docs if tks.length >= K
      i <- 0 to tks.length - K
    } yield (id, i.toLong, md5hex(tks.slice(i, i + K).mkString(" ")))
    val dupFps = grams.groupBy(_._3).filter(_._2.length >= 2).keySet
    val want = grams.filter(g => dupFps(g._3))
      .groupBy(_._1).flatMap { case (id, ps) =>
        val pos = ps.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        for (p <- pos) spans.lastOption match {
          // overlapping or adjacent token ranges merge: p <= prevEnd + 1
          case Some((s, e, n)) if p <= e + 1 =>
            spans(spans.length - 1) = (s, math.max(e, p + K - 1), n + 1)
          case _ => spans += ((p, p + K - 1, 1L))
        }
        spans.map { case (s, e, n) => (id, s, e, n) }
      }.toSet
    assert(rows.toSet == want,
      s"span sets differ: extra=${rows.toSet -- want} missing=${want -- rows.toSet}")
  }

  test("a 5-token duplicated phrase (sub-8 span) is detected") {
    // Two otherwise-disjoint docs share exactly one 5-token phrase:
    // under the old k=8 floor this corpus has ZERO spans; under K=4 the
    // phrase yields two duplicated 4-grams per doc merging into one
    // maximal [pos, pos+4] span each.
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_span_subk"
    val phrase = "alpha beta gamma delta epsilon"
    Seq(
      (1L, s"one two three $phrase four five six seven"),
      (2L, s"eight nine ten eleven $phrase twelve thirteen"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = SparkEntry.queries("dedup_span_exact")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet == Set((1L, 3L, 7L, 2L), (2L, 4L, 8L, 2L)),
      s"expected the shared 5-token span in both docs, got ${spans.toSet}")
  }
}
