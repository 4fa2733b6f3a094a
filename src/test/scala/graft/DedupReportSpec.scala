package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the dedup report-card pair: the threshold sweep must
  * be monotone (a higher cutoff can only verify fewer pairs) and
  * discriminating on this corpus, and the cluster-size histogram must
  * partition the corpus exactly.
  */
class DedupReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("threshold sweep is monotone non-increasing and discriminating") {
    val rows = SparkEntry.queries("dedup_threshold_sweep")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 5 && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, "higher threshold verified MORE pairs")
    }
    rows.foreach { case (t, p, d) =>
      assert(d <= 2 * p, s"t=$t: $d docs from $p pairs is impossible")
      if (p > 0) assert(d >= 2, s"t=$t: $p pairs must touch >= 2 docs")
    }
    // The grid must split the distribution — all-equal counts mean the
    // sweep answers nothing on this corpus.
    assert(rows.map(_._2).distinct.length > 1,
      "sweep counts identical at every threshold — grid not discriminating")
  }

  test("band sweep: stricter bandings yield fewer candidates; (4,4) matches production") {
    val rows = SparkEntry.queries("dedup_band_sweep")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 4 && rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // Fewer bands / longer rows = stricter: ordered by b ascending,
    // candidate volume and t* must be monotone (t* rises as b falls).
    rows.sliding(2).foreach { case Array((_, _, t1, p1, d1), (_, _, t2, p2, d2)) =>
      assert(p1 <= p2 && d1 <= d2, "a stricter banding produced MORE candidates")
      assert(t1 >= t2, "t* must fall as bands multiply")
    }
    // The production (b=4, r=4) row must agree exactly with the
    // candidate-pair query built from the same signatures.
    val prod = rows.find(_._1 == 4L).get
    val pairCount = SparkEntry.queries("dedup_minhash_pairs")(spark, sf).count()
    assert(prod._4 == pairCount,
      s"sweep (4,4) says ${prod._4} pairs; dedup_minhash_pairs says $pairCount")
    // The grid must discriminate on this corpus.
    assert(rows.map(_._4).distinct.length > 1,
      "identical candidate counts at every banding — sweep answers nothing")
  }

  test("cluster-size histogram partitions the corpus") {
    val rows = SparkEntry.queries("dedup_cluster_size_hist")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (sz, nc, nd) =>
      assert(nd == sz * nc, s"size $sz: $nc clusters but $nd docs")
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum == total,
      "histogram docs must sum to the corpus size")
    assert(rows.exists(_._1 == 1L), "no singleton row — labeling lost docs")
    assert(rows.exists(_._1 > 1L), "no multi-doc cluster — pair graph empty")
  }
}
