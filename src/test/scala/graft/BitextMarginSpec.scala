package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data invariants of the margin-criterion bitext miner: the published
  * margin must equal the brute-force recompute from raw embeddings
  * (quantized-int normalizers, k=4 both directions over the mined
  * batch), and the accept flag must be exactly the 1.05 threshold.
  */
class BitextMarginSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("margin equals the brute-force recompute; accept is the threshold") {
    val rows = SparkEntry.queries("sim_bitext_margin")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach(g => assert(g.length <= 2))

    // Brute-force reference entirely on the driver.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    def qcos(a: Array[Double], b: Array[Double]): Long = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1e6).toLong
    }
    val qa = emb.filter(e => e._1 < 40 && e._2 % 2 == 0)
    val cb = emb.filter(_._2 % 2 == 1)
    val all = for (a <- qa; b <- cb) yield (a._1, b._1, qcos(a._3, b._3))
    def topkSum(xs: Seq[(Long, Long)]): Long = // (otherId, qcos)
      xs.sortBy { case (id, c) => (-c, id) }.take(4).map(_._2).sum
    val sfMap = all.groupBy(_._1).map { case (a, ps) =>
      a -> topkSum(ps.map(p => (p._2, p._3)).toSeq) }
    val sbMap = all.groupBy(_._2).map { case (b, ps) =>
      b -> topkSum(ps.map(p => (p._1, p._3)).toSeq) }
    val cosMap = all.map(p => (p._1, p._2) -> p._3).toMap

    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(2))
      val want = 8.0 * cosMap((a, b)) / (sfMap(a) + sbMap(b)).toDouble
      val wantRx = math.floor(want * 1e6 + 0.5) / 1e6
      assert(r.getDouble(4) == wantRx,
        s"margin for ($a,$b): got ${r.getDouble(4)}, want $wantRx")
      assert(r.getBoolean(5) == (want >= 1.05),
        s"accept flag for ($a,$b) disagrees with the 1.05 threshold")
      assert(r.getDouble(3) == cosMap((a, b)).toDouble / 1e6)
    }
    // Hubness cancellation is live: margin order must differ from raw
    // cosine order for at least one query (otherwise the normalizer
    // is a no-op on this corpus and the test proves nothing).
    val byA = rows.groupBy(_.getLong(0))
    assert(byA.values.exists { g =>
      val byMargin = g.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      val byCos = g.sortBy(r => (-r.getDouble(3), r.getLong(2))).map(_.getLong(2)).toSeq
      byMargin != byCos
    } || byA.values.forall(_.length == 1),
      "margin ranking never reorders raw cosine — normalizer inert?")
  }
}
