package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins sample_kcenter_coreset against an independent whole-corpus
  * brute-force greedy recompute (driver-side loops over collected
  * quantized vectors — no DataFrames), so the distributed
  * min-update/argmax trajectory and the final coverage assignment are
  * checked end to end, not just engine-to-engine.
  */
class KCenterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("greedy trajectory and coverage match a brute-force recompute") {
    val got = SparkEntry.queries("sample_kcenter_coreset")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 5)

    // Brute force: quantize exactly as the engine does, then greedy.
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 1e6 + 0.5) as long)) as vq")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val byId = vecs.toMap
    var centers = Vector((0L, vecs.head._1, 0L)) // (order, id, radius)
    val dmin = scala.collection.mutable.Map(vecs.map(v => v._1 -> Long.MaxValue): _*)
    for (t <- 1L until 5L) {
      val c = byId(centers.last._2)
      vecs.foreach { case (id, vq) =>
        dmin(id) = math.min(dmin(id), d2(vq, c))
      }
      val (nid, nr) = vecs.map { case (id, _) => (id, dmin(id)) }
        .maxBy { case (id, r) => (r, -id) } // max radius, min id on ties
      centers :+= ((t, nid, nr))
    }
    assert(got.map(r => (r._1, r._2, r._4)).toSeq ==
      centers.map(c => (c._1, c._2, c._3)),
      s"trajectory drift: got ${got.toSeq}, want $centers")

    // Coverage: nearest-center assignment with (distance, order) ties.
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    vecs.foreach { case (_, vq) =>
      val best = centers.minBy { case (ord, cid, _) => (d2(vq, byId(cid)), ord) }
      counts(best._1) += 1
    }
    got.foreach { case (ord, _, n, _) =>
      assert(n == counts(ord), s"center $ord covers $n, brute force says ${counts(ord)}")
    }
    assert(got.map(_._3).sum == vecs.length,
      "coverage must partition the corpus")
  }
}
