package graft

import org.scalatest.funsuite.AnyFunSuite

/** agg_approx_distinct has no value oracle (HLL sketches are
  * engine-specific); this spec pins the promised accuracy contract
  * instead: <5% relative error against the exact distinct count.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within 5% of exact per group") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.get(0)}: approx=$approx exact=$exact")
    }
  }
}
