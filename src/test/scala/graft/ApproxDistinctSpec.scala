package graft

import org.scalatest.funsuite.AnyFunSuite

/** agg_approx_distinct emits the exact distinct count plus a boolean
  * recording whether the HLL estimate landed inside a 3-sigma (15%)
  * error envelope — default rsd 0.05 is one standard deviation, so the
  * wider bound is what can be asserted as a constant across scale
  * factors. This spec pins the boolean actually coming out true on real
  * data — a sketch regression would flip it and fail both here and at
  * the oracle gate.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within 3 sigma of exact per group") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("within_3sigma"),
        s"${r.get(0)}: estimate outside the 3-sigma (15%) envelope")
    }
  }
}
