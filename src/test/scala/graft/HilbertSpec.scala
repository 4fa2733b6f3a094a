package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertIndexExpr

/** Invariants of the native Hilbert xy→d kernel, plus
  * codegen/DataFrame-path agreement with direct compute() calls.
  *
  * The two structural properties below fully characterize the curve
  * on a grid (any walk satisfying both IS a Hamiltonian grid path,
  * and the goldens pin which one):
  *   1. bijectivity — the 2^b × 2^b grid maps onto [0, 4^b) with no
  *      collisions;
  *   2. unit-step adjacency — consecutive curve positions are
  *      grid-adjacent (|Δx| + |Δy| = 1). This is THE property Morton
  *      z-order lacks (its quadrant seams jump diagonally across the
  *      grid), and the reason Hilbert clustering skips fewer files on
  *      2-D range scans.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("goldens: first steps and corners of the 8x8 curve") {
    // The canonical 8x8 (bits=3) curve: starts at (0,0), first step
    // goes to (0,1) in (x,y) = (col,row) orientation of the classic
    // iterative formulation.
    assert(HilbertIndexExpr.compute(0L, 0L, 3) === 0L)
    assert(HilbertIndexExpr.compute(0L, 1L, 3) === 1L)
    assert(HilbertIndexExpr.compute(1L, 1L, 3) === 2L)
    assert(HilbertIndexExpr.compute(1L, 0L, 3) === 3L)
    // Last cell of the walk is the opposite bottom corner.
    assert(HilbertIndexExpr.compute(7L, 0L, 3) === 63L)
  }

  test("bijective on the 64x64 grid") {
    val bits = 6
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndexExpr.compute(x.toLong, y.toLong, bits)
    assert(ds.distinct.size === n * n)
    assert(ds.min === 0L && ds.max === (n.toLong * n - 1))
  }

  test("consecutive curve positions are grid-adjacent (unit steps)") {
    val bits = 5
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndexExpr.compute(x.toLong, y.toLong, bits) -> (x, y))
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent step ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("out-of-range inputs are masked, not undefined") {
    val bits = 4
    val n = 1L << bits
    assert(HilbertIndexExpr.compute(5L + n, 9L + 3 * n, bits) ===
      HilbertIndexExpr.compute(5L, 9L, bits))
  }

  test("skipping audit: curve layouts touch fewer files than 1-D sort") {
    val rows = SparkEntry.queries("layout_skipping_audit")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> r.getLong(2))
    val tot = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // The id sort leaves p_size spread over every file; both curves
    // must beat it on the 2-D workload, or the layout key is broken.
    assert(tot("hilbert") < tot("sorted"),
      s"hilbert ${tot("hilbert")} !< sorted ${tot("sorted")}")
    assert(tot("zorder") < tot("sorted"),
      s"zorder ${tot("zorder")} !< sorted ${tot("sorted")}")
  }

  test("DataFrame/codegen path agrees with direct compute") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i.toLong % 16, i.toLong / 16)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        HilbertIndexExpr.hilbert(col("x"), col("y"), 4).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ===
        HilbertIndexExpr.compute(r.getLong(0), r.getLong(1), 4))
    }
  }
}
