package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 2-D Hilbert-curve index (the xy→d walk of the
  * classic iterative formulation): maps a point in the 2^bits × 2^bits
  * grid to its position along the Hilbert space-filling curve.
  *
  * Why it exists next to the Morton/z-order key (`layout_zorder`):
  * both interleave two dimensions so a sort clusters 2-D neighbors
  * into the same files, but the Hilbert walk never makes the long
  * diagonal jumps Morton makes at quadrant boundaries — adjacent curve
  * positions are always grid-adjacent, so the worst-case spread of a
  * 2-D range query over curve positions is strictly smaller. That is
  * why table formats offer Hilbert clustering as the upgrade over
  * z-order for multi-dimensional file skipping.
  *
  * The walk is a per-row fixed loop (`bits` iterations of pure integer
  * ops — compare/xor/subtract/swap), far outside what composable
  * Column algebra can express without materializing one CASE pyramid
  * per level, so it is a native expression with `doGenCode`: one
  * static-method call inside whole-stage codegen, zero allocation.
  * The DuckDB oracle replays the identical loop as a recursive CTE
  * (one iteration per recursion level), so every row's index is
  * bit-for-bit comparable.
  *
  * Inputs are taken modulo 2^bits (callers pass already-bounded
  * dimensions; the mask makes out-of-range inputs total rather than
  * undefined). Null if either side is null.
  */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndexExpr.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertIndexExpr$$.MODULE$$.compute($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {

  /** xy→d: from the top bit down, add the quadrant's curve offset
    * (s² cells per quadrant, gray-coded orientation), then rotate the
    * frame so the next level's quadrant test reads the rotated
    * coordinates. Bits above the grid are masked off first.
    */
  def compute(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-API entry point. */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    GraftShim.column(HilbertIndexExpr(
      GraftShim.expression(x), GraftShim.expression(y), bits))
}
