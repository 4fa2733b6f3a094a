package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd longest-common-prefix length (in Unicode code
  * points) of two strings — the hot kernel of sorted-neighborhood
  * prefix dedup. The alternative composable spelling explodes a
  * position series per row pair and takes the min mismatch position
  * (the DuckDB oracle does exactly that), which multiplies the row
  * count by the cap; this is one fused O(min(n,m)) scan with zero
  * allocation beyond the two decoded strings, inside whole-stage
  * codegen.
  *
  * Counts CODE POINTS, not UTF-16 units, for parity with engines that
  * index strings by character (DuckDB `s[i]`); a surrogate pair counts
  * as one. Null if either side is null.
  */
case class CommonPrefixLenExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_len"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLenExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CommonPrefixLenExpr$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLenExpr =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLenExpr {

  /** Code-point LCP; one pass over UTF-16 units, stops at the first
    * mismatch. If the last matched unit is a high surrogate its pair
    * did not fully match — that code point is not common, so the unit
    * is excluded before converting matched units to a code point
    * count.
    */
  def compute(x: UTF8String, y: UTF8String): Long = {
    val a = x.toString
    val b = y.toString
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    if (i > 0 && Character.isHighSurrogate(a.charAt(i - 1))) i -= 1
    a.codePointCount(0, i).toLong
  }

  /** Column-API entry point. */
  def lcp(a: Column, b: Column): Column =
    GraftShim.column(
      CommonPrefixLenExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
