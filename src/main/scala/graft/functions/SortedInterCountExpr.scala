package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd intersection COUNT of two SORTED long arrays — the
  * hot kernel of blocked pairwise Jaccard. `size(array_intersect(a,b))`
  * materializes a hash set and an output array per pair; with both
  * sides sorted once at prep (cached), a two-pointer merge counts the
  * intersection in O(n+m) with zero allocation, fused into whole-stage
  * codegen. Count-equivalent to `len(list_intersect(...))` on distinct
  * elements regardless of order, so the DuckDB oracle is unchanged.
  *
  * Contract: inputs are DISTINCT and ASCENDING (prep applies
  * sort_array(array_distinct(...))); null array -> null.
  */
case class SortedInterCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCountExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedInterCountExpr$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedInterCountExpr {

  /** Two-pointer merge count over sorted distinct long arrays. */
  def compute(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val a = x.getLong(i)
      val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  /** Column-API entry point over sorted distinct long arrays. */
  def interCount(a: Column, b: Column): Column =
    GraftShim.column(
      SortedInterCountExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
