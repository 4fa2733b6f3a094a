package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two double arrays — the hot kernel
  * of every pairwise similarity/near-dup operator.
  *
  * Semantically identical to the built-in higher-order chain
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (strict left-to-right
  * IEEE fold, so DuckDB's in-order `list_sum(list_transform(...))`
  * reproduces it bit-for-bit), but the HOF chain allocates a zipped
  * array and evaluates boxed lambdas per element outside whole-stage
  * codegen; this expression is one fused primitive loop emitted
  * directly into the generated Java. Cross-checked against the HOF
  * chain in ScaleOpsSpec.
  *
  * Null contract: null array -> null; elements are assumed non-null
  * (embedding vectors), matching the HOF chain on the same data.
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayDotExpr$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayDotExpr {

  /** Shared kernel for the interpreted and codegen paths: strict
    * in-order fold, truncated to the shorter array.
    */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  /** Column-API entry point: `dot($"a", $"b")`. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(ArrayDotExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
