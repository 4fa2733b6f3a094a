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
  * Null contract: null array -> null; a null ELEMENT in either slot ->
  * null result, exactly what the HOF chain yields (`zip_with`'s `x * y`
  * is null for a null operand and the `+` fold absorbs it) — reading
  * the raw slot instead would silently contribute 0.0/garbage.
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  // Nullable even over non-null arrays: a null element nulls the fold.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.ArrayDotExpr$$.MODULE$$.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}

object ArrayDotExpr {

  /** Shared kernel for the interpreted and codegen paths: strict
    * in-order fold, truncated to the shorter array; null on the first
    * null slot (the HOF-equivalent absorbing null).
    */
  def compute(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  /** Column-API entry point: `dot($"a", $"b")`. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(ArrayDotExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
