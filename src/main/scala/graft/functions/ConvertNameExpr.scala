package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd native form of the reference's `convert_name`
  * (json_classification.py:40-67, incl. the title + " de " quirk —
  * SURVEY §2.3-1): same Scala kernel as the `ConvertName` UDF, but as a
  * Catalyst expression the generated code calls directly — no UDF
  * boxing/encoder round-trip on the hot enrichment path, where it runs
  * three times per index triple. The UDF registration stays as the
  * `udf_scala` surface demo; value equality is property-tested.
  */
case class ConvertNameExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; inference conforms (see UriHashExpr).
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "convert_name"

  override protected def nullSafeEval(input: Any): Any =
    ConvertNameExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ConvertNameExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ConvertNameExpr =
    copy(child = newChild)
}

object ConvertNameExpr {

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(ConvertName(s.toString))

  /** Column-API entry point — drop-in for ConvertName.asUdf on hot paths. */
  def convertNameNative(c: Column): Column =
    GraftShim.column(ConvertNameExpr(GraftShim.expression(c)))
}
