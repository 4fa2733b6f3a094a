package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, Unevaluable}
import org.apache.spark.sql.types.{DataType, StringType}

/** Logical marker for "classify this term" (O17/O19): carries the
  * intent through analysis but is deliberately Unevaluable — the
  * `graft.plans.LowerClassifyTerm` optimizer rule must lower it to the
  * engine's classifier expression before physical planning. This is the
  * custom-`Rule[LogicalPlan]` surface of SURVEY.md §4.3: enrichment is
  * declared where it is used and planned where the engine decides.
  */
case class ClassifyTerm(child: Expression)
    extends UnaryExpression with Unevaluable {

  override def dataType: DataType = StringType
  override def prettyName: String = "classify_term"

  override protected def withNewChildInternal(newChild: Expression): ClassifyTerm =
    copy(child = newChild)
}

object ClassifyTerm {
  /** Column-API entry: `classifyTerm($"norm")`. */
  def classifyTerm(c: Column): Column =
    GraftShim.column(ClassifyTerm(GraftShim.expression(c)))
}
