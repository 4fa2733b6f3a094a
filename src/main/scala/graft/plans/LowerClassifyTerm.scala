package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, Cast, Conv, CreateArray, ElementAt, Expression, Literal, Md5, Pmod, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

import graft.functions.ClassifyTerm

/** Custom optimizer rule (SURVEY.md §4.3): lower every
  * [[graft.functions.ClassifyTerm]] marker to the deterministic rule
  * classifier's expression tree —
  * `['person','place','organization','term'][(md5_32(norm) % 4) + 1]`
  * — exactly `Classify.RuleClassifier.labelExpr`, built here as raw
  * Catalyst nodes so the rewrite happens inside an already-resolved
  * plan. After this rule runs, the plan contains only codegen'd
  * built-ins; a plan that still contains the Unevaluable marker at
  * physical planning is a bug by construction.
  *
  * Injected through both public hooks: `GraftExtensions`
  * (injectOptimizerRule) for sessions built with spark.sql.extensions,
  * and `spark.experimental.extraOptimizations` for sessions constructed
  * elsewhere.
  */
object LowerClassifyTerm extends Rule[LogicalPlan] {

  /** md5(child)'s first 8 hex chars as a long — Text.md5Hash32 in
    * Catalyst nodes.
    */
  private def md5Hash32(e: Expression): Expression =
    Cast(
      Conv(
        Substring(Md5(Cast(e, BinaryType)), Literal(1), Literal(8)),
        Literal(16), Literal(10)),
      LongType)

  private def labelExpr(norm: Expression): Expression =
    ElementAt(
      CreateArray(Seq(
        Literal("person"), Literal("place"),
        Literal("organization"), Literal("term"))),
      Cast(Add(Pmod(md5Hash32(norm), Literal(4L)), Literal(1L)), IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ClassifyTerm(child) => labelExpr(child)
    }
}
