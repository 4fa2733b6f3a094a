package graft

import org.apache.spark.sql.{GraftShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{TermTripleExplode, UriHashExpr}

/** Session-extension entry point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's custom Catalyst expressions as first-class SQL
  * functions, so `SELECT uri_hash(name)` and
  * `LATERAL VIEW term_triple_explode(m, ms, s)` resolve like built-ins
  * in any session built with the extension — the supported public
  * injection surface (SURVEY.md §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.LowerClassifyTerm)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftExtensions {

  private def f(name: String, usage: String)(b: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      b)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    f("uri_hash",
      "uri_hash(str) - deterministic reference entity URI (generate_uri.py:5-26)") {
      cs => UriHashExpr(cs.head)
    },
    f("term_triple_explode",
      "term_triple_explode(main, midsub, sub) - (level, term) rows, skipping null/empty") {
      cs => TermTripleExplode(cs(0), cs(1), cs(2))
    },
    f("classify_term",
      "classify_term(norm) - deterministic rule-classifier label; lowered by LowerClassifyTerm") {
      cs => graft.functions.ClassifyTerm(cs.head)
    })

  /** Idempotently register the same functions — and the ClassifyTerm
    * lowering rule via `experimental.extraOptimizations` — on a session
    * that was NOT built with the extension (e.g. the driver's own
    * session).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      GraftShim.registerFunction(spark, id.funcName, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LowerClassifyTerm))
      spark.experimental.extraOptimizations ++= Seq(graft.plans.LowerClassifyTerm)
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies ++= Seq(graft.plans.TopKPerGroupStrategy)
  }
}
