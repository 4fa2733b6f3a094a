package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4.x wraps columns in `ColumnNode`s and keeps the
  * Expression constructors `private[sql]`, so the engine's custom
  * expressions (`graft.functions.UriHashExpr`, `TermTripleExplode`)
  * cross through this one-file shim — the only code outside the `graft`
  * package.
  */
object GraftShim {
  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed-later Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
