package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom `Generator` (UDTF surface, SURVEY.md §2.2 `udtf_generator`):
  * unpivots the reference's (main, midsub, sub) index-term triple
  * (xml_to_json.py:42, json_classification.py:322-335) into one
  * `(level, term)` row per non-null, non-empty component — the 3-way
  * unpivot the reference does with nested Python loops, as a lateral
  * generator the planner places like any `explode`.
  *
  * `CodegenFallback` keeps it out of whole-stage codegen; that is
  * acceptable for a generator (Spark's own `Generate` operator already
  * bounds codegen) and the built-in `stack()` route used by
  * `agg_distinct_terms` remains the hot-path alternative.
  */
case class TermTripleExplode(main: Expression, midsub: Expression, sub: Expression)
    extends Expression with Generator with CodegenFallback with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(main, midsub, sub)
  // AbstractDataType is private[sql]; inference conforms (see UriHashExpr).
  override def inputTypes = Seq(StringType, StringType, StringType)
  override def prettyName: String = "term_triple_explode"

  override def elementSchema: StructType = StructType(Seq(
    StructField("level", StringType, nullable = false),
    StructField("term", StringType, nullable = false)))

  @transient private lazy val levels =
    Array("main", "midsub", "sub").map(UTF8String.fromString)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](3)
    var i = 0
    while (i < 3) {
      val v = children(i).eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String]
        if (s.numBytes() > 0) out += InternalRow(levels(i), s)
      }
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TermTripleExplode =
    copy(main = newChildren(0), midsub = newChildren(1), sub = newChildren(2))
}

object TermTripleExplode {
  /** Column-API entry: select(col("id"), termTriples($"m", $"ms", $"s")). */
  def termTriples(main: Column, midsub: Column, sub: Column): Column =
    GraftShim.column(TermTripleExplode(
      GraftShim.expression(main),
      GraftShim.expression(midsub),
      GraftShim.expression(sub)))
}
