package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd K=16 MinHash signature of a shingle-hash array —
  * the per-document kernel of the LSH dedup family.
  *
  * Semantically identical to BOTH existing spellings of the same
  * computation: the explode + `groupBy(doc,k).agg(min)` build
  * (Dedup.minhashK) and the higher-order fold
  * `aggregate(h0s, fill(16, MaxValue), (acc,h) -> zip_with(acc, ks,
  * (a,k) -> least(a, (h·(2k+1) + k·2654435761) mod (2³¹−1))))` — the
  * standard affine-rehash minwise family over one md5 base hash per
  * shingle. The HOF spelling allocates a boxed 16-array per ELEMENT
  * and runs interpreted lambdas (measured ~3 ms/doc on 48-shingle
  * docs — it dominated stream_minhash_dedup's micro-batch); this
  * expression is one fused primitive loop in the generated Java.
  * Cross-checked against both spellings in MinHashSigSpec.
  *
  * Null contract: null array → null; a null ELEMENT → null result
  * (the HOF fold's absorbing null). Empty array → 16× Long.MaxValue
  * (the fold's init — callers filter empties before banding).
  */
case class MinHashSigExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig16"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    MinHashSigExpr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.MinHashSigExpr$$.MODULE$$.compute($a);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }""")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

object MinHashSigExpr {
  val K = 16
  val Mod = 2147483647L
  val Mult = 2654435761L

  /** Shared kernel for the interpreted and codegen paths: one pass
    * over the hashes, all K lanes as primitive longs.
    */
  def compute(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val h = xs.getLong(i)
      var k = 0
      while (k < K) {
        val v = (h * (2L * k + 1) + k * Mult) % Mod
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point: `sig($"h0s")`. */
  def sig(h0s: Column): Column =
    GraftShim.column(MinHashSigExpr(GraftShim.expression(h0s)))
}
