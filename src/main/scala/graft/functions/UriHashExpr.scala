package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's deterministic entity
  * URI (generate_uri.py:5-26):
  * `'r' + str(int(sha256(lower(s) minus spaces/commas).hexdigest()[:8], 16) % 1e8)`.
  *
  * This is the custom-`Expression` surface demonstrator (SURVEY.md §2.2
  * `expr_catalyst`, §4.3): unlike a Scala UDF it participates in
  * whole-stage codegen — `doGenCode` emits a direct static call, so the
  * expression never leaves the generated Java and null handling is the
  * standard codegen'd null check, not a boxed-function wrapper.
  * Correctness is cross-checked against the pure built-in chain
  * `Text.uriHash` (sha2/conv/pmod) in UriHashExprSpec and by the
  * `expr_catalyst` oracle query.
  */
case class UriHashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[StringType.type]
  // conforms to the expected Seq[AbstractDataType].
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "uri_hash"

  override protected def nullSafeEval(input: Any): Any =
    UriHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UriHashExpr$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UriHashExpr =
    copy(child = newChild)
}

object UriHashExpr {

  /** Shared scalar kernel for both the interpreted and codegen paths.
    * Mirrors the reference byte-for-byte: lowercase first, then strip
    * only spaces and commas, sha-256, first 8 hex chars (= first 4
    * digest bytes) as an int, mod 1e8, 'r' prefix.
    */
  def compute(s: UTF8String): UTF8String = {
    val cleaned = s.toString
      .toLowerCase(java.util.Locale.ROOT)
      .replace(" ", "")
      .replace(",", "")
    val d = MessageDigest.getInstance("SHA-256")
      .digest(cleaned.getBytes("UTF-8"))
    // First 4 bytes == first 8 hex chars of the digest; always < 2^32.
    val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    UTF8String.fromString("r" + (hi % 100000000L))
  }

  /** Column-API entry point: `uriHashNative($"name")`. */
  def uriHashNative(c: Column): Column =
    GraftShim.column(UriHashExpr(GraftShim.expression(c)))
}
