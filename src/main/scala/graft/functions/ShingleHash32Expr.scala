package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused native kernel: token array → 3-token shingles → md5-derived
  * 32-bit hash per shingle, as one expression returning the raw hash
  * array (ShingleMinHashExpr's un-minned sibling — for consumers that
  * need the full hash set: n-gram Jaccard's sorted-distinct sets, the
  * fingerprint min/max).
  *
  * Value-identical to `transform(Text.shingles(tks, 3),
  * Text.md5Hash32)` (MinHashSigSpec pins it), but the HOF spelling
  * evaluates `md5 → substring → conv` through the INTERPRETED lambda
  * path per element — the same ~50× penalty the signature kernel
  * removed from the band index. md5 parity: MD5 over the UTF-8 bytes
  * of the space-joined shingle, first 4 bytes as an unsigned 32-bit
  * int — bit-identical to Spark's `md5()` + `conv(substr, 16, 10)` and
  * DuckDB's `md5()` + hex cast.
  *
  * Null contract: null token array → null; a null TOKEN → null (the
  * kernel refuses rather than silently shifting every shingle).
  * Under 3 tokens → empty array (≙ Text.shingles' guard).
  */
case class ShingleHash32Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash32"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    ShingleHash32Expr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.ShingleHash32Expr$$.MODULE$$.compute($a);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }""")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHash32Expr = copy(child = newChild)
}

object ShingleHash32Expr {
  private val N = 3

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(tks: ArrayData): ArrayData = {
    val n = tks.numElements()
    if (n < N) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (tks.isNullAt(i)) return null
      toks(i) = tks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - N + 1)
    val digest = md.get()
    val space = ' '.toByte
    i = 0
    while (i <= n - N) {
      digest.reset()
      var j = 0
      while (j < N) {
        if (j > 0) digest.update(space)
        digest.update(toks(i + j))
        j += 1
      }
      val d = digest.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: `hashes($"tks")`. */
  def hashes(tks: Column): Column =
    GraftShim.column(ShingleHash32Expr(GraftShim.expression(tks)))
}
