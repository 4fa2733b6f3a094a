package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernel: token array → 3-token shingles → md5-derived
  * 32-bit base hashes → K=16 affine-minwise signature, in one
  * expression.
  *
  * Value-identical to the HOF chain
  * `MinHashSigExpr.sig(transform(Text.shingles(tks, 3), Text.md5Hash32))`
  * and to the explode + groupBy-min build (MinHashSigSpec pins all
  * spellings on the real corpus). The fused form exists because the
  * HOF spelling evaluates `md5 → substring → conv` through the
  * INTERPRETED lambda path (measured ~2.7 ms/doc on 48-shingle docs —
  * 13.5 s per 5000-doc micro-batch, the whole cost of
  * stream_minhash_dedup), while this kernel runs one MessageDigest
  * loop in plain JVM code (~µs/doc). md5 parity: MD5 over the UTF-8
  * bytes of the space-joined shingle, first 4 bytes as an unsigned
  * 32-bit int — bit-identical to Spark's `md5()` + `conv(substr,16,10)`
  * and DuckDB's `md5()` + hex cast.
  *
  * Null contract: null token array → null; a null TOKEN → null result
  * (the `concat_ws`-based HOF chain would silently skip null tokens —
  * this kernel refuses instead, because a skipped token silently
  * changes every downstream shingle). Under 3 tokens → 16× MaxValue
  * (callers filter on token count before banding).
  */
case class ShingleMinHashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash16"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    ShingleMinHashExpr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.ShingleMinHashExpr$$.MODULE$$.compute($a);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }""")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleMinHashExpr = copy(child = newChild)
}

object ShingleMinHashExpr {
  private val N = 3

  /** One MessageDigest instance per thread — allocation-free per row. */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(tks: ArrayData): ArrayData = {
    import MinHashSigExpr.{K, Mod, Mult}
    val n = tks.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    if (n >= N) {
      val toks = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        if (tks.isNullAt(i)) return null
        toks(i) = tks.getUTF8String(i).getBytes
        i += 1
      }
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
        // First 4 md5 bytes as an unsigned 32-bit int ≙ Text.md5Hash32.
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var k = 0
        while (k < K) {
          val v = (h * (2L * k + 1) + k * Mult) % Mod
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point: `sig($"tks")`. */
  def sig(tks: Column): Column =
    GraftShim.column(ShingleMinHashExpr(GraftShim.expression(tks)))
}
