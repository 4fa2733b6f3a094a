package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CommonPrefixLenExpr

/** Goldens for the native LCP kernel, including the surrogate-pair
  * boundary (a matched high surrogate whose low half mismatches must
  * NOT count as a common code point) and codegen/DataFrame-path
  * agreement with direct compute() calls.
  */
class CommonPrefixLenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cases: Seq[(String, String, Long)] = Seq(
    ("", "", 0L),
    ("a", "", 0L),
    ("abc", "abc", 3L),
    ("abcdef", "abcxef", 3L),
    ("abc", "abcdef", 3L),
    ("the quick brown", "the quick crown", 10L),
    // BMP unicode
    ("café x", "café y", 5L),
    // Identical surrogate pair counts as ONE code point
    ("a😀b", "a😀c", 2L),
    // High surrogate matches, low differs: the pair is not common
    ("a😀", "a😁", 1L),
    // One side ends mid-pair relative to the other
    ("a😀", "a", 1L))

  test("compute() goldens incl. surrogate boundaries") {
    cases.foreach { case (a, b, want) =>
      val got = CommonPrefixLenExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"lcp('$a','$b') = $got, want $want")
      assert(got == CommonPrefixLenExpr.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a)),
        s"lcp not symmetric on ('$a','$b')")
    }
  }

  test("DataFrame (codegen) path matches compute()") {
    import spark.implicits._
    // Parquet-backed so ConvertToLocalRelation cannot fold the
    // projection before the expression runs (verify-skill gotcha).
    val p = java.nio.file.Files.createTempDirectory("lcp").toString
    cases.toDF("a", "b", "want").write.mode("overwrite").parquet(p)
    val got = spark.read.parquet(p)
      .select(col("a"), col("b"),
        CommonPrefixLenExpr.lcp(col("a"), col("b")).as("l"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b, want) =>
      assert(got((a, b)) == want, s"df lcp('$a','$b') = ${got((a, b))}")
    }
  }
}
