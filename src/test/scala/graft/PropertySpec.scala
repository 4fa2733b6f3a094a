package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ConvertName, Text, UriHashExpr}
import graft.pipeline.Classify

/** Property-based checks (SURVEY §5.2), deterministic via a fixed
  * ScalaCheck seed: a generated corpus of messy strings goes through one
  * DataFrame pass asserting the algebraic properties the reference
  * semantics rely on.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val token = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val piece = Gen.frequency(
    6 -> token,
    1 -> Gen.const(","), 1 -> Gen.const("  "), 1 -> Gen.const("\t"),
    1 -> Gen.const("("), 1 -> Gen.const(")"),
    1 -> Gen.const("de"), 1 -> Gen.const("Dr."),
    1 -> Gen.const("Müller"), 1 -> Gen.const("漢字"))
  private val messy: Gen[String] =
    Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, piece).map(_.mkString(" ")))

  private lazy val samples: Seq[String] =
    Gen.listOfN(400, messy).pureApply(Gen.Parameters.default, Seed(42L))

  test("norm idempotency, uri format/insensitivity, native==builtin, label domain") {
    val df = samples.toDF("s").select(
      (Text.normTerm(Text.normTerm(col("s"))) === Text.normTerm(col("s")))
        .as("norm_idem"),
      Text.uriHash(col("s")).rlike("^r[0-9]{1,8}$").as("uri_fmt"),
      // lowercase-then-strip-spaces/commas is a fixpoint of the uri input
      (Text.uriHash(col("s")) ===
        Text.uriHash(regexp_replace(lower(col("s")), "[ ,]", ""))).as("uri_fix"),
      (UriHashExpr.uriHashNative(col("s")) === Text.uriHash(col("s")))
        .as("native_eq"),
      Classify.RuleClassifier.labelExpr(Text.normTerm(col("s")))
        .isin("person", "place", "organization", "term").as("label_dom"))
    val bad = df.filter(!col("norm_idem") || !col("uri_fmt") || !col("uri_fix")
      || !col("native_eq") || !col("label_dom"))
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }

  test("array_distinct preserves first-occurrence order (first-wins dedup)") {
    val lists = Gen.listOfN(200,
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))))
      .pureApply(Gen.Parameters.default, Seed(7L))
    val expected = lists.map(l => l.foldLeft(Vector.empty[String]) {
      (acc, x) => if (acc.contains(x)) acc else acc :+ x
    })
    val got = lists.toDF("arr")
      .select(array_distinct(col("arr"))).as[Seq[String]].collect()
    // Row order of a local-relation projection is preserved; compare pairwise.
    got.zip(expected).foreach { case (g, e) => assert(g == e.toSeq) }
  }

  test("ConvertNameExpr (codegen) equals the ConvertName UDF everywhere") {
    val named = samples ++ Seq("Washington, George", "Adams, Dr. John",
      "von Humboldt, Baron Alexander", "One, Two, Three", "x,y")
    val df = named.toDF("s").select(
      graft.functions.ConvertNameExpr.convertNameNative(col("s")).as("native"),
      ConvertName.asUdf(col("s")).as("viaUdf"))
    assert(df.filter(col("native") =!= col("viaUdf")).count() == 0)
  }

  test("convert_name passes through strings without a comma-space separator") {
    samples.filterNot(_.contains(", ")).foreach { s =>
      assert(ConvertName(s) == s, s"'$s'")
    }
  }

  test("uri hash is stable across repeated evaluation (determinism)") {
    val once = samples.toDF("s").select(Text.uriHash(col("s"))).as[String].collect()
    val twice = samples.toDF("s").select(Text.uriHash(col("s"))).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }
}
