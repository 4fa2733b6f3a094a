package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.Text

/** URI minting goldens captured from the reference generate_uri
  * (generate_uri.py:5-26) + shape properties.
  */
class UriHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def uriOf(values: Seq[String]): Seq[String] =
    values.toDF("s").select(Text.uriHash(col("s"))).as[String].collect().toSeq

  test("uriHash matches reference goldens") {
    val goldens = Seq(
      "Washington, George" -> "r15079914",
      "George Washington" -> "r88482195",
      "John Adams" -> "r45076756",
      "new york" -> "r90008907",
      "New York" -> "r90008907", // case-insensitive
      "Congress" -> "r35079197",
      "Virginia" -> "r72593898",
      "committees" -> "r5023761",
      "Baron von  de Steuben" -> "r50750406",
      "" -> "r20012610",
      "A B,C" -> "r28432319",
      "Émile Zola" -> "r72907637") // non-ASCII lowercasing + UTF-8
    assert(uriOf(goldens.map(_._1)) == goldens.map(_._2))
  }

  test("uriHash is deterministic, 'r'-prefixed, < 1e8") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val once = uriOf(xs)
    assert(once == uriOf(xs))
    once.foreach { u =>
      assert(u.matches("r\\d{1,8}"), u)
      assert(u.drop(1).toLong < 100000000L)
    }
  }

  test("space/comma-insensitivity mirrors the reference strip rule") {
    assert(uriOf(Seq("Washington,George ")) == uriOf(Seq("washington, george")))
  }
}
