package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TermTripleExplode, Text, TopKTerms, UriHashExpr}

/** Custom Catalyst surface: native Expression (interpreted + codegen),
  * Generator null/empty semantics, Aggregator determinism.
  */
class CustomSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("UriHashExpr matches the built-in sha2/conv/pmod chain (codegen path)") {
    val names = Seq("George Washington", "Adams, John", "  MIXED case, X ",
      "", "a", "Müller, Jürgen", "no-separators-here").toDF("n")
    val out = names.select(
      UriHashExpr.uriHashNative(col("n")).as("native"),
      Text.uriHash(col("n")).as("builtin")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("UriHashExpr reference golden (generate_uri.py semantics)") {
    // sha256("georgewashington")[:8] = 0x5f04672b = 1594189611 → % 1e8
    val got = Seq("George Washington").toDF("n")
      .select(UriHashExpr.uriHashNative(col("n"))).as[String].head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest("georgewashington".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    assert(got == "r" + (java.lang.Long.parseLong(hex, 16) % 100000000L))
  }

  test("UriHashExpr null propagates") {
    val got = Seq[Option[String]](None).toDF("n")
      .select(UriHashExpr.uriHashNative(col("n"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("TermTripleExplode drops nulls and empty strings, keeps level order") {
    val df = Seq(
      ("d1", "Main Term", "Mid", "Sub"),
      ("d2", "Only Main", null, ""),
      ("d3", "", null, "S")).toDF("id", "m", "ms", "s")
    val rows = df.select(col("id"),
      TermTripleExplode.termTriples(col("m"), col("ms"), col("s")))
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("d1", "main", "Main Term"), ("d1", "midsub", "Mid"), ("d1", "sub", "Sub"),
      ("d2", "main", "Only Main"),
      ("d3", "sub", "S")))
  }

  test("TopKTerms orders by count desc then term asc and truncates") {
    val agg = new TopKTerms[String](2, identity)
    val buf = Seq("b", "a", "b", "c", "a", "b").foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(buf, Map("c" -> 1L, "z" -> 3L))
    assert(agg.finish(merged).map(tc => (tc.term, tc.cnt)) ==
      Seq(("b", 3L), ("z", 3L)))
  }

  test("scan_observed exposes audit metrics without a second scan") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("scan_observed")(spark, sf)
    df.collect()
    val m = df.queryExecution.observedMetrics("doc_metrics")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(m.getAs[Long]("n_rows") == docs.count())
    assert(m.getAs[Long]("total_chars") ==
      docs.agg(sum("n_chars")).head().getLong(0))
  }
}
