package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UriHashExpr

/** The spark.sql.extensions injection path: the shared test session is
  * built with graft.GraftExtensions, so the custom expressions resolve
  * from SQL text with no imperative registration call anywhere in the
  * test path.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("extension-built session resolves uri_hash and term_triple_explode from SQL") {
    val rows = spark.sql(
      """SELECT tv.level, tv.term, uri_hash(tv.term) AS uri
         FROM VALUES ('George Washington', 'Mid', '') AS t(m, ms, sb)
         LATERAL VIEW term_triple_explode(m, ms, sb) tv AS level, term
         ORDER BY level""").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("main", "midsub"))
    val uri = rows.find(_.getString(0) == "main").get.getString(2)
    assert(uri.matches("r[0-9]{1,8}"))
    // Same value as the Column-API route.
    import spark.implicits._
    val direct = Seq("George Washington").toDF("n")
      .select(UriHashExpr.uriHashNative(col("n"))).as[String].head()
    assert(uri == direct)
  }

  test("ensureRegistered is idempotent on an already-extended session") {
    GraftExtensions.ensureRegistered(spark)
    GraftExtensions.ensureRegistered(spark)
    assert(spark.sql("SELECT uri_hash('Adams, John') AS u").collect()
      .head.getString(0).matches("r[0-9]{1,8}"))
  }
}
