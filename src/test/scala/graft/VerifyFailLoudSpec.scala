package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end exercise of Verify's fail-loud contract (the round-8
  * silent-loss class): a deliberately-throwing query must land in
  * `_errors.json` with its message, leave NO output directory (the
  * stale-output trap — a reused outDir could otherwise pass on the
  * previous run's parquet), and surface in the returned error map
  * (main exits nonzero iff that map is non-empty — the one line this
  * spec cannot call directly). Healthy queries in the same run still
  * dump, so one bad query degrades the round instead of erasing it.
  */
class VerifyFailLoudSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("a throwing query populates _errors.json, exits the run nonzero, dumps the rest") {
    val out = java.nio.file.Files
      .createTempDirectory("verify_failloud").toString
    val good: (SparkSession, String) => DataFrame =
      (s, dir) => s.read.parquet(s"$dir/region.parquet")
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate failure: boom")
    val errors = Verify.run(spark, sf, out,
      Seq("good_q" -> good, "bad_q" -> bad),
      Map("good_q" -> "SELECT * FROM region"))

    // The error map drives main's nonzero exit.
    assert(errors.keySet == Set("bad_q"))
    assert(errors("bad_q").contains("deliberate failure: boom"))

    // _errors.json carries the same failure for the driver to diff.
    val errJson = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("bad_q") && errJson.contains("deliberate failure"))

    // The good query still dumped (committed parquet), the bad one
    // left no directory at all — nothing stale to mistake for output.
    assert(new java.io.File(s"$out/good_q/_SUCCESS").exists(),
      "healthy query must still dump when a sibling fails")
    assert(!new java.io.File(s"$out/bad_q").exists(),
      "a failed query must leave no output directory")

    // oracle_sql.json is written regardless, with escaping intact.
    val oracleJson = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracleJson.contains("good_q"))
  }

  test("a clean run returns no errors and an empty _errors.json object") {
    val out = java.nio.file.Files
      .createTempDirectory("verify_failloud_clean").toString
    val good: (SparkSession, String) => DataFrame =
      (s, dir) => s.read.parquet(s"$dir/region.parquet")
    val errors = Verify.run(spark, sf, out, Seq("good_q" -> good), Map.empty)
    assert(errors.isEmpty)
    val errJson = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/_errors.json"))
    assert(errJson.trim == "{}")
  }
}
