package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.queries.Analytics

/** Unit coverage for the curation/analytics primitives the oracle can't
  * exercise on the synthetic corpus: email masking (the corpus has no
  * emails — the oracle only proves the digit path) and the Z-order
  * interleave against a bit-twiddling reference.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("maskPii masks emails before digit runs and counts both") {
    import spark.implicits._
    val rows = Seq(
      "reach jane.doe+x@corp.example.com or 555-0188",
      "two: a@b.io c.d@e-f.org, pin 007",
      "no pii here").toDF("s")
    val got = rows.select(Text.maskPii(col("s")).as("m"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "reach <EMAIL> or <NUM>-<NUM>",
      "two: <EMAIL> <EMAIL>, pin <NUM>",
      "no pii here"))
    // Email digits are protected by the mask order: the address's
    // numerals never leak into the <NUM> pass.
    assert(!got.head.contains("example"))
  }

  test("zOrderSql matches a reference Morton interleave on the part table") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .selectExpr("p_size", "p_partkey % 256 AS y",
        s"CAST(${Analytics.zOrderSql("p_size", "p_partkey % 256", 8, "div")} AS BIGINT) AS z")
    def interleave(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    df.collect().foreach { r =>
      assert(r.getLong(2) == interleave(r.getInt(0).toLong, r.getLong(1)),
        s"size=${r.getInt(0)} y=${r.getLong(1)}")
    }
    // Z-order dominance: if every point of cell B is strictly larger
    // than every point of cell A in BOTH dimensions, all of B's
    // z-values exceed all of A's — the property multi-dimensional file
    // pruning relies on. (p_size only spans 1..50, so cells are 16
    // wide on that axis to be non-vacuous.)
    val q = df.selectExpr("p_size div 16 AS qx", "y div 64 AS qy", "z")
      .groupBy("qx", "qy").agg(min("z").as("zmin"), max("z").as("zmax"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    for {
      ((qx, qy), (_, zmax)) <- q
      ((qx2, qy2), (zmin2, _)) <- q
      if qx2 > qx && qy2 > qy
    } assert(zmax < zmin2, s"($qx,$qy) max $zmax !< ($qx2,$qy2) min $zmin2")
  }
}
