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

  test("perplexity buckets: terciles are contiguous score strata per language") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("text_perplexity_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val byB = g.map(t => t._2 -> t).toMap
      assert(byB.keySet == Set("head", "middle", "tail"),
        s"$lang missing a tercile: ${byB.keySet}")
      // Strata are contiguous and ordered: head holds the highest
      // scores, tail the lowest; tercile sizes differ by at most one.
      assert(byB("head")._4 >= byB("middle")._5,
        s"$lang: head min below middle max")
      assert(byB("middle")._4 >= byB("tail")._5,
        s"$lang: middle min below tail max")
      val sizes = g.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$lang tercile sizes $sizes differ by more than one")
    }
    // Bucket populations sum to the docs that actually scored.
    val scored = SparkEntry.queries("text_lm_score")(spark, sf)
      .filter(col("n_bigrams") > 0).count()
    assert(rows.map(_._3).sum == scored,
      "tercile populations must partition the scored docs")
  }

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

  test("classifier score equals the brute-force hash-weight recompute; no shuffle before the sort") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("text_classifier_score")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "keep threshold must split the corpus (both arms live)")

    // Driver-side reference for a sample of docs: identical md5-derived
    // bucket weights over the identical normalization.
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(25).foreach { r =>
      val toks = texts(r.getLong(0)).trim.toLowerCase
        .replaceAll("\\s+", " ").split("\\s+", -1)
      val milli = toks.map(t => h32("w:" + (h32("fh:" + t) % 1024)) % 2001 - 1000).sum
      assert(r.getBoolean(3) == (milli > 0),
        s"doc ${r.getLong(0)}: keep disagrees with integer-sum recompute")
      val want = math.floor(milli.toDouble / (1000.0 * toks.length) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(2) == want,
        s"doc ${r.getLong(0)}: logit ${r.getDouble(2)} != $want")
    }

    // One linear scan: the only exchange in the plan is the final
    // total-order sort the driver compare requires.
    val exchanges = PlanFlatten.flatten(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exchanges <= 1, s"classifier scan must not shuffle, saw $exchanges exchanges")
  }
}
