package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSigExpr, Text}

/** Pins the native MinHash signature kernel to BOTH pre-existing
  * spellings of the same computation on real corpus data, plus the
  * null/empty contract — the kernel now feeds the staged band index
  * every LSH dedup query shares, so drift here would silently move
  * every candidate set.
  */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def h0s = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("tks", Text.tokens(
        lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .withColumn("h0s", transform(Text.shingles(col("tks"), 3),
        x => Text.md5Hash32(x)))
      .filter(size(col("h0s")) > 0)
      .select(col("doc_id"), col("h0s"))
  }

  test("kernel == HOF fold == explode+groupBy min, on the real corpus") {
    val ks = typedLit((0 until 16).map(_.toLong))
    val fold = aggregate(col("h0s"),
      typedLit(Seq.fill(16)(Long.MaxValue)),
      (acc, h) => zip_with(acc, ks, (a, k) =>
        least(a, (h * (k * 2L + lit(1L)) + k * lit(2654435761L))
          % lit(2147483647L))))
    val both = h0s
      .select(col("doc_id"),
        MinHashSigExpr.sig(col("h0s")).as("native"), fold.as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"native vs HOF drift on doc ${r.getLong(0)}")
    }
    // Third spelling: per-(doc, k) explode + min aggregate.
    val viaGroup = h0s
      .select(col("doc_id"), explode(col("h0s")).as("h0"))
      .select(col("doc_id"), col("h0"),
        explode(lit((0 until 16).toArray)).as("k"))
      .groupBy("doc_id", "k")
      .agg(min((col("h0") * (col("k") * 2 + 1) + col("k") * lit(2654435761L))
        % lit(2147483647L)).as("h"))
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("k"), col("h")))),
        x => x.getField("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    both.foreach { r =>
      assert(viaGroup(r.getLong(0)) == r.getSeq[Long](1),
        s"native vs groupBy drift on doc ${r.getLong(0)}")
    }
  }

  test("fused shingle kernel == md5-HOF chain + sig kernel, on the corpus") {
    val both = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("tks", Text.tokens(
        lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .filter(size(col("tks")) >= 3)
      .select(col("doc_id"),
        graft.functions.ShingleMinHashExpr.sig(col("tks")).as("fused"),
        MinHashSigExpr.sig(transform(Text.shingles(col("tks"), 3),
          x => Text.md5Hash32(x))).as("chained"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"fused vs chained drift on doc ${r.getLong(0)}")
    }
  }

  test("raw-hash kernel == md5-HOF transform, on the corpus") {
    val both = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("tks", Text.tokens(
        lower(trim(regexp_replace(col("text"), "\\s+", " ")))))
      .select(col("doc_id"),
        graft.functions.ShingleHash32Expr.hashes(col("tks")).as("fused"),
        transform(Text.shingles(col("tks"), 3),
          x => Text.md5Hash32(x)).as("chained"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"raw-hash drift on doc ${r.getLong(0)}")
    }
  }

  test("fused kernel contract: short/null-token/null arrays") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "tks")
      .union(Seq((2L, null.asInstanceOf[Seq[String]])).toDF("id", "tks"))
      .union(spark.sql("SELECT 3L AS id, array('a', CAST(NULL AS STRING), 'c') AS tks"))
    val out = df.select(col("id"),
        graft.functions.ShingleMinHashExpr.sig(col("tks")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(1) == Seq.fill(16)(Long.MaxValue), "under-3-token -> init")
    assert(out(2) == null, "null array -> null")
    assert(out(3) == null, "null token -> refuse, never skip")
  }

  test("null and empty contract matches the HOF fold") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(7L, 11L)),
      (2L, Seq.empty[Long])
    ).toDF("id", "h0s")
      .union(Seq((3L, null.asInstanceOf[Seq[Long]])).toDF("id", "h0s"))
      .union(spark.sql("SELECT 4L AS id, array(5L, CAST(NULL AS BIGINT)) AS h0s"))
    val out = df.select(col("id"), MinHashSigExpr.sig(col("h0s")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(2) == Seq.fill(16)(Long.MaxValue), "empty -> fold init")
    assert(out(3) == null, "null array -> null")
    assert(out(4) == null, "null element -> absorbing null")
    assert(out(1).length == 16 && out(1).forall(_ >= 0L))
  }
}
