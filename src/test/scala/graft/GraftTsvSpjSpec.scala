package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned read contract of graft-tsv: a writePartitioned
  * generation is one single-lang file set per lang with v2-stamped
  * headers; the scan reports KeyGroupedPartitioning(identity(lang)), so
  * with v2 bucketing enabled a lang-keyed aggregate-join DAG over two
  * such tables plans with NO shuffle exchange anywhere — the
  * Iceberg-style storage-partitioned join on a custom source.
  */
class GraftTsvSpjSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def stage(): (String, String) = {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("spj").toString
    val (a, b) = (s"$base/a", s"$base/b")
    val docs = graft.queries.QDef.t(spark, sf, "documents")
    graft.sources.GraftTsv.writePartitioned(docs, a, 4)
    graft.sources.GraftTsv.writePartitioned(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0), b, 4)
    (a, b)
  }

  test("partitioned generation: single-lang files, key-grouped scan, no-shuffle SPJ") {
    import org.apache.spark.sql.functions._
    val (a, b) = stage()
    // Save/restore rather than unset: the flag is a session DEFAULT now
    // (SparkTestSession), and unsetting would strip it for later suites.
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val left = spark.read.format("graft-tsv").load(a)
        .groupBy("lang").agg(count(lit(1)).as("n_all"),
          sum("n_chars").as("chars_all"))
      val right = spark.read.format("graft-tsv").load(b)
        .groupBy("lang").agg(count(lit(1)).as("n_even"))
      val joined = left.join(right, "lang").orderBy("lang")
      val rows = joined.collect()
      assert(rows.nonEmpty, "join must produce one row per lang")

      // Correctness against the parquet source of truth.
      val docs = graft.queries.QDef.t(spark, sf, "documents")
      val want = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_all"), sum("n_chars").as("chars_all"))
        .join(docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
          .groupBy("lang").agg(count(lit(1)).as("n_even")), "lang")
        .orderBy("lang").collect()
      assert(rows.toSeq == want.toSeq)

      // The scale claim: zero shuffles in the whole DAG up to the join
      // (the final orderBy range exchange is outside the join subtree).
      val nodes = PlanFlatten.flatten(joined.queryExecution.executedPlan)
      val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 1,
        s"expected only the output sort exchange, saw ${shuffles.size}")
      val joinNodes = nodes.filter(_.getClass.getSimpleName.contains("Join"))
      assert(joinNodes.nonEmpty, "expected a join operator")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("lang equality prunes whole files by header partition value") {
    import org.apache.spark.sql.functions._
    val (a, _) = stage()
    val hs = graft.sources.GraftTsv.listGtsv(a)
      .map(graft.sources.GraftTsv.readHeader)
    assert(hs.nonEmpty && hs.forall(_.pv.isDefined),
      "partitioned generation must stamp every file")
    val enFiles = hs.count(_.pv.contains("en"))
    assert(enFiles >= 1 && enFiles < hs.size,
      "need a pruning opportunity: some but not all files are en")

    val before = graft.sources.GraftTsv.filesOpened.get()
    val rows = spark.read.format("graft-tsv").load(a)
      .filter(col("lang") === "en")
      .select("doc_id", "lang", "n_chars").collect()
    val opened = graft.sources.GraftTsv.filesOpened.get() - before
    assert(opened == enFiles,
      s"expected only the $enFiles en files opened, saw $opened")
    val want = graft.queries.QDef.t(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(rows.length == want)
  }
}
