package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k operator must (1) plan as partial -> exchange ->
  * final with no sort anywhere below the final operator, and (2)
  * produce exactly the window row_number result.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("plans as partial/final bounded heaps around one exchange, no sort") {
    GraftExtensions.ensureRegistered(spark)
    val base = spark.read.parquet(s"$sf/part.parquet")
      .select("p_brand", "p_partkey", "p_retailprice")
    val df = graft.plans.TopKPerGroup(
      base, Seq("p_brand"), "p_retailprice", "p_partkey", 3)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val tree = plan.treeString
    assert(tree.contains("TopKPerGroup "), tree)
    assert(tree.contains("TopKPerGroupPartial "), tree)
    assert(tree.contains("Exchange hashpartitioning(p_brand"), tree)
    assert(!tree.contains("Sort "), s"top-k must not sort:\n$tree")
  }

  test("row set equals the window row_number spelling") {
    GraftExtensions.ensureRegistered(spark)
    val base = spark.read.parquet(s"$sf/part.parquet")
      .select("p_brand", "p_partkey", "p_retailprice")
    val native = graft.plans.TopKPerGroup(
        base, Seq("p_brand"), "p_retailprice", "p_partkey", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val windowed = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native == windowed)
    assert(native.nonEmpty)
  }

  test("partial exec flush path: early-emitted candidates still re-prune exactly") {
    // Force the memory-bound flush (heaps drained every 2 distinct
    // groups): the partial may emit MORE than k rows per group, but the
    // union of segment top-k's must still contain the true top-k — a
    // global re-prune of the candidates equals the window spelling.
    GraftExtensions.ensureRegistered(spark)
    val base = spark.read.parquet(s"$sf/part.parquet")
      .select("p_brand", "p_retailprice", "p_partkey")
    base.count()
    val child = base.queryExecution.executedPlan
    def attr(n: String) = child.output.find(_.name == n).get
    val partial = graft.plans.TopKPerGroupPartialExec(
      Seq(attr("p_brand")), attr("p_retailprice"), attr("p_partkey"), 3,
      child, flushGroups = 2)
    val candidates = partial.execute().map(_.copy()).collect().map { r =>
      (r.getUTF8String(0).toString, r.getDouble(1), r.getLong(2))
    }
    val repruned = candidates.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.distinct.sortBy { case (_, v, t) => (-v, t) }.take(3).toSeq
    }.map { case (b, _, t) => (b, t) }.toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val windowed = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(repruned == windowed)
    assert(repruned.nonEmpty)
    // The flush actually happened: an unflushed partial emits at most
    // k rows per (partition, group); 2-group segments over ~25
    // interleaved brands force groups to span segments and emit more.
    val unflushed = graft.plans.TopKPerGroupPartialExec(
      Seq(attr("p_brand")), attr("p_retailprice"), attr("p_partkey"), 3, child)
      .execute().map(_.copy()).collect()
    assert(candidates.length > unflushed.length,
      s"expected early-flushed duplicates beyond ${unflushed.length}")
  }

  test("string-typed order column: values must not alias the reused codegen row") {
    // Regression guard: eval of a non-primitive order/tie type on a
    // reused UnsafeRow returns a buffer view; stored heap entries must
    // re-evaluate from their own copied row or comparisons corrupt.
    GraftExtensions.ensureRegistered(spark)
    val base = spark.read.parquet(s"$sf/part.parquet")
      .select("p_brand", "p_partkey", "p_name")
    val native = graft.plans.TopKPerGroup(
        base, Seq("p_brand"), "p_name", "p_partkey", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("p_name").desc, col("p_partkey"))
    val windowed = base
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native == windowed)
    assert(native.nonEmpty)
  }
}
