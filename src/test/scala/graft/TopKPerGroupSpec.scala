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
