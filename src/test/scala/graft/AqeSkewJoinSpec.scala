package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's automatic skew-join handling — the runtime complement of the
  * manual salting in join_skew_salted: a hot key whose shuffle
  * partition dwarfs the others is split into multiple reducer tasks at
  * runtime (OptimizeSkewedJoin), without changing the query. Asserted
  * by the isSkewJoin flag on the executed sort-merge join.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed partition in a sort-merge join") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Local-scale thresholds: any partition 2x the median and over
      // 32KB counts as skewed; keep partitions coalescible otherwise.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    graft.SparkConfs.withConfs(spark, confs) {
      // 90% of left rows share one key; right side is uniform.
      val dir = graft.streaming.StreamRuns.fresh("skew-src")
      spark.range(200000)
        .select(when(pmod(col("id"), lit(10)) < 9, lit(7L))
            .otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pad"))
        .write.mode("overwrite").parquet(s"$dir/left")
      spark.range(5000).select(col("id").as("k"), col("id").as("v"))
        .write.mode("overwrite").parquet(s"$dir/right")
      val df = spark.read.parquet(s"$dir/left").hint("merge")
        .join(spark.read.parquet(s"$dir/right"), "k")
        .agg(count(lit(1)).as("n"))
      assert(df.collect().head.getLong(0) > 0)
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // The SMJ lives inside materialized QueryStageExec subtrees that
      // collect() does not traverse — assert on the rendered tree.
      val tree = plan.treeString
      assert(tree.contains("SortMergeJoin(skew=true)"),
        s"expected OptimizeSkewedJoin to mark the join skewed:\n$tree")
      assert(tree.contains("skewed"),
        s"expected an AQEShuffleRead with skewed splits:\n$tree")
    }
  }
}
