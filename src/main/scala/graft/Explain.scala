package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the phases of one named SparkEntry query — plan
  * construction (builder fn), analysis+optimization (explain), and two
  * executions (first = with codegen/exchange warm-up, second = steady
  * state); set SPARK_GRAFT_PLAN=1 to also print the formatted physical
  * plan. Distinguishes
  * "the data side is slow" from "the plan side is slow" (Catalyst
  * analysis over deeply nested lineage has dominated more than one
  * query here; see graph_triangle_count's localCheckpoint note).
  *
  * Usage: sbt "runMain graft.Explain <queryName> [sfDir]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000
    // Stage the family caches first so phase timings measure THIS query,
    // not shared staging (mirrors Bench's stager discipline).
    sys.env.get("SPARK_GRAFT_STAGERS").foreach(_.split(",").foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      System.err.println(s"[explain] stager $n: ${ms(t0)} ms")
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    val tBuild = ms(t0)
    val t1 = System.nanoTime()
    df.queryExecution.executedPlan // forces analysis + optimization + planning
    val tPlan = ms(t1)
    val t2 = System.nanoTime()
    val n = df.count()
    val tExec1 = ms(t2)
    val t3 = System.nanoTime()
    df.count()
    val tExec2 = ms(t3)
    println(s"[explain] $name rows=$n build=${tBuild}ms plan=${tPlan}ms " +
      s"exec1=${tExec1}ms exec2=${tExec2}ms")
    if (sys.env.get("SPARK_GRAFT_PLAN").contains("1")) df.explain("formatted")
    spark.stop()
  }
}
