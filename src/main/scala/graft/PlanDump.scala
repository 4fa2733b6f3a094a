package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-18 optimization): batch [[Explain]] — for each named
  * query, time build/plan/exec1/exec2 in ONE shared JVM (so later
  * queries see a warm JIT, like a full bench run does) and write the
  * formatted physical plan to `plans/<round>/<name>_<suffix>.txt` for
  * the plan-claims record. Not part of the driver contract.
  *
  * Usage: sbt "runMain graft.PlanDump <suffix> <name1,name2,...> [sfDir]"
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_STAGERS (optional
  * comma list run un-timed first), SPARK_GRAFT_PLANDIR (default
  * /root/repo/plans/r18).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_PLANDIR", "/root/repo/plans/r18")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.warehouse.dir", "/root/repo/target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000
    sys.env.get("SPARK_GRAFT_STAGERS").foreach(_.split(",").foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      System.err.println(s"[plandump] stager $n: ${ms(t0)} ms")
    })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    names.foreach { name =>
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        val n = df.count()
        val tExec1 = ms(t2)
        val t3 = System.nanoTime()
        df.count()
        val tExec2 = ms(t3)
        val exch = plan.split('\n').count(l =>
          l.contains("Exchange") && !l.contains("ReusedExchange"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$planDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $name rows=$n build=${tBuild}ms plan=${tPlan}ms " +
          s"exec1=${tExec1}ms exec2=${tExec2}ms exchanges=$exch")
      } catch { case t: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
