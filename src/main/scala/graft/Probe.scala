package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val name = args.headOption.getOrElse("graph_triangle_count")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      System.err.println(s"[probe] run$i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
