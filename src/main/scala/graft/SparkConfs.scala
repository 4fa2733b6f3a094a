package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides: snapshot, set, run, restore —
  * unsetting keys that had no previous value. Used by the streaming
  * harness, the runtime-filter query, and the AQE specs. NOTE: a
  * lazily-planned DataFrame must force whatever reads the conf (e.g.
  * `df.queryExecution.optimizedPlan`, or `start()` for a stream)
  * BEFORE the body returns, or the restored values win.
  */
object SparkConfs {
  def withConfs[T](spark: SparkSession, confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
