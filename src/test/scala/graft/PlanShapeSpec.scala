package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape of the round-6 scale operators: the claims the
  * Scaladocs make ("broadcast ADC lookup", "equi-join rounds, never a
  * cross product") asserted against the executed plans, so a future
  * refactor that silently degrades one to a shuffle or a cartesian
  * fails here instead of at 100 TB.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sim_ann_pq scores codes against a BROADCAST lookup table") {
    val df = SparkEntry.queries("sim_ann_pq")(spark, sf)
    assert(df.collect().nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "ADC lookup join must be a broadcast hash join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "PQ scoring must never plan a cartesian product")
  }

  test("graph_pagerank rounds are equi-joins, never cross products") {
    val df = SparkEntry.queries("graph_pagerank")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = PlanFlatten.flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "rank propagation must never plan a cartesian product")
    // Every node keeps at least the teleport mass; total nodes = parts
    // that ship + suppliers (disjoint id spaces).
    assert(rows.forall(_.getLong(1) >= 150000L),
      "every rank must carry at least the teleport term")
  }
}
