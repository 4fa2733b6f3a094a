package graft

import org.scalatest.funsuite.AnyFunSuite

/** join_dpp must prune at RUNTIME: the selective predicate lives on the
  * dim side, so the fact scan's partition filter has to be a
  * DynamicPruningExpression fed by the dim's broadcast — and after
  * execution only the partitions the filtered dim joins to (click,
  * purchase) may survive file selection.
  */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("dim-side predicate prunes fact partitions at runtime") {
    val df = SparkEntry.queries("join_dpp")(spark, sf)
    // collect() (not count()) so the assertions below read the SAME
    // QueryExecution that ran — count() builds its own plan and would
    // leave this one's metrics empty.
    assert(df.collect().length == 2) // click + purchase groups; finalizes AQE
    // After execution the AQE plan holds materialized QueryStageExec
    // nodes, which are LEAVES — collect() stops at them, so the tree
    // must be flattened through stage/reuse boundaries (PlanFlatten).
    val plan = df.queryExecution.executedPlan
    val scans = PlanFlatten.flatten(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.requiredSchema.fieldNames.contains("value") => f
    }
    assert(scans.nonEmpty, s"expected the fact FileSourceScanExec in:\n$plan")
    val scan = scans.head
    val dynamic = scan.partitionFilters.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression => true
      case _ => false
    })
    assert(dynamic,
      s"fact partition filter must be dynamic (dim-fed), got: ${scan.partitionFilters}")
    // selectedPartitions is the STATIC selection (all 5 directories);
    // runtime pruning shows up in the scan's numPartitions metric once
    // the query has executed.
    assert(scan.metrics("numPartitions").value == 2,
      s"expected only the click+purchase partitions to be read, got " +
        s"${scan.metrics("numPartitions").value}")
  }
}
