package graft

import org.scalatest.funsuite.AnyFunSuite

/** scan_partition_pruned must actually prune: the partition filter
  * eliminates directories at listing time, the residual predicate is
  * pushed to the parquet reader, and the read schema carries only the
  * projected columns. Asserted against the executed plan (post-AQE).
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partition filter prunes directories; residual + projection push down") {
    val df = SparkEntry.queries("scan_partition_pruned")(spark, sf)
    assert(df.count() > 0) // finalize AQE so the real plan is inspectable
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"expected a FileSourceScanExec in:\n$plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.map(_.name).exists(_ == "event_type")),
      s"partition filter on event_type must prune at listing time:\n$scan")
    // Directory pruning is observable, not just planned: only the one
    // matching partition's files survive selection.
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected exactly the click partition, got ${scan.selectedPartitions.partitionCount}")
    assert(scan.metadata("PushedFilters").contains("GreaterThan(value,100.0)"),
      s"residual predicate must reach the parquet reader: ${scan.metadata("PushedFilters")}")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols == Set("event_id", "user_id", "value"),
      s"read schema must carry only the projection: $readCols")
  }

  test("nested-struct scan prunes to the referenced leaves only") {
    val df = SparkEntry.queries("scan_nested_pushdown")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"expected a FileSourceScanExec in:\n$plan")
    val meta = scans.head.requiredSchema.fields
      .find(_.name == "meta").map(_.dataType)
    val metaFields = meta match {
      case Some(st: org.apache.spark.sql.types.StructType) =>
        st.fieldNames.toSet
      case other => fail(s"expected pruned struct meta, got $other")
    }
    // Only the filtered leaf (lang) and the projected branch (origin)
    // may survive; reading text/n_chars would defeat nested pruning.
    assert(metaFields == Set("lang", "origin"),
      s"nested schema must prune to referenced leaves: $metaFields")
  }
}
