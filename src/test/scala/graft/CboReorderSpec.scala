package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization surface (SURVEY §4): with column statistics
  * ANALYZEd into the catalog and CBO enabled, Catalyst's
  * CostBasedJoinReorder rewrites a syntactically bad join chain — the
  * selective dimension joined LAST in the SQL text — into the
  * cheapest order. This is the optimizer behavior a 100 TB warehouse
  * leans on when humans (or BI tools) write joins in arbitrary order;
  * the spec pins that the engine's tables + stats actually feed it.
  */
class CboReorderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Depth-first catalog-table leaf order of the join tree. */
  private def leafOrder(plan: LogicalPlan): Seq[String] =
    plan.collectLeaves().flatMap(_.collectFirst {
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        r.tableMeta.identifier.table
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table).getOrElse("?")
    })

  private def ensureTables(): Seq[String] = {
    val names = Seq("lineitem", "orders", "supplier").map(t => s"graft_cbo_$t")
    val missing = names.exists(n => !spark.catalog.tableExists(n))
    if (missing) {
      Seq("lineitem", "orders", "supplier").zip(names).foreach {
        case (src, tbl) =>
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
          val loc = new java.io.File(
            if (wh.getScheme == null) wh.toString
            else new java.io.File(wh).toString, tbl)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          if (loc.exists()) rm(loc)
          spark.read.parquet(s"$sf/$src.parquet")
            .write.mode("overwrite").format("parquet").saveAsTable(tbl)
          spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }
    names
  }

  // The selective supplier filter is joined LAST in the text: without
  // CBO the optimizer keeps ((lineitem ⋈ orders) ⋈ supplier); with
  // stats it should start from the filtered dimension instead.
  private def query(names: Seq[String]): String = {
    val Seq(li, ord, sup) = names
    s"""SELECT o.o_orderpriority, count(*) AS n
       FROM $li l
       JOIN $ord o ON l.l_orderkey = o.o_orderkey
       JOIN $sup s ON l.l_suppkey = s.s_suppkey
       WHERE s.s_nationkey = 0
       GROUP BY o.o_orderpriority"""
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE statistics reach the optimizer") {
    val names = ensureTables()
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val plan = spark.table(names.head).queryExecution.optimizedPlan
      val rc = plan.stats.rowCount
      assert(rc.isDefined && rc.get.toLong > 0,
        "catalog column stats must surface as a row count under CBO")
    }
  }

  test("CBO join reorder starts from the selective dimension") {
    val names = ensureTables()
    val off = withConfs(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false") {
      // A fresh Dataset per conf setting: QueryExecution caches per df.
      leafOrder(spark.sql(query(names)).queryExecution.optimizedPlan)
    }
    val on = withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      leafOrder(spark.sql(query(names)).queryExecution.optimizedPlan)
    }
    assert(off === Seq(s"graft_cbo_lineitem", s"graft_cbo_orders",
      s"graft_cbo_supplier"), s"syntactic order expected without CBO, got $off")
    assert(on !== off,
      s"CBO must reorder the join chain; still syntactic: $on")
    // The filtered supplier must participate before the wide
    // lineitem-orders join materializes.
    assert(on.indexOf("graft_cbo_supplier") < on.indexOf("graft_cbo_orders"),
      s"selective dimension should join before orders, got $on")
  }
}
