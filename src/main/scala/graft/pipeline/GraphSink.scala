package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sink interface for the labeled property graph — nodes(label, key,
  * uri) and edges(src, dst, type) as produced by [[Graph]]. Two
  * implementations: the partitioned-parquet sink the offline pipeline
  * uses, and a Bolt-protocol writer (json_to_db.py:78-127) whose
  * connection layer is injected so the Spark-side plumbing — per-
  * partition sessions, statement batching, UNWIND parameter shape — is
  * real and unit-testable without a live server.
  */
trait GraphSink {
  def write(nodes: DataFrame, edges: DataFrame): Unit
}

/** O29 offline sink: one parquet dataset per label/type partition. */
final class ParquetGraphSink(outDir: String) extends GraphSink {
  override def write(nodes: DataFrame, edges: DataFrame): Unit =
    Graph.writeGraph(nodes, edges, outDir)
}

object BoltGraphSink {

  /** The injected connection surface: one session per partition, one
    * `run` per batched statement. A real deployment backs this with the
    * Neo4j Bolt driver (`session.run(cypher, params)`); tests back it
    * with a recording fake. Implementations are created ON THE EXECUTOR
    * by the factory closure, never serialized themselves.
    */
  trait BoltSession extends AutoCloseable {
    def run(cypher: String, rows: Seq[Map[String, String]]): Unit
  }

  /** Batched MERGE for one node label — a single round-trip per batch
    * via UNWIND, replacing the reference's transaction-per-node loop
    * (json_to_db.py:81-95: one execute_write per document, per author,
    * per term...). MERGE on the key keeps the reference's idempotent
    * re-run semantics.
    */
  def nodeCypher(label: String): String =
    s"UNWIND $$rows AS row MERGE (n:`$label` {key: row.key}) " +
      "ON CREATE SET n.uri = row.uri"

  /** Batched MERGE for one edge type (json_to_db.py:46-77). */
  def edgeCypher(tpe: String): String =
    s"UNWIND $$rows AS row MATCH (a {key: row.src}) " +
      s"MATCH (b {key: row.dst}) MERGE (a)-[:`$tpe`]->(b)"
}

/** Bolt graph writer: `foreachPartition` opens one session per
  * partition, groups rows by label/type, and ships them in batches of
  * `batchSize` as parameterized UNWIND statements. Nodes are fully
  * written before edges (the edge MATCH side requires them), mirroring
  * the reference's create-then-relate order with two distributed passes
  * instead of a driver loop.
  *
  * @param newSession serializable factory invoked per partition on the
  *        executor — the only thing shipped is the closure, so the
  *        non-serializable driver/connection objects stay executor-local.
  */
final class BoltGraphSink(
    newSession: () => BoltGraphSink.BoltSession,
    batchSize: Int = 500) extends GraphSink with Serializable {
  import BoltGraphSink._

  private def push(df: DataFrame, groupCol: String,
      cypher: String => String, fields: Seq[String]): Unit = {
    val factory = newSession
    val bs = batchSize
    df.select((groupCol +: fields).map(col): _*)
      .rdd.foreachPartition { it: Iterator[Row] =>
        val sess = factory()
        try {
          it.grouped(bs).foreach { chunk =>
            chunk.groupBy(_.getString(0)).foreach { case (group, rows) =>
              sess.run(cypher(group),
                rows.map(r => fields.zipWithIndex.map { case (f, i) =>
                  f -> Option(r.get(i + 1)).map(String.valueOf).orNull
                }.toMap).toSeq)
            }
          }
        } finally sess.close()
      }
  }

  override def write(nodes: DataFrame, edges: DataFrame): Unit = {
    push(nodes, "label", nodeCypher, Seq("key", "uri"))
    push(edges, "type", edgeCypher, Seq("src", "dst"))
  }
}
