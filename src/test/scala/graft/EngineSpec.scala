package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Corpus, XmlDocs}
import graft.streaming.StreamRuns

/** The user-facing Engine facade end-to-end on reference-shaped XML:
  * batch run produces documents + graph, re-run is idempotent, and the
  * incremental (streaming) variant reaches the same document set.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def stageXml(tag: String): String = {
    val docs = Corpus.flatDocs(spark, sf).orderBy("documentID").limit(60)
    val trip = Corpus.indexTriples(spark, sf)
      .join(docs.select("documentID"), Seq("documentID"))
    val dir = StreamRuns.fresh(tag)
    XmlDocs.writeCorpusXml(docs, trip, s"$dir/corpus.xml")
    dir
  }

  test("batch run: documents + partitioned graph, idempotent re-run") {
    val xmlDir = stageXml("engine-batch")
    val out = StreamRuns.fresh("engine-out")
    val engine = new Engine(spark)
    val (d, n, e) = engine.run(s"$xmlDir/*.xml", out)
    assert(d == 60 && n > 0 && e > 0)
    // MERGE idempotency (SURVEY §2.3-7): same input, same graph.
    val (d2, n2, e2) = engine.run(s"$xmlDir/*.xml", out)
    assert((d2, n2, e2) == ((d, n, e)))
    // Partitioned sink layout (O29).
    assert(new java.io.File(s"$out/nodes").listFiles()
      .exists(_.getName.startsWith("label=")))
  }

  test("incremental run reaches the batch document set") {
    val xmlDir = stageXml("engine-inc")
    val out = StreamRuns.fresh("engine-inc-out")
    val q = new Engine(spark)
      .runIncremental(s"$xmlDir/*.xml", out, s"$out/_ckpt")
    q.awaitTermination()
    val streamed = spark.read.json(s"$out/documents")
    assert(streamed.select("documentID").distinct().count() == 60)
    assert(spark.read.parquet(s"$out/nodes")
      .filter(col("label") === "Document").count() == 60)
  }
}
