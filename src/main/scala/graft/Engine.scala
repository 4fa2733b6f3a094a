package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{Classify, Graph, NestedEnrich, XmlDocs}

/** User-facing facade: the reference's whole surface
  * (`run_pipeline.py <dir> [files…]`, run_pipeline.py:34-77) as one
  * object. A reference user switches by calling `run` (batch) or
  * `runIncremental` (per-file streaming ≙ the reference's
  * ProcessPoolExecutor fan-out, run_pipeline.py:105-109) — the four
  * subprocess stages and their disk IPC collapse into one lazy plan:
  *
  *   ingest (xml_to_json) -> enrich + URIs (json_classification,
  *   generate_uri) -> graph build + partitioned sink (json_to_db).
  */
final class Engine(
    spark: SparkSession,
    classifier: Classify.Classifier = Classify.RuleClassifier) {

  /** Stage 1 (O1-O8): XML corpus → nested document model (B1). */
  def ingest(path: String): DataFrame =
    XmlDocs.toDocModel(XmlDocs.read(spark, path))

  /** Stages 2-3 (O12-O24): classify, precedence, convert names, URIs. */
  def enrich(docs: DataFrame): DataFrame =
    NestedEnrich.addUris(NestedEnrich.enrich(docs, classifier))

  /** Stage 4 (O25-O29): labeled property graph from the doc model. */
  def graph(docs: DataFrame): (DataFrame, DataFrame) = {
    val flat = XmlDocs.toFlatDocs(docs)
    val triples = XmlDocs.toTriples(docs)
    val known = Classify.knownEntities(flat)
    val api = Classify.apiMap(Classify.allTerms(triples), known, classifier)
    val labeled = Classify.labelTriples(triples, known, api)
    (Graph.nodes(flat, labeled), Graph.edges(flat, labeled))
  }

  /** Full batch pipeline: enriched doc-model JSON + partitioned graph
    * parquet under outDir; returns (docs, nodes, edges) row counts.
    */
  def run(xmlPath: String, outDir: String): (Long, Long, Long) = {
    val docs = ingest(xmlPath)
    val enriched = enrich(docs)
    enriched.write.mode("overwrite").json(s"$outDir/documents")
    val (nodes, edges) = graph(docs)
    Graph.writeGraph(nodes, edges, outDir)
    (spark.read.schema(enriched.schema).json(s"$outDir/documents").count(),
      spark.read.parquet(s"$outDir/nodes").count(),
      spark.read.parquet(s"$outDir/edges").count())
  }

  /** Incremental variant: newly arriving XML files flow through the
    * same batch stage functions inside foreachBatch; graph deltas
    * append to the sink (MERGE-keyed dedup happens inside each batch;
    * cross-batch idempotency = downstream dropDuplicates on read, the
    * documented lakehouse-MERGE stand-in — SURVEY §1.3).
    */
  def runIncremental(xmlDir: String, outDir: String, checkpoint: String,
      filesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .format("xml")
      .option("rowTag", "document")
      .option("maxFilesPerTrigger", filesPerTrigger)
      .schema(XmlDocs.xmlSchema)
      .load(xmlDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (raw: DataFrame, _: Long) =>
        val docs = XmlDocs.toDocModel(raw)
        enrich(docs).write.mode("append").json(s"$outDir/documents")
        val (nodes, edges) = graph(docs)
        nodes.write.mode("append").partitionBy("label").parquet(s"$outDir/nodes")
        edges.write.mode("append").partitionBy("type").parquet(s"$outDir/edges")
      }
      .start()
}

/** CLI mirror of `python3 run_pipeline.py <dir> [files…]`
  * (run_pipeline.py:117-123): `graft.RunPipeline <xmlDirOrFile> <outDir>
  * [--incremental]`. With a directory and no explicit files, globs
  * *.xml (O31, run_pipeline.py:98-102).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.RunPipeline <xmlDirOrFile> <outDir> [--incremental]")
    val (in, outDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val path =
      if (new java.io.File(in).isDirectory) s"$in/*.xml" else in
    val engine = new Engine(spark)
    if (args.contains("--incremental")) {
      val q = engine.runIncremental(path, outDir, s"$outDir/_checkpoint")
      q.awaitTermination()
    } else {
      val (d, n, e) = engine.run(path, outDir)
      println(s"""{"documents":$d,"nodes":$n,"edges":$e}""")
    }
  }
}
