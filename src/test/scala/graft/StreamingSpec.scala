package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamRuns

/** Streaming behaviors the DuckDB oracles cannot see: that the file
  * ingest is actually incremental (multiple micro-batches) and that the
  * watermark actually drops stragglers (not just filters them at the
  * end). Oracle value-parity for all six stream_* queries is covered by
  * the driver gate.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("file ingest processes a 4-file source in >= 2 micro-batches") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val src = StreamRuns.stageAsFiles(docs, "spec-ingest", 4)
    val batches = new AtomicInteger(0)
    val rows = new AtomicInteger(0)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 2).parquet(src)
      .writeStream
      .option("checkpointLocation", StreamRuns.fresh("spec-ingest-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.incrementAndGet()
        rows.addAndGet(b.count().toInt)
        ()
      }
      .start()
    q.awaitTermination()
    assert(batches.get() >= 2, s"expected incremental batches, got ${batches.get()}")
    assert(rows.get() == docs.count())
  }

  test("two-phase watermark run emits fewer rows than an unwatermarked batch would") {
    val fn = graft.SparkEntry.queries("stream_late_data")
    val emitted = fn(spark, sf).count()
    val all = spark.read.parquet(s"$sf/events.parquet").count()
    // Open windows near the stream head plus dropped stragglers mean the
    // append-mode sink must hold strictly fewer rows than events exist.
    assert(emitted > 0 && emitted < all)
  }
}
