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
    val src = StreamRuns.stageAsFiles(docs, "spec-ingest", 4, sf)
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

  test("timer arms: phase-1 fires, merges, and fresh restarts all occur") {
    // TimerArms: the dead-arm guard for stream_timer_timeout's split.
    // Recompute the closed-form arm populations in batch and require
    // every processor path to be reachable — fired phase-1 timers,
    // unfired sessions that MERGE phase-2 rows (exercising deleteTimer
    // re-registration), and fired users whose phase-2 rows restart a
    // fresh session.
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val e = graft.queries.QDef.t(spark, sf, "events")
      .select(col("user_id"), col("ts"))
    val Row2 = e.agg(min(unix_millis(col("ts"))).as("mn"),
      max(unix_millis(col("ts"))).as("mx")).head()
    val (mn, mx) = (Row2.getLong(0), Row2.getLong(1))
    val cut = mn + math.floor((mx - mn) * 0.8).toLong
    val p1 = e.filter(unix_millis(col("ts")) <= cut)
    val p2 = e.filter(unix_millis(col("ts")) > cut)
    val wm1 = p1.agg(max(col("ts"))).head().getTimestamp(0)
    val fired1 = p1.groupBy("user_id").agg(max(col("ts")).as("last1"))
      .withColumn("f",
        col("last1") + expr("INTERVAL 10 MINUTES") <= lit(wm1))
    val firedUsers = fired1.filter(col("f")).select("user_id")
    val openUsers = fired1.filter(!col("f")).select("user_id")
    assert(firedUsers.count() > 0, "no phase-1 timer ever fires")
    assert(openUsers.join(p2, "user_id").count() > 0,
      "merge arm dead: no open session receives phase-2 rows")
    assert(firedUsers.join(p2, "user_id").count() > 0,
      "fresh-restart arm dead: no fired user receives phase-2 rows")
  }

  test("update-mode arms: phase-1-only, touched-total, and re-emit all occur") {
    // Dead-arm guard for stream_update_mode's closed form: groups that
    // emit only in phase 1 (untouched by p2), groups that emit only in
    // phase 2 (new windows past the cut), and at least one group
    // emitted in BOTH batches (the window straddling the cut, whose
    // second emission is the cumulative update append/complete cannot
    // produce).
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("stream_update_mode")(spark, sf)
      .groupBy("w_start", "event_type").agg(count(lit(1)).as("k"))
    assert(out.filter(col("k") === 2).count() >= 1,
      "re-emit arm dead: no group updated across both batches")
    assert(out.filter(col("k") === 1).count() > 0,
      "single-emission arm dead")
  }

  test("streaming restart resumes from the checkpoint with state intact") {
    // Operational contract at 100 TB: a driver restart must neither
    // reprocess consumed input nor lose aggregation state. Run an
    // AvailableNow pass over half the files, stop, drop the second
    // half into the source, restart against the SAME checkpoint: the
    // second run may read only the new files, yet its complete-mode
    // output must equal the batch aggregate over EVERYTHING — which is
    // only possible if the state store recovered from the checkpoint.
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    val e = graft.queries.QDef.t(spark, sf, "events")
      .select(col("event_type"), col("event_id"))
    val h1 = e.filter(col("event_id") % 2 === 0)
    val h2 = e.filter(col("event_id") % 2 =!= 0)
    val src = StreamRuns.fresh("spec-restart-src")
    val ckpt = StreamRuns.fresh("spec-restart-ckpt")
    def dropIn(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val tmp = StreamRuns.fresh(s"spec-restart-$tag")
      df.repartition(2).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.foreach { case (p, i) =>
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(src, s"$tag-$i.parquet"))
        }
    }
    def run(qn: String): Map[String, Long] =
      StreamRuns.withStreamPartitions(spark) {
        val q = spark.readStream.schema(e.schema).parquet(src)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(qn)
          .outputMode("complete").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(qn).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    def batchCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("event_type").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    dropIn(h1, "a")
    assert(run("restart1") == batchCounts(h1),
      "first pass must aggregate exactly the first half")
    dropIn(h2, "b")
    assert(run("restart2") == batchCounts(e),
      "restarted pass must resume state, not restart it")
  }

  test("chained-stateful feed redelivers on both sides of wm1") {
    // Dead-arm guard for stream_chained_stateful: the redelivery feed
    // must exercise BOTH kill paths — arm A (above wm1: only the dedup
    // state carried from phase 1 can drop it) and arm B (at/below wm1:
    // dropped by the late bound / closed-window filter). If either arm
    // is empty the exactly-once claim is untested in that direction.
    val spark2 = spark
    import spark2.implicits._
    val all = graft.queries.QDef.t(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)].collect()
    val (p1, p2, nDupA, nDupB) = graft.queries.Streaming.ChainFeed.split(all)
    assert(nDupA > 0, "arm A dead: no redelivery above wm1")
    assert(nDupB > 0, "arm B dead: no redelivery at/below wm1")
    assert(p1.nonEmpty && p2.size > nDupA + nDupB,
      "phase 2 must also carry original (non-duplicate) rows")
    // Redeliveries must be exact copies of phase-1 rows (same ids).
    val ids1 = p1.map(_.event_id).toSet
    val dupIds = p2.map(_.event_id).groupBy(identity)
      .collect { case (id, xs) if xs.size > 1 => id }
    assert(dupIds.isEmpty, "feed itself must not double-deliver within a phase")
    assert(p2.map(_.event_id).count(ids1) == nDupA + nDupB)
  }

  test("CDC upsert is copy-on-write: untouched buckets keep their files") {
    import graft.queries.StreamCdc
    val snap = graft.streaming.StreamRuns.fresh("upsert-spec-snap")
    StreamCdc.writeBase(spark, sf, snap)
    // Change keys are EVEN (o_orderkey % 2 = 0), so with 16 key
    // buckets every touched bucket is even — the 8 odd buckets must
    // come through the whole stream byte-identical (same part files),
    // or the merge has regressed to a full-snapshot rewrite.
    def files(b: Long): Map[String, Long] = {
      val d = new java.io.File(s"$snap/bk=$b")
      assert(d.isDirectory, s"bucket dir bk=$b missing")
      d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = (1L to 15L by 2).map(b => b -> files(b)).toMap
    StreamCdc.applyFeed(spark, sf, snap)
    (1L to 15L by 2).foreach { b =>
      assert(files(b) == before(b),
        s"bucket bk=$b was rewritten by a batch that touched no key in it")
    }
    // And the incremental application equals the one-shot merge.
    val got = StreamCdc.result(spark, snap).collect().toSeq
    val want = StreamCdc.oneShot(spark, sf).collect().toSeq
    assert(got == want, "incremental CDC diverged from the one-shot merge")
  }
}
