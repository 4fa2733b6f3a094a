package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC feed must keep every merge arm REACHABLE — a review round
  * found the original key arithmetic left the insert arm dead in both
  * engines (every change key existed in base), which made that branch
  * untestable by the oracle forever. These assertions pin the key-class
  * coverage so a future reshuffle of the filters cannot silently kill
  * an arm again.
  */
class CdcFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge exercises insert, update, delete and keep") {
    val df = SparkEntry.queries("pipeline_merge_upsert")(spark, sf)
    val actions = df.groupBy("action").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.getOrElse("inserted", 0L) > 0, s"insert arm dead: $actions")
    assert(actions.getOrElse("updated", 0L) > 0, s"update arm dead: $actions")
    assert(actions.getOrElse("kept", 0L) > 0, s"keep arm dead: $actions")

    // Deletes are observable as matched base keys absent from the
    // output: keys ≡ 0 (mod 20) are in base (0 mod 4) and marked 'D'.
    val out = df.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val deleted = graft.queries.QDef.t(spark, sf, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty && deleted.forall(!out.contains(_)),
      s"delete arm dead: ${deleted.size} deletable keys, overlap ${(deleted & out).size}")

    // Delete-of-absent is a no-op, not an insert: keys ≡ 10 (mod 20)
    // are outside base (2 mod 4) and marked 'D' — they must not appear.
    val absentDeletes = graft.queries.QDef.t(spark, sf, "orders")
      .filter(col("o_orderkey") % 20 === 10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(absentDeletes.nonEmpty && absentDeletes.forall(!out.contains(_)),
      "delete-of-absent rows leaked into the merge output")
  }

  test("streaming incremental apply equals the one-shot merge") {
    val once = SparkEntry.queries("pipeline_merge_upsert")(spark, sf)
      .select("o_orderkey", "status", "price")
    val streamed = SparkEntry.queries("stream_foreach_batch_upsert")(spark, sf)
    assert(streamed.exceptAll(once).isEmpty && once.exceptAll(streamed).isEmpty,
      "incremental CDC apply diverged from the one-shot merge")
  }
}
