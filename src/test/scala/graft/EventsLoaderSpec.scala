package graft

import java.sql.Timestamp

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QDef

/** The events loader must absorb every parquet physical encoding of `ts`
  * the testdata generator has produced. Round 8 hard-assumed
  * TIMESTAMP(NANOS) and lost 53 queries when the driver regenerated the
  * data as timestamp[us]; this spec pins the schema-adaptive read against
  * committed golden fixtures of all three observed/possible encodings:
  *   - golden/nanos:    TIMESTAMP(NANOS)    (legacy: raw long + div 1000)
  *   - golden/micros:   timestamp[us]       (TIMESTAMP_NTZ -> cast)
  *   - golden/microstz: timestamp[us, UTC]  (TimestampType pass-through)
  * All three hold the same instant 2024-03-01T12:34:56.789123Z (the nanos
  * file adds 999 ns on row 2 to prove sub-micro truncation), so the
  * loader's output must be byte-identical across eras.
  */
class EventsLoaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val golden =
    new java.io.File("src/test/resources/golden").getAbsolutePath

  // Epoch micros of 2024-03-01T12:34:56.789123Z, as written by the
  // fixture generator.
  private val micros = 1709296496789123L

  private def check(era: String): Unit = {
    val df = QDef.t(spark, s"$golden/$era", "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"$era: loader must resolve ts to the session TimestampType")
    val rows = df.orderBy("event_id").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val ts = r.getAs[Timestamp]("ts")
      val got = ts.getTime * 1000 + (ts.getNanos % 1000000) / 1000
      assert(got == micros,
        s"$era: ts must be the fixture instant at micro precision, got $got want $micros")
    }
  }

  test("events loader reads the legacy TIMESTAMP(NANOS) encoding") {
    // Pre-flight: the fixture really is the long-resolving nanos form
    // (otherwise this case silently degenerates into the micros test).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$golden/nanos/events.parquet")
    assert(raw.schema("ts").dataType == LongType,
      "golden/nanos fixture must store TIMESTAMP(NANOS)")
    check("nanos")
  }

  test("events loader reads the timestamp[us] (NTZ) encoding") { check("micros") }

  test("events loader reads the timestamp[us, UTC] encoding") { check("microstz") }

  test("loader output is identical across encodings") {
    val a = QDef.t(spark, s"$golden/nanos", "events")
    val b = QDef.t(spark, s"$golden/micros", "events")
    val c = QDef.t(spark, s"$golden/microstz", "events")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "nanos and micros eras must load to identical rows")
    assert(b.exceptAll(c).isEmpty && c.exceptAll(b).isEmpty,
      "NTZ and UTC-adjusted eras must load to identical rows")
  }

  test("orders/lineitem date columns normalize to TIMESTAMP_NTZ in every era") {
    // The TPC-H date columns share events.ts's risk class (the same
    // testdata regeneration rewrites them); their target type is NTZ —
    // what today's timestamp[us] files resolve to and what every green
    // oracle hash was taken against.
    for ((tbl, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val n = QDef.t(spark, s"$golden/nanos", tbl)
      val m = QDef.t(spark, s"$golden/micros", tbl)
      assert(n.schema(c).dataType == TimestampNTZType &&
        m.schema(c).dataType == TimestampNTZType,
        s"$tbl.$c must normalize to TIMESTAMP_NTZ")
      assert(n.exceptAll(m).isEmpty && m.exceptAll(n).isEmpty,
        s"$tbl.$c eras must load to identical rows")
      val v = m.orderBy("id").collect().head.getAs[java.time.LocalDateTime](c)
      assert(v.toInstant(java.time.ZoneOffset.UTC).toEpochMilli == micros / 1000,
        s"$tbl.$c must hold the fixture instant")
    }
  }
}
