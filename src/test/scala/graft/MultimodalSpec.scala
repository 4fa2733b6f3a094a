package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal
import graft.functions.Multimodal.{MediaRow, StubCodec}

/** Byte-for-byte goldens for the stub codec and the mapPartitions
  * plumbing (schema, batch shape, null/empty payloads).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("StubCodec is a deterministic pure function of the payload") {
    val c = new StubCodec()
    val r = c.decode(MediaRow(7L, "image", "abc".getBytes("UTF-8")))
    // 'a'=97 → width 1+97%64=34; 3 bytes → height 4, frames 1;
    // all three bytes fall in histogram bucket 97>>5 = 3.
    assert(r.n_bytes == 3 && r.width == 34 && r.height == 4 && r.n_frames == 1)
    assert(r.features.toSeq == Seq(0.0, 0.0, 0.0, 3.0, 0.0, 0.0, 0.0, 0.0))
    assert(c.decode(MediaRow(7L, "image", "abc".getBytes("UTF-8"))).features.toSeq
      == r.features.toSeq)
  }

  test("empty payload decodes to zeroed features, not a crash") {
    val r = new StubCodec().decode(MediaRow(1L, "audio", Array.emptyByteArray))
    assert(r.n_bytes == 0 && r.width == 1 && r.n_frames == 1)
    assert(r.features.forall(_ == 0.0))
  }

  test("decodeBatch preserves row count and schema over partitions") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .repartition(4)
      .as[MediaRow]
    val out = Multimodal.decodeBatch(media, () => new StubCodec())
    assert(out.count() == media.count())
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "n_frames", "features"))
    // n_bytes from the codec must agree with the engine-side byte length.
    val mismatch = out.toDF()
      .join(media.toDF(), "media_id")
      .filter(col("n_bytes") =!= length(col("payload")))
      .count()
    assert(mismatch == 0)
  }

  test("PcmEnergyExpr matches the hex/conv built-in spelling frame for frame") {
    import org.apache.spark.sql.functions._
    val m = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val native = m.select(col("doc_id"),
        posexplode(graft.functions.PcmEnergyExpr
          .frameEnergies(col("payload"), lit(32))).as(Seq("fno", "sumsq")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val builtin = m.withColumn("hx", hex(col("payload")))
      .withColumn("nf", greatest(lit(1), ceil(length(col("hx")) / 64.0)).cast("int"))
      .select(col("doc_id"), col("hx"),
        explode(sequence(lit(0), col("nf") - 1)).as("fno"))
      .withColumn("fhx", col("hx").substr(col("fno") * 64 + 1, lit(64)))
      .withColumn("nb", (length(col("fhx")) / 2).cast("int"))
      .filter(col("nb") >= 1)
      .withColumn("sumsq", aggregate(
        transform(sequence(lit(0), col("nb") - 1),
          i => {
            val b = conv(col("fhx").substr(i * 2 + 1, lit(2)), 16, 10)
              .cast("long") - lit(128L)
            b * b
          }),
        lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"), col("fno"), col("sumsq"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == builtin,
      "native PCM energies diverge from the built-in hex/conv spelling")
    assert(native.nonEmpty)
  }

  test("aspect buckets match a brute-force nearest-ratio recompute") {
    val buckets = Seq(("1:1", 1, 1), ("4:3", 4, 3), ("3:4", 3, 4),
      ("16:9", 16, 9), ("9:16", 9, 16), ("3:2", 3, 2), ("2:3", 2, 3))
    val rows = SparkEntry.queries("multimodal_aspect_bucket")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, got) =>
      // Rational nearest-ratio: minimize |p/q - w/h|, first bucket wins
      // ties — recomputed here in exact BigDecimal arithmetic,
      // independently of the engine's integer-key encoding.
      val want = buckets.minBy { case (_, p, q) =>
        ((BigDecimal(p) / q) - (BigDecimal(w) / BigDecimal(h))).abs
      }._1
      assert(got == want, s"media $id (${w}x$h): got $got, want $want")
    }
    // The synthesized dims must actually spread across the grid.
    assert(rows.map(_._4).distinct.length >= 5,
      "bucketing degenerated — synthesized aspect ratios too uniform")
  }

  test("VAD segments are dense consecutive runs with true gaps between them") {
    val rows = SparkEntry.queries("multimodal_vad_segments")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s, e, n) =>
      // Islands merge only CONSECUTIVE active frames, so every frame in
      // [start, end] is active: the count is exactly the width.
      assert(n == e - s + 1, s"segment [$s,$e] claims $n frames")
    }
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"segments [$e1] and [$s2] should have merged")
        case _ =>
      }
    }
    // Multi-frame segments must exist or the merge is untested.
    assert(rows.exists(_._4 > 1), "no multi-frame segment on this corpus")
  }
}
