package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the dataset-health family (Health.scala)
  * that hold at EVERY scale factor — the oracle gate pins exact values
  * per SF; these pin the properties that make each operator what it
  * claims to be.
  */
class HealthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("bloom membership has zero false negatives and only forward errors") {
    val rows = SparkEntry.queries("agg_bloom_membership")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val predicted = r.getAs[Boolean]("predicted")
      val actual = r.getAs[Boolean]("actual")
      if (actual) assert(predicted, s"false negative at ${r.get(0)}")
      assert(r.getAs[Boolean]("false_positive") == (predicted && !actual))
    }
    // Proper subset at every SF (threshold chosen for ~1/3 membership):
    // a bloom over ALL keys would make every probe trivially positive.
    val nActual = rows.count(_.getAs[Boolean]("actual"))
    assert(nActual > 0 && nActual < rows.length)
  }

  test("drift profile is a complete 10-bucket spine with exact-integer TVD") {
    val rows = SparkEntry.queries("profile_data_drift")(spark, dir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rs) =>
      assert(rs.map(_.getAs[Long]("b")).sorted.toSeq == (0L to 9L),
        s"$et: bucket spine incomplete")
      val tvds = rs.map(_.getAs[Double]("tvd")).distinct
      assert(tvds.length == 1, s"$et: tvd not constant over the partition")
      assert(tvds.head >= 0.0 && tvds.head <= 1.0)
      // Smoothed probabilities each sum to 1 up to float addition.
      assert(math.abs(rs.map(_.getAs[Double]("p1")).sum - 1.0) < 1e-9)
      assert(math.abs(rs.map(_.getAs[Double]("p2")).sum - 1.0) < 1e-9)
    }
  }

  test("AMS F2 median estimator lands within 60% of the exact self-join size") {
    val rows = SparkEntry.queries("agg_ams_f2")(spark, dir).collect()
    assert(rows.length == 16)
    val relErr = rows.head.getAs[Double]("rel_err")
    assert(math.abs(relErr) < 0.6, s"median estimate off by $relErr")
    rows.foreach(r => assert(r.getAs[Long]("x2") >= 0))
  }

  test("balanced sample emits exactly min-class-count docs per language") {
    val rows = SparkEntry.queries("sample_balanced")(spark, dir).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang")).map { case (_, rs) => rs.length }
    assert(perLang.toSet.size == 1, s"unbalanced classes: $perLang")
  }

  test("ewma stays inside the trailing-window value envelope") {
    val rows = SparkEntry.queries("win_ewma")(spark, dir).collect()
    assert(rows.nonEmpty)
    // A convex combination of window values cannot leave the global range.
    val vals = rows.map(_.getAs[Double]("value"))
    val (lo, hi) = (vals.min, vals.max)
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-9 && e <= hi + 1e-9)
    }
  }

  test("gap fill emits one row per user per day with zeroed gaps") {
    val rows = SparkEntry.queries("win_gap_fill")(spark, dir).collect()
    val days = rows.map(_.getAs[java.sql.Date]("d").toString).distinct.length
    val users = rows.map(_.getAs[Long]("user_id")).distinct.length
    assert(rows.length == days * users, "spine is not the full user x day grid")
    rows.filter(_.getAs[Boolean]("is_gap")).foreach { r =>
      assert(r.getAs[Long]("n") == 0 && r.getAs[Double]("total") == 0.0)
    }
  }

  test("cusum alert keeps both arms live and S nonnegative") {
    val rows = SparkEntry.queries("win_cusum_alert")(spark, dir).collect()
    rows.foreach(r => assert(r.getAs[Long]("cusum_cents") >= 0))
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rs) =>
      val alerts = rs.count(_.getAs[Boolean]("alert"))
      assert(alerts > 0 && alerts < rs.length, s"$et: dead alert arm ($alerts/${rs.length})")
    }
  }

  test("z-scores have near-zero mean and near-unit spread per group") {
    val rows = SparkEntry.queries("agg_zscore_standardize")(spark, dir).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      val m = zs.sum / zs.length
      val v = zs.map(z => (z - m) * (z - m)).sum / zs.length
      assert(math.abs(m) < 1e-6, s"$et: z mean $m")
      assert(math.abs(v - 1.0) < 1e-2, s"$et: z variance $v")
    }
  }

  test("feature hash buckets stay in [0,64) and weights sum to 1 per doc") {
    val rows = SparkEntry.queries("text_feature_hash")(spark, dir).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket"); assert(b >= 0 && b < 64)
    }
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val w = rs.map(_.getAs[Double]("weight")).sum
      assert(math.abs(w - 1.0) < 1e-9, s"doc $id: weights sum $w")
    }
  }

  test("inverted index df matches posting count for unsaturated terms") {
    val rows = SparkEntry.queries("layout_inverted_index")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val n = r.getAs[String]("head_postings").split('|').length
      assert(n == math.min(df, 10L), s"${r.get(0)}: df=$df postings=$n")
    }
  }

  test("linear interpolation is monotone between its two neighbors") {
    val rows = SparkEntry.queries("win_interpolate_linear")(spark, dir).collect()
    assert(rows.exists(_.getAs[Boolean]("interpolated")))
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("vc_filled"))))
    // Interpolated values never leave the global observed range.
    val obs = rows.filter(!_.getAs[Boolean]("interpolated")).map(_.getAs[Long]("vc_filled"))
    val (lo, hi) = (obs.min, obs.max)
    rows.filter(_.getAs[Boolean]("interpolated")).foreach { r =>
      val v = r.getAs[Long]("vc_filled")
      assert(v >= lo && v <= hi)
    }
  }

  test("partial-aggregate merge equals a direct recompute") {
    val merged = SparkEntry.queries("pipeline_partial_agg_merge")(spark, dir).collect()
    val direct = {
      import org.apache.spark.sql.functions._
      graft.queries.QDef.t(spark, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .withColumn("xc", floor(col("value") * 100 + 0.5).cast("long"))
        .groupBy("event_type", "day")
        .agg(sum("xc").as("sum_c"), count(lit(1)).as("n"))
        .orderBy("event_type", "day")
        .collect()
    }
    assert(merged.length == direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getAs[Long]("sum_c") == d.getAs[Long]("sum_c"))
      assert(m.getAs[Long]("n") == d.getAs[Long]("n"))
    }
  }

  test("temporal SCD2 join resolves exactly one version with both arms live") {
    val rows = SparkEntry.queries("join_temporal_scd2")(spark, dir).collect()
    // One output row per purchase: the half-open intervals are disjoint.
    assert(rows.map(_.getAs[Long]("event_id")).distinct.length == rows.length)
    val pre = rows.count(_.getAs[Long]("version") == 0L)
    assert(pre > 0 && pre < rows.length, s"dead arm: $pre pre-signup of ${rows.length}")
    rows.filter(_.getAs[Long]("version") > 0L)
      .foreach(r => assert(r.getAs[Long]("days_since_signup") >= 0))
  }

  test("rolling distinct is sandwiched between daily and total distinct") {
    val rolling = SparkEntry.queries("win_rolling_distinct")(spark, dir).collect()
    val ev = graft.queries.QDef.t(spark, dir, "events")
    import org.apache.spark.sql.functions._
    val daily = ev.select(col("event_type"), to_date(col("ts")).as("d"), col("user_id"))
      .distinct().groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val total = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rolling.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d").toString)
      val u7 = r.getAs[Long]("u7")
      assert(u7 >= daily.getOrElse(k, 0L), s"$k: 7-day < 1-day")
      assert(u7 <= total(k._1), s"$k: 7-day > all-time")
    }
  }

  test("chunk dedup marks exact-duplicate docs as fully duplicated") {
    val rows = SparkEntry.queries("dedup_chunk_exact")(spark, dir).collect()
    assert(rows.nonEmpty)
    // The synthetic corpus contains exact doc duplicates; every one of
    // their chunks is shared, so dup_frac hits 1.0 for those docs.
    assert(rows.exists(_.getAs[Double]("dup_frac") == 1.0))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_chunks"))
    }
  }
}
