package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force and invariant pins for the round-11 additions:
  * Poisson-bootstrap CIs, sequence-gap detection, modularity,
  * capture-recapture coverage, retention sweep, burstiness and the
  * power/MDE table.
  */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** ≙ Text.md5Hash32 / the oracle's '0x'||substr(md5(x),1,8) spelling. */
  private def h32(sx: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  test("agg_poisson_bootstrap matches a driver brute-force recompute") {
    // Recompute the Poisson(1) CDF thresholds exactly as Health does.
    var term = math.exp(-1.0)
    var acc = 0.0
    val thr = (0 to 8).map { k =>
      acc += term; term /= (k + 1).toDouble
      math.floor(acc * 4294967296.0).toLong
    }
    def rx4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val want = orders.groupBy(_._1).map { case (pri, rows) =>
      val means = (0 until 40).map { b =>
        var nw = 0L
        var sw = 0L
        rows.foreach { case (_, k, xc) =>
          val w = thr.count(t => h32(s"pb$b:$k") >= t)
          nw += w; sw += w * xc
        }
        b -> (sw.toDouble / nw.toDouble)
      }
      val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
      val meanAll = rx4(rows.map(_._3).sum.toDouble / rows.length / 100.0)
      pri -> ((rows.length.toLong, meanAll,
        rx4(sorted(0) / 100.0), rx4(sorted(38) / 100.0)))
    }
    val got = SparkEntry.queries("agg_poisson_bootstrap")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == want, "bootstrap CI drift vs brute force")
    // The interval is a real interval around the point estimate.
    got.values.foreach { case (_, mean, lo, hi) =>
      assert(lo < hi && lo <= mean && mean <= hi,
        s"degenerate CI ($lo, $mean, $hi)")
    }
  }

  test("profile_sequence_gaps matches a driver brute-force recompute") {
    val ids = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id").distinct().collect().map(_.getLong(0))
    val arrived = ids.filter(k => h32(s"gap:$k") % 20 != 0).sorted
    val gaps = arrived.sliding(2)
      .collect { case Array(a, b) if b - a > 1 => (a, b, b - a - 1) }
      .toSeq
    val want = gaps.sortBy { case (a, _, m) => (-m, a) }.take(20)
    val got = SparkEntry.queries("profile_sequence_gaps")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "gap list drift vs brute force")
    assert(got.nonEmpty && got.forall { case (a, b, m) => b - a - 1 == m },
      "inconsistent gap arithmetic")
  }

  test("graph_modularity: both edge arms live, Q in range") {
    val r = SparkEntry.queries("graph_modularity")(spark, sf).collect().head
    val (m2, eIn, nComm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val q = r.getDouble(3)
    assert(eIn > 0, "intra-community arm dead (the sync-LPA failure mode)")
    assert(eIn <= m2 && nComm >= 1)
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
  }

  test("dedup_capture_recapture: Chapman estimator invariants") {
    val r = SparkEntry.queries("dedup_capture_recapture")(spark, sf)
      .collect().head
    val (n1, n2, m, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (c1, c2) = (r.getLong(4), r.getLong(5))
    assert(m > 0, "detector overlap arm dead")
    assert(m <= math.min(n1, n2))
    assert(est >= math.max(n1, n2), "estimate below an observed capture")
    assert(est == (n1 + 1) * (n2 + 1) / (m + 1) - 1, "Chapman drift")
    assert(c1 == 1000000L * n1 / math.max(est, 1))
    assert(c2 == 1000000L * n2 / math.max(est, 1))
    assert(c1 <= 1000000L && c2 <= 1000000L)
  }

  test("pipeline_retention_sweep: hold and delete arms both live") {
    val rows = SparkEntry.queries("pipeline_retention_sweep")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val (pn, pe, ph, pd) = rows("purchase")
    assert(ph == pe && pd == 0, "legal hold must exempt purchase rows")
    assert(pe > 0 && pe < pn, "expired/retained arms must both be live")
    rows.filterNot(_._1 == "purchase").values.foreach {
      case (n, e, h, d) =>
        assert(h == 0 && d == e && d > 0 && e < n,
          "non-held sources must delete exactly their expired rows")
    }
  }

  test("text_burstiness: peer-relative flag keeps both arms live") {
    val rows = SparkEntry.queries("text_burstiness")(spark, sf).collect()
    assert(rows.length == 20)
    val flags = rows.map(_.getBoolean(4)).toSet
    assert(flags == Set(true, false),
      "peer-mean cut must separate the top-20 unless all VMRs tie")
    // Sorted by vmr desc: the trues are a prefix.
    val vs = rows.map(_.getLong(3))
    assert(vs.zip(vs.tail).forall { case (a, b) => a >= b })
  }

  test("agg_ratio_delta_method matches a driver brute-force recompute") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def rx6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val z = 1.959963984540054
    val want = evs.groupBy(_._1).toSeq
      .map { case (u, es) =>
        (u % 5, es.count(_._2 == "click").toLong, es.count(_._2 == "view").toLong)
      }
      .groupBy(_._1).map { case (cohort, us) =>
        val n = us.size.toDouble
        val (sx, sy) = (us.map(_._2).sum, us.map(_._3).sum)
        val sxx = us.map(t => t._2 * t._2).sum
        val syy = us.map(t => t._3 * t._3).sum
        val sxy = us.map(t => t._2 * t._3).sum
        val vx = (n * sxx - sx.toDouble * sx) / (n * (n - 1.0))
        val vy = (n * syy - sy.toDouble * sy) / (n * (n - 1.0))
        val cxy = (n * sxy - sx.toDouble * sy) / (n * (n - 1.0))
        val r = sx.toDouble / sy.toDouble
        val muY = sy.toDouble / n
        val se = math.sqrt(
          math.max(vx - 2.0 * r * cxy + r * r * vy, 0.0) / (n * muY * muY))
        cohort -> ((us.size.toLong, sx, sy, rx6(r), rx6(se),
          rx6(r - z * se), rx6(r + z * se)))
      }
    val got = SparkEntry.queries("agg_ratio_delta_method")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got == want, "delta-method drift vs brute force")
  }

  test("sim_diversity_mmr: 5 distinct picks per query, pick-1 is the rel argmax") {
    val rows = SparkEntry.queries("sim_diversity_mmr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach { ps =>
      assert(ps.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(ps.map(_._2).distinct.length == 5, "a candidate picked twice")
    }
    // Pick 1 must agree with the plain cosine top-1 (MMR round 1 is
    // pure relevance — the diversity penalty only starts at pick 2).
    // sim_cosine_topk columns: (q_id, rank, vec_id, cos)
    val top1 = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    byQ.foreach { case (q, ps) =>
      assert(ps.find(_._3 == 1L).get._2 == top1(q),
        s"query $q: MMR pick 1 differs from the relevance argmax")
    }
  }

  test("multimodal_snr_profile: floor <= overall <= peak, crest >= 1") {
    val rows = SparkEntry.queries("multimodal_snr_profile")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ov, pk, fl, crest) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(fl <= ov + 1e-4 && ov <= pk + 1e-4,
        s"RMS ordering violated: floor=$fl overall=$ov peak=$pk")
      assert(crest >= 1.0 - 1e-4, s"crest < 1: $crest")
    }
  }

  test("sim_recall_curve: 4 depths, recalls in (0, 1]") {
    val rows = SparkEntry.queries("sim_recall_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 5L, 10L))
    rows.foreach { case (k, hits, rec) =>
      assert(rec > 0.0 && rec <= 1.0 && hits <= k * 10,
        s"recall@$k out of range: $rec ($hits hits)")
    }
  }

  test("pipeline_dsar_export: unknown-subject and FK-chain arms live") {
    val rows = SparkEntry.queries("pipeline_dsar_export")(spark, sf).collect()
    val unknown = rows.filter(_.getLong(0) < 0)
    assert(unknown.length == 2, "the two unknown request subjects")
    unknown.foreach { r =>
      assert(!r.getBoolean(1) && !r.getBoolean(10),
        "unknown subjects must report no records held")
      assert(r.getLong(4) == 0 && r.getString(5) == "" && r.getLong(9) == 0)
    }
    val known = rows.filter(_.getLong(0) >= 0)
    assert(known.nonEmpty)
    known.foreach { r =>
      val (nOrders, keys, nLi) = (r.getLong(4), r.getString(5), r.getLong(9))
      assert(r.getBoolean(1) && r.getBoolean(10))
      assert(keys.split('|').count(_.nonEmpty) == nOrders,
        "order_keys list must enumerate exactly n_orders keys")
      assert(nLi >= nOrders,
        "every order has >= 1 lineitem reachable via the FK chain")
    }
  }

  test("win_downsample_lttb: full buckets, exact endpoints per series") {
    val rows = SparkEntry.queries("win_downsample_lttb")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (tpe, ps) =>
      assert(ps.map(_._2).distinct.length == ps.length,
        s"$tpe: one pick per bucket")
      assert(ps.length == 20, s"$tpe: expected 20 buckets, got ${ps.length}")
      // Bucket 0 keeps the series start (rebased x = 0); the last
      // bucket keeps the series end (the max x of the whole series).
      assert(ps.find(_._2 == 0L).get._3 == 0L, s"$tpe: start point lost")
      val maxX = ps.map(_._3).max
      assert(ps.maxBy(_._2)._3 == maxX, s"$tpe: end point lost")
    }
  }

  test("agg_power_mde: positive spreads and a sane feasibility gate") {
    val rows = SparkEntry.queries("agg_power_mde")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sd, mde, rel) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(sd > 0 && mde > 0 && rel > 0)
      assert(r.getBoolean(6) == (rel <= 0.02), "gate must compare rx'd rel")
    }
  }
}
