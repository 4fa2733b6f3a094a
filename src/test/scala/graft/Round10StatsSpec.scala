package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the round-10 statistical operators —
  * properties the DuckDB hash gate cannot express (it proves engine
  * parity, not that the STATISTIC is right): survival curves must be
  * monotone, attribution credit must be conserved exactly, IPF must
  * actually hit its margins, allocations must spend exactly their
  * budget.
  */
class Round10StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("kaplan-meier: survival monotone nonincreasing, n_risk telescopes") {
    val rows = SparkEntry.queries("win_kaplan_meier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val total = rows.map(r => r._2 + r._3).sum
    assert(rows.head._4 == total, "first n_risk must equal the cohort size")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-12, s"S(t) rose at t=${b._1}")
      assert(b._4 == a._4 - a._2 - a._3,
        s"n_risk must drop by d+c at t=${b._1}")
    case _ => ()
    }
    rows.foreach { case (t, _, _, _, s) =>
      assert(s > 0.0 && s <= 1.0, s"S($t)=$s out of range")
    }
  }

  test("attribution: every model conserves exactly 1e6 micros per conversion") {
    val rows = SparkEntry.queries("win_attribution_models")(spark, sf).collect()
    val first = rows.map(_.getLong(2)).sum
    val last = rows.map(_.getLong(3)).sum
    val linear = rows.map(_.getLong(4)).sum
    assert(first == last && last == linear,
      s"models disagree on total credit: $first / $last / $linear")
    assert(first % 1000000L == 0, "credit must be whole conversions")
    assert(first > 0, "no conversions with touches — dead spec")
  }

  test("raking: 3rd-round column margins land on target within floor slack") {
    val rows = SparkEntry.queries("agg_raking_ipf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    val total = SparkEntry.queries("agg_raking_ipf")(spark, sf)
      .selectExpr("sum(n)").collect()(0).getLong(0)
    val nats = rows.map(_._2).distinct.sorted
    val segs = rows.map(_._1).distinct
    val tgtNat = total * 1000000L / nats.length
    nats.foreach { nat =>
      val got = rows.filter(_._2 == nat).map(_._3).sum
      // each cell's floor division loses < 1 micro-unit; the column
      // step ran LAST so margins are within one unit per cell
      assert(math.abs(got - tgtNat) <= segs.length,
        s"nat=$nat margin $got vs target $tgtNat")
    }
  }

  test("neyman: allocation spends exactly the declared budget") {
    val rows = SparkEntry.queries("sample_strat_neyman")(spark, sf).collect()
    assert(rows.map(_.getLong(5)).sum == 100L, "allocation must sum to 100")
    rows.foreach(r => assert(r.getLong(5) >= r.getLong(4),
      "alloc below its floor base"))
  }

  test("pareto: crossing rank within population, share sane") {
    SparkEntry.queries("win_pareto_8020")(spark, sf).collect().foreach { r =>
      val (n, k, share) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(k >= 1 && k <= n, s"crossing rank $k outside [1,$n]")
      assert(share <= 1000000L)
    }
  }

  test("ks/chi2/autocorr: statistics within their ranges") {
    SparkEntry.queries("agg_ks_test")(spark, sf).collect().foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L, "D out of [0,1]")
    }
    val chi = SparkEntry.queries("agg_chi2_independence")(spark, sf).collect()
    assert(chi.length == 125, s"${chi.length} cells, want 5x25")
    assert(chi.map(_.getDouble(5)).distinct.length == 1,
      "chi2 must be one corpus-wide value")
    assert(chi.head.getDouble(5) >= 0.0)
    SparkEntry.queries("win_autocorr")(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9,
        s"|r_${r.getLong(1)}| > 1")
    }
  }

  test("minhash estimator audit: mae equals mean absolute bias") {
    val rows = SparkEntry.queries("dedup_minhash_est_vs_exact")(spark, sf)
      .collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val mae = rows.map(x => math.abs(x._3)).sum / rows.length
    assert(rows.forall(_._4 == mae), "mae column inconsistent with rows")
    rows.foreach { case (est, jac, bias, _) =>
      assert(est >= 0 && est <= 1000000L && jac >= 0 && jac <= 1000000L)
      assert(bias == est - jac)
    }
  }
}
