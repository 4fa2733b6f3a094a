package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ConvertName, Text, UriHashExpr}
import graft.pipeline.Classify

/** Property-based checks (SURVEY §5.2), deterministic via a fixed
  * ScalaCheck seed: a generated corpus of messy strings goes through one
  * DataFrame pass asserting the algebraic properties the reference
  * semantics rely on.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val token = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val piece = Gen.frequency(
    6 -> token,
    1 -> Gen.const(","), 1 -> Gen.const("  "), 1 -> Gen.const("\t"),
    1 -> Gen.const("("), 1 -> Gen.const(")"),
    1 -> Gen.const("de"), 1 -> Gen.const("Dr."),
    1 -> Gen.const("Müller"), 1 -> Gen.const("漢字"))
  private val messy: Gen[String] =
    Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, piece).map(_.mkString(" ")))

  private lazy val samples: Seq[String] =
    Gen.listOfN(400, messy).pureApply(Gen.Parameters.default, Seed(42L))

  test("norm idempotency, uri format/insensitivity, native==builtin, label domain") {
    val df = samples.toDF("s").select(
      (Text.normTerm(Text.normTerm(col("s"))) === Text.normTerm(col("s")))
        .as("norm_idem"),
      Text.uriHash(col("s")).rlike("^r[0-9]{1,8}$").as("uri_fmt"),
      // lowercase-then-strip-spaces/commas is a fixpoint of the uri input
      (Text.uriHash(col("s")) ===
        Text.uriHash(regexp_replace(lower(col("s")), "[ ,]", ""))).as("uri_fix"),
      (UriHashExpr.uriHashNative(col("s")) === Text.uriHash(col("s")))
        .as("native_eq"),
      Classify.RuleClassifier.labelExpr(Text.normTerm(col("s")))
        .isin("person", "place", "organization", "term").as("label_dom"))
    val bad = df.filter(!col("norm_idem") || !col("uri_fmt") || !col("uri_fix")
      || !col("native_eq") || !col("label_dom"))
    assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
  }

  test("Text.shingles equals the sliding-window reference for n=2..4") {
    val lists = Gen.listOfN(150,
      Gen.choose(0, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "bb", "c", "d1"))))
      .pureApply(Gen.Parameters.default, Seed(11L))
    for (n <- 2 to 4) {
      val expected = lists.map(_.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq)
      val got = lists.toDF("tks")
        .select(Text.shingles(col("tks"), n)).as[Seq[String]].collect().toSeq
      got.zip(expected).foreach { case (g, e) => assert(g == e, s"n=$n") }
    }
  }

  test("array_distinct preserves first-occurrence order (first-wins dedup)") {
    val lists = Gen.listOfN(200,
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))))
      .pureApply(Gen.Parameters.default, Seed(7L))
    val expected = lists.map(l => l.foldLeft(Vector.empty[String]) {
      (acc, x) => if (acc.contains(x)) acc else acc :+ x
    })
    val got = lists.toDF("arr")
      .select(array_distinct(col("arr"))).as[Seq[String]].collect()
    // Row order of a local-relation projection is preserved; compare pairwise.
    got.zip(expected).foreach { case (g, e) => assert(g == e.toSeq) }
  }

  test("ConvertNameExpr (codegen) equals the ConvertName UDF everywhere") {
    val named = samples ++ Seq("Washington, George", "Adams, Dr. John",
      "von Humboldt, Baron Alexander", "One, Two, Three", "x,y")
    val df = named.toDF("s").select(
      graft.functions.ConvertNameExpr.convertNameNative(col("s")).as("native"),
      ConvertName.asUdf(col("s")).as("viaUdf"))
    assert(df.filter(col("native") =!= col("viaUdf")).count() == 0)
  }

  test("convert_name passes through strings without a comma-space separator") {
    samples.filterNot(_.contains(", ")).foreach { s =>
      assert(ConvertName(s) == s, s"'$s'")
    }
  }

  test("uri hash is stable across repeated evaluation (determinism)") {
    val once = samples.toDF("s").select(Text.uriHash(col("s"))).as[String].collect()
    val twice = samples.toDF("s").select(Text.uriHash(col("s"))).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("connected components equal brute-force union-find on random graphs") {
    val graphs = Gen.listOfN(5,
      Gen.choose(3, 25).flatMap { m =>
        Gen.listOfN(m, for {
          a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
        } yield (math.min(a, b), math.max(a, b)))
      }).pureApply(Gen.Parameters.default, Seed(13L))
    graphs.zipWithIndex.foreach { case (pairs, gi) =>
      // Brute-force union-find reference.
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // find() roots at the component MIN because unions always point
      // the larger root at the smaller one.
      val expected = nodes.map(n => n -> find(n)).toMap
      val dir = graft.streaming.StreamRuns.fresh(s"cc-prop-$gi")
      pairs.toDF("doc_a", "doc_b").write.mode("overwrite").parquet(dir)
      val got = graft.operators.ConnectedComponents
        .clusters(spark.read.parquet(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"graph $gi: $pairs")
    }
  }

  test("sequence packing: bins fill in order and every bin start is below capacity") {
    val rows = SparkEntry.queries("text_pack_sequences")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, docs) =>
      var cum = 0L
      var lastBin = 0L
      docs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val bin = r.getAs[Long]("bin")
        assert(bin == cum / 512, s"doc ${r.get(0)}: bin $bin, cum $cum")
        assert(bin >= lastBin)
        cum += r.getAs[Long]("n_tok")
        lastBin = bin
      }
    }
  }

  test("URL canonicalization is idempotent on arbitrary inputs") {
    // canonicalize o canonicalize == canonicalize: lowercase, :443
    // strip, www strip, trailing-slash strip, and the param
    // filter+sort are all fixpoints of their own output — so a
    // URL-keyed dedup is stable no matter how many times a pipeline
    // stage re-normalizes. Generated over hostile shapes (userinfo,
    // IPv6, doubled '?', tracked params, uppercase schemes).
    val url = for {
      scheme <- Gen.oneOf("https://", "HTTP://", "https://www.", "https://User@")
      host <- Gen.oneOf("Example.COM", "example.com:443", "[2001:DB8::1]",
        "sub.www.example.org", "WWW.Example.com:443")
      path <- Gen.listOf(token).map(ps =>
        if (ps.isEmpty) "" else ps.mkString("/", "/", ""))
      slash <- Gen.oneOf("", "/")
      q <- Gen.oneOf("", "?", "?utm_a=1&b=2", "?z=1&a=2&", "?x=1?y=2",
        "?ref=abc&fbclid=z")
      frag <- Gen.oneOf("", "#frag", "#")
    } yield s"$scheme$host$path$slash$q$frag"
    val urls = Gen.listOfN(300, url).pureApply(Gen.Parameters.default, Seed(7L))
    val bad = urls.toDF("u")
      .select(col("u"), graft.queries.WebCuration.canonicalize(col("u")).as("c1"))
      .select(col("u"), col("c1"),
        graft.queries.WebCuration.canonicalize(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2"))
    assert(bad.count() == 0,
      bad.collect().take(3).map(r => s"${r.get(0)} -> ${r.get(1)} -> ${r.get(2)}")
        .mkString("; "))
  }

  test("wide-integer discipline survives hot cells past 2^31 rows-equivalent") {
    // The r12 overflow sweep's proof obligation: drive the exact
    // DECIMAL(38,0) spellings the queries use (agg_vocab_hhi's Σcnt²
    // and n², profile_data_drift's (n+1)·D cross products) with counts
    // shaped like ONE 100 TB hot cell — cnt and n past 2^31, so every
    // squared/cross term exceeds Long.MaxValue — and assert exact
    // agreement with BigInt ground truth.
    val counts = Seq(4000000000L, 3200000000L, 2500000001L, 7L)
    val hhi = counts.toDF("cnt")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("s2"))
      .select(
        expr("(s2 * 1000000) div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)")
          .as("hhi_micro"),
        expr("(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) div s2").as("eff"))
      .head()
    val n = counts.map(BigInt(_)).sum
    val s2 = counts.map(c => BigInt(c) * c).sum
    assert(BigInt(hhi.getLong(0)) == s2 * 1000000 / (n * n))
    assert(BigInt(hhi.getLong(1)) == (n * n) / s2)
    // The plain-long spelling would have wrapped per term — the exact
    // flaw the decimal ride exists to prevent.
    assert(counts.exists(c => c * c < 0))

    val (n1, n2) = (3000000000L, 2500000000L)
    val tvd = Seq((n1, n2)).toDF("n1", "n2")
      .withColumn("d1", col("n1") + 10L)
      .withColumn("d2", col("n2") + 10L)
      .select(abs((col("n2") + 1).cast("decimal(38,0)") * col("d1") -
        (col("n1") + 1).cast("decimal(38,0)") * col("d2")).cast("long")
        .as("term"))
      .head().getLong(0)
    val expected = ((BigInt(n2) + 1) * (n1 + 10) - (BigInt(n1) + 1) * (n2 + 10)).abs
    assert(BigInt(tvd) == expected)
  }
}
