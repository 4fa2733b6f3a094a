package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force pin of the interpolated Kneser-Ney bigram LM
  * (text_kn_bigram_lm): recompute the full probability table from the
  * raw bigram stream in plain Scala maps, compare the query's top-30
  * bit-for-bit, and check the structural property that makes KN a
  * proper model — for every context w1, the probability mass over the
  * WHOLE second-word vocabulary (observed pairs at the discounted
  * estimate, unseen pairs at backoff-weight × continuation) closes to
  * exactly 1.
  */
class KnBigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rx6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Bigram pairs via the same tokenize+shingle kernel the whole text
    * family rides (its output is already oracle-pinned by
    * text_bigram_freq); the KN MATH below is independent of the query.
    */
  private lazy val pairs: Seq[(String, String)] = {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("tks",
        graft.functions.Text.tokens(
          graft.functions.Text.normTerm(col("text"))))
      .select(explode(graft.functions.Text.shingles(col("tks"), 2)).as("bg"))
    df.collect().map { r =>
      val Array(a, b) = r.getString(0).split(" ", 2)
      (a, b)
    }.toSeq
  }

  test("top-30 KN probabilities match a brute-force recompute") {
    val d = 0.75
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> m.values.sum
    }
    val n1f = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1b = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val bt = c12.size.toLong
    def pkn(w1: String, w2: String, c: Long): Double =
      (c.toDouble - d) / c1(w1).toDouble +
        ((d * n1f(w1).toDouble) / c1(w1).toDouble) *
          (n1b(w2).toDouble / bt.toDouble)
    val want = c12.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }
      .take(30)
      .map { case ((w1, w2), c) => (w1, w2, c, rx6(pkn(w1, w2, c))) }
    val got = SparkEntry.queries("text_kn_bigram_lm")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(6)))
      .toSeq
    assert(got == want, "KN probability drift vs brute force")
  }

  test("per-context probability mass closes to 1 over the full vocab") {
    val d = 0.75
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byW1 = c12.groupBy(_._1._1)
    val n1b = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val bt = c12.size.toLong
    byW1.foreach { case (w1, m) =>
      val c1 = m.values.sum.toDouble
      val n1f = m.size.toDouble
      val lambda = d * n1f / c1
      val seen = m.map { case ((_, w2), c) =>
        (c.toDouble - d) / c1 + lambda * (n1b(w2).toDouble / bt.toDouble)
      }.sum
      val unseen = n1b.keysIterator
        .filter(w2 => !m.contains((w1, w2)))
        .map(w2 => lambda * (n1b(w2).toDouble / bt.toDouble))
        .sum
      assert(math.abs(seen + unseen - 1.0) < 1e-9,
        s"mass for context '$w1' is ${seen + unseen}")
    }
  }
}
