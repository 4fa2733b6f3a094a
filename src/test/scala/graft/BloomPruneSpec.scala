package graft

import org.scalatest.funsuite.AnyFunSuite

/** join_bloom_pruned must actually inject the runtime filter: the
  * lineitem side's scan carries a BloomFilterMightContain probe built
  * from the selective orders side, and the join itself is the SMJ the
  * hint pins (not a broadcast that would hide the mechanism).
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("runtime bloom filter probe reaches the fact-side scan") {
    val df = SparkEntry.queries("join_bloom_pruned")(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    val hasBloomProbe = optimized.exists(_.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => true
      case _ => false
    }))
    assert(hasBloomProbe,
      s"expected a BloomFilterMightContain probe in:\n$optimized")
    assert(df.count() == 1) // and the filtered plan still runs
  }
}
