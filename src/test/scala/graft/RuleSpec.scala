package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ClassifyTerm
import graft.pipeline.Classify

/** LowerClassifyTerm: the marker is gone from the optimized plan, and
  * the lowered values equal the DataFrame-level RuleClassifier.
  */
class RuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ClassifyTerm marker is lowered out of the optimized plan") {
    // A file source, not a LocalRelation — ConvertToLocalRelation would
    // otherwise fold the whole projection into literal results.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(ClassifyTerm.classifyTerm(col("lang")).as("type"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("classify_term"), optimized)
    assert(optimized.contains("md5"), optimized)
  }

  test("lowered values match RuleClassifier.labelExpr") {
    val names = Seq("alpha", "Beta Term", "gamma delta", "x").toDF("norm")
    val viaRule = names
      .select(ClassifyTerm.classifyTerm(col("norm")).as("t")).as[String].collect()
    val viaColumn = names
      .select(Classify.RuleClassifier.labelExpr(col("norm")).as("t")).as[String].collect()
    assert(viaRule.toSeq == viaColumn.toSeq)
    assert(viaRule.forall(Set("person", "place", "organization", "term")))
  }
}
