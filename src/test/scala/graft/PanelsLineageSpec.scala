package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LogicalPlan}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Lineage, Panels, Staged}

/** The three structural-boundedness carriers the guards lean on:
  * Panels.fixed (the one fixed-panel idiom), Lineage.checkpoint (the
  * pre-checkpoint plan registry), and Staged.buildPlanFor (the staged
  * artifact's recorded build plan). Each pin here is a property
  * BroadcastHintGuardSpec's walk depends on — if one regresses, the
  * guard silently loses a certification path and queries fall back to
  * allowlist entries.
  */
class PanelsLineageSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Panels.fixed caps to the k lowest keys and plans a global limit") {
    val df = (1L to 50L).map(i => (51L - i, s"v$i")).toDF("id", "v")
    val panel = Panels.fixed(df, "id", 5)
    assert(panel.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    val hasLimit = panel.queryExecution.analyzed.exists {
      case _: GlobalLimit => true
      case _ => false
    }
    assert(hasLimit, "Panels.fixed must plan a structural GlobalLimit")
  }

  test("Panels.fixed of fewer than k rows passes every row") {
    val df = (1L to 3L).map(i => (i, i * 2)).toDF("id", "v")
    assert(Panels.fixed(df, "id", 100).count() === 3L)
  }

  test("Lineage.checkpoint records the pre-checkpoint plan by rdd id") {
    val pre = (1L to 10L).toDF("id").filter(col("id") <= 3).limit(2)
    val out = Lineage.checkpoint(pre)
    // Same rows, and the registry serves the plan that produced them.
    assert(out.count() === 2L)
    val rddId = out.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.id
      case other => fail(s"checkpoint did not plan a LogicalRDD: $other")
    }
    val recorded: Option[LogicalPlan] = Lineage.planFor(rddId)
    assert(recorded.nonEmpty, "no plan recorded for the checkpointed rdd")
    assert(recorded.get.exists { case _: GlobalLimit => true; case _ => false },
      s"recorded plan lost the bounding limit:\n${recorded.get}")
    assert(Lineage.planFor(-1).isEmpty)
  }

  test("registered plans hold checkpoint leaves as id stubs, never the RDD") {
    // Iterative loops checkpoint per round, and round t's registered
    // plan embeds round t-1's checkpoint as a LEAF. Storing the raw
    // LogicalRDD there chains every generation's RDD strongly reachable
    // for the JVM's life, so ContextCleaner can never GC-unpersist the
    // localCheckpoint blocks — the registry must store id-only
    // CheckpointRef stubs, and the auditors' walk must resolve a stub
    // through planFor exactly like the raw leaf.
    val r1 = Lineage.checkpoint((1L to 10L).toDF("id").limit(3))
    val r2 = Lineage.checkpoint(r1.filter(col("id") >= 0))
    val rddId = r2.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.id
      case other => fail(s"checkpoint did not plan a LogicalRDD: $other")
    }
    val recorded = Lineage.planFor(rddId).getOrElse(fail("no plan recorded"))
    assert(!recorded.exists { case _: LogicalRDD => true; case _ => false },
      s"registered plan pins an RDD via a raw LogicalRDD leaf:\n$recorded")
    val stubs = recorded.collect { case c: graft.pipeline.CheckpointRef => c }
    assert(stubs.nonEmpty, "nested checkpoint was not stubbed")
    // The stub resolves onward: round 2's plan is bounded because round
    // 1's recorded plan carries the limit.
    assert(BoundedWalk.isBounded(recorded),
      "the walk no longer certifies through a CheckpointRef stub")
  }

  test("Staged.disk records the build plan under its tag, keyed by plan hash") {
    val dir = "/root/testdata/sf0.001"
    val tag = "panels_spec_probe"
    Staged.disk(spark, dir, tag) {
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(7)
    }
    // The lookup is pinned to the generation's plan hash — read it
    // back from the artifact directory's name, the way the plan
    // auditors do.
    val sfName = new java.io.File(dir).getName
    val parent = new java.io.File(s"${Staged.cacheRoot}/$sfName")
    val seg = Option(parent.listFiles()).getOrElse(Array.empty)
      .map(_.getName).find(_.startsWith(s"$tag-"))
      .getOrElse(fail(s"no staged artifact for $tag under $parent"))
    val hash = seg.stripPrefix(s"$tag-").split('-').head
    val plan = Staged.buildPlanFor(tag, hash)
    assert(plan.nonEmpty, "spillThrough did not record the build plan")
    assert(plan.get.exists { case _: GlobalLimit => true; case _ => false },
      s"recorded build plan lost the limit:\n${plan.get}")
    // Wrong hash (a different generation) and unknown tags serve nothing.
    assert(Staged.buildPlanFor(tag, "0").isEmpty)
    assert(Staged.buildPlanFor("no_such_tag", hash).isEmpty)
  }

  test("Staged build plans hold checkpoint leaves as id stubs, never the RDD") {
    // Same leak class as the Lineage registry: a Staged.disk build
    // over a Lineage.checkpoint'd input must not store the raw
    // LogicalRDD in buildPlans — that would strongly pin the
    // checkpoint generation's RDD blocks for the JVM's life. The
    // recorded plan carries an id-only CheckpointRef stub, and the
    // walk resolves it through Lineage.planFor like the raw leaf.
    val dir = "/root/testdata/sf0.001"
    val tag = "panels_spec_ckpt_probe"
    val seed = Lineage.checkpoint(
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").orderBy("doc_id").limit(4))
    Staged.disk(spark, dir, tag) { seed.filter(col("doc_id") >= 0) }
    val sfName = new java.io.File(dir).getName
    val parent = new java.io.File(s"${Staged.cacheRoot}/$sfName")
    val seg = Option(parent.listFiles()).getOrElse(Array.empty)
      .map(_.getName).find(_.startsWith(s"$tag-"))
      .getOrElse(fail(s"no staged artifact for $tag under $parent"))
    val hash = seg.stripPrefix(s"$tag-").split('-').head
    val plan = Staged.buildPlanFor(tag, hash)
      .getOrElse(fail("no build plan recorded"))
    assert(!plan.exists { case _: LogicalRDD => true; case _ => false },
      s"buildPlans pins an RDD via a raw LogicalRDD leaf:\n$plan")
    assert(plan.collect { case c: graft.pipeline.CheckpointRef => c }.nonEmpty,
      "checkpointed build input was not stubbed")
    // And the stub resolves onward: the artifact stays certified
    // because the checkpoint's recorded plan carries the limit.
    assert(BoundedWalk.isBounded(plan),
      "the walk no longer certifies a staged build through its stub")
  }

  test("EagerWrites refuses frames built over raw checkpoint inputs") {
    // A raw LogicalRDD in the registry would pin its RDD blocks for
    // the JVM's life (the leak class the CheckpointRef stubbing
    // closes); the physical half of an EagerWrites entry cannot carry
    // a stub, so registration must fail loudly instead.
    import spark.implicits._
    val ck = (1L to 5L).toDF("id").localCheckpoint(true)
    val ex = intercept[IllegalArgumentException] {
      graft.pipeline.EagerWrites.record("panels_spec_ckpt_refusal",
        ck.filter(col("id") > 0))
    }
    assert(ex.getMessage.contains("checkpointed input"))
    assert(!graft.pipeline.EagerWrites.all.contains("panels_spec_ckpt_refusal"))
  }
}
