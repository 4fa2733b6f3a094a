package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{BatchClassifier, BatchClient, Classify}

/** Drives the batch-classifier poll/retry loop with fakes: a flaky
  * transport whose first job per partition fails and whose jobs need
  * two polls to complete. Asserts every term is labeled exactly once,
  * the failed job was resubmitted, backoff sleeps happened, and a
  * transport that never completes throws instead of dropping terms.
  */
object FlakyTransport {
  val submits = new AtomicInteger(0)
  val sleeps = new ConcurrentLinkedQueue[Long]()
  @volatile var failFirst = true

  private val pollsLeft = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()

  def make(): BatchClient.Transport = new BatchClient.Transport {
    private var batches = Map.empty[String, Seq[String]]
    override def submit(batch: Seq[String]): String = {
      val n = submits.incrementAndGet()
      val id = s"job-$n"
      batches += id -> batch
      pollsLeft.put(id, new AtomicInteger(if (failFirst && n == 1) -1 else 2))
      id
    }
    override def status(jobId: String): String =
      pollsLeft.get(jobId).getAndDecrement() match {
        case n if n < 0 => "failed"
        case 0          => "completed"
        case _          => "running"
      }
    override def fetch(jobId: String): Seq[(String, String)] =
      batches(jobId).map(t => t -> s"label-$t")
  }
}

class BatchClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def terms(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => s"t$i").toDF("norm").repartition(1)
  }

  test("poll/retry loop: resubmits failed jobs, labels every term once") {
    FlakyTransport.submits.set(0)
    FlakyTransport.sleeps.clear()
    FlakyTransport.failFirst = true
    val out = new BatchClassifier(
        () => FlakyTransport.make(), batchSize = 4,
        sleeper = ms => { FlakyTransport.sleeps.add(ms); () })
      .classify(terms(10))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(out.sorted == (1 to 10).map(i => s"t$i" -> s"label-t$i").sorted)
    // 3 batches of <=4 terms + 1 resubmission of the failed first job.
    assert(FlakyTransport.submits.get() == 4)
    assert(!FlakyTransport.sleeps.isEmpty, "polling must back off between attempts")
    import scala.jdk.CollectionConverters._
    assert(FlakyTransport.sleeps.asScala.forall(_ <= 5000L),
      "backoff is capped at the reference's 5 s cadence")
  }

  test("a job that stays failed exhausts retries loudly") {
    val alwaysFailed = () => new BatchClient.Transport {
      override def submit(batch: Seq[String]): String = "j"
      override def status(jobId: String): String = "failed"
      override def fetch(jobId: String): Seq[(String, String)] = Seq.empty
    }
    val ex = intercept[org.apache.spark.SparkException] {
      new BatchClassifier(alwaysFailed, sleeper = _ => ())
        .classify(terms(3)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("BatchClassifier satisfies the Classifier service contract") {
    val c: Classify.Classifier =
      new BatchClassifier(() => FlakyTransport.make(), sleeper = _ => ())
    assert(c.isInstanceOf[Classify.Classifier])
  }
}
