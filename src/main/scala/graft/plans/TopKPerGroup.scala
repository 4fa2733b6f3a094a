package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The full custom-operator ladder (SURVEY §4.3 rung c): a logical
  * node + planner strategy + two physical operators implementing
  * top-k-per-group WITHOUT a sort — per-partition bounded heaps prune
  * to k rows per (partition, group) first, THEN one shuffle on the
  * group key merges the survivors. A window `row_number` plan must
  * shuffle every row and sort whole partitions; this moves k rows per
  * group per partition and sorts nothing — the difference is the whole
  * input at 100 TB. Rank order is (orderCol DESC, tieCol ASC), the
  * same total order the window spelling uses, so results are
  * deterministic and oracle-checkable.
  *
  * Registered through `GraftExtensions` (injectPlannerStrategy) and
  * `spark.experimental.extraStrategies`.
  */
case class TopKPerGroupPlan(
    groupCols: Seq[Attribute],
    orderCol: Attribute,
    tieCol: Attribute,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroup {

  /** `df` limited to the k best rows per group under
    * (`order` DESC, `tie` ASC); `tie` must be unique within a group
    * for a deterministic result.
    */
  def apply(df: DataFrame, group: Seq[String], order: String, tie: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(group.nonEmpty, "at least one group column is required")
    val lp = GraftShim.analyzed(df)
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${lp.output.map(_.name)}"))
    GraftShim.ofRows(df.sparkSession,
      TopKPerGroupPlan(group.map(attr), attr(order), attr(tie), k, lp))
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, t, k, child) =>
      // Partial below the exchange (pruning per input partition),
      // final above it (exact per co-located group) — the same
      // partial/final split as hash aggregation.
      TopKPerGroupExec(g, o, t, k,
        TopKPerGroupPartialExec(g, o, t, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap kernel: one pass, a k-element min-heap per
  * group keyed by the unsafe group projection; the heap root is the
  * WORST retained row (smallest value, then largest tie), evicted when
  * a better row arrives.
  */
private[plans] trait TopKKernel { self: UnaryExecNode =>
  def groupCols: Seq[Attribute]
  def orderCol: Attribute
  def tieCol: Attribute
  def k: Int

  /** Max distinct groups held in memory before the kernel flushes its
    * heaps to the output iterator and resets. The partial exec flushes
    * (emitting possibly > k candidate rows per group — the final exec
    * re-prunes, so the result is unchanged) to bound memory at
    * O(k × flushGroups) regardless of per-partition group cardinality.
    * The final exec must be exact — one pruned heap per group — so it
    * never flushes early; its bound is O(k × groups-per-reducer), which
    * the shuffle partition count controls.
    */
  def flushGroups: Int

  override def output: Seq[Attribute] = child.output

  private final case class Entry(v: Any, t: Any, row: InternalRow)

  protected def topKIter(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupCols.map(_.asInstanceOf[Expression]), child.output)
    val ob = BindReferences.bindReference(orderCol.asInstanceOf[Expression], child.output)
    val tb = BindReferences.bindReference(tieCol.asInstanceOf[Expression], child.output)
    val vOrd = TypeUtils.getInterpretedOrdering(orderCol.dataType)
    val tOrd = TypeUtils.getInterpretedOrdering(tieCol.dataType)
    def nullLow(o: Ordering[Any], a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else o.compare(a, b)
    val worstFirst: Comparator[Entry] = (a: Entry, b: Entry) => {
      val c = nullLow(vOrd, a.v, b.v)
      if (c != 0) c else -nullLow(tOrd, a.t, b.t)
    }
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, PriorityQueue[Entry]]
    // Admitted entries re-evaluate value/tie from their own COPIED row:
    // eval of a non-primitive type (string/binary/array) on a reused
    // codegen row returns a view into the transient buffer, so a stored
    // Entry referencing it would silently mutate as iteration advances.
    // The probe entry's transient values are compared immediately and
    // discarded, so it can read the live row. The group key is copied
    // only on first sight of the group, not per input row.
    def admitted(row: InternalRow): Entry = {
      val c = row.copy()
      Entry(ob.eval(c), tb.eval(c), c)
    }
    def process(row: InternalRow): Unit = {
      val key = keyProj(row)
      val pq = heaps.get(key) match {
        case Some(p) => p
        case None =>
          val p = new PriorityQueue[Entry](k + 1, worstFirst)
          heaps.put(key.copy(), p)
          p
      }
      if (pq.size < k) pq.add(admitted(row))
      else {
        val probe = Entry(ob.eval(row), tb.eval(row), null)
        if (worstFirst.compare(probe, pq.peek()) > 0) {
          pq.poll(); pq.add(admitted(row)); ()
        }
      }
    }
    // Heaps are snapshotted then cleared so the next fill round builds
    // fresh state while the drained iterator is still being consumed.
    def drain(): Iterator[InternalRow] = {
      val snapshot = heaps.values.toArray
      heaps.clear()
      snapshot.iterator.flatMap(_.iterator().asScala.map(_.row))
    }
    new Iterator[InternalRow] {
      private var out: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!out.hasNext && (iter.hasNext || heaps.nonEmpty)) {
          while (iter.hasNext && heaps.size < flushGroups) process(iter.next())
          out = drain()
        }
        out.hasNext
      }
      override def next(): InternalRow =
        if (hasNext) out.next() else throw new NoSuchElementException("empty")
    }
  }
}

object TopKPerGroupPartialExec {
  /** 64k groups × (k+1) entries bounds partial-side memory; beyond it
    * the kernel emits candidates early and the final exec re-prunes.
    */
  val DefaultFlushGroups: Int = 1 << 16
}

case class TopKPerGroupPartialExec(
    groupCols: Seq[Attribute], orderCol: Attribute, tieCol: Attribute, k: Int,
    child: SparkPlan,
    flushGroups: Int = TopKPerGroupPartialExec.DefaultFlushGroups)
  extends UnaryExecNode with TopKKernel {
  // flushGroups <= 0 would make topKIter spin forever: the fill loop
  // could never admit a row while drain() keeps returning empty.
  require(flushGroups > 0, s"flushGroups must be positive, got $flushGroups")
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKIter, preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupCols: Seq[Attribute], orderCol: Attribute, tieCol: Attribute, k: Int,
    child: SparkPlan) extends UnaryExecNode with TopKKernel {
  // Exactness requires one surviving heap per group — never flush early.
  override val flushGroups: Int = Int.MaxValue
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupCols.map(_.asInstanceOf[Expression])))
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKIter, preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
