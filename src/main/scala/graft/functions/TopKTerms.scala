package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (term, count) row of a top-k frequency result. */
final case class TermCount(term: String, cnt: Long)

/** Custom typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.2
  * `udaf_aggregator` / `agg_custom_typed`): per-group term-frequency
  * top-k. `key` extracts the counted string from the input row, so the
  * same aggregator serves both the untyped `functions.udaf` route (IN =
  * String) and the typed `KeyValueGroupedDataset.agg` route (IN = a case
  * class).
  *
  * Result is deterministically ordered (count desc, term asc) and
  * truncated to k, so a SQL `row_number()` oracle can reproduce it
  * exactly. The buffer is a plain Map[String, Long]: partial maps are
  * built map-side and merged at the exchange, i.e. the aggregation is
  * partial/final like any built-in hash aggregate.
  */
class TopKTerms[I](k: Int, key: I => String)
    extends Aggregator[I, Map[String, Long], Seq[TermCount]]
    with Serializable {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: I): Map[String, Long] = {
    val t = key(a)
    if (t == null) b else b.updated(t, b.getOrElse(t, 0L) + 1L)
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }

  override def finish(b: Map[String, Long]): Seq[TermCount] =
    b.toSeq
      .map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.cnt, tc.term))
      .take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}
