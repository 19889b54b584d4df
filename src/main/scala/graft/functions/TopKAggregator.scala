package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded mergeable top-k (SURVEY.md §2.6 scale path). The window-function
  * formulation of per-group top-k shuffles EVERY row to its group; this
  * Aggregator keeps at most k (value, id) pairs in its buffer, so map-side
  * partial aggregation bounds the shuffle to k rows per (group × partition)
  * — the classic distributed top-k shape that survives 100 TB facts.
  *
  * Values are BigDecimal so ordering and merge results are exact and
  * partition-order-invariant (same rationale as ColumnOps' decimal sums).
  * Order: value DESC, id ASC (total order; ties impossible to diverge).
  */
final case class RankedValue(value: BigDecimal, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[RankedValue, List[RankedValue], Seq[RankedValue]] {

  private def lt(a: RankedValue, b: RankedValue): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  private def insert(buf: List[RankedValue], v: RankedValue): List[RankedValue] = {
    val (better, worse) = buf.span(lt(_, v))
    (better ::: v :: worse).take(k)
  }

  override def zero: List[RankedValue] = Nil
  override def reduce(buf: List[RankedValue], v: RankedValue): List[RankedValue] =
    insert(buf, v)
  override def merge(a: List[RankedValue], b: List[RankedValue]): List[RankedValue] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[RankedValue]): Seq[RankedValue] = buf

  override def bufferEncoder: Encoder[List[RankedValue]] =
    ExpressionEncoder[List[RankedValue]]()
  override def outputEncoder: Encoder[Seq[RankedValue]] =
    ExpressionEncoder[Seq[RankedValue]]()
}
