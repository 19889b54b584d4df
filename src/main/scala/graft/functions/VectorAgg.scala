package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable (element-wise sum, count) buffer for [[VectorAvg]]. */
final case class VecSumBuf(var sum: Array[Double], var n: Long)

/** Element-wise average of a double-array column as ONE aggregation pass.
  *
  * Round 2's k-means update aggregated `dims` separate
  * `avg(element_at(v, i))` columns — 64 independent aggregate expressions
  * each re-reading the array per row. This Aggregator folds the whole vector
  * into a single mutable buffer per group: one pass, one buffer, map-side
  * partial merge for free (Aggregator partials combine per partition before
  * the shuffle, so at 100 TB the shuffle carries k × dims doubles per
  * partition, nothing row-shaped).
  *
  * Float addition is associative-only-approximately: merge order across
  * partitions can move the last ulp, exactly like the builtin avg(). Callers
  * that need cross-run stability round the result (k-means rounds to 9
  * decimals, which absorbs ulp wobble without moving any assignment).
  */
final class VectorAvg(dims: Int)
    extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {
  override def zero: VecSumBuf = VecSumBuf(Array.fill(dims)(0.0), 0L)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf = {
    require(v.length == dims, s"expected $dims dims, got ${v.length}")
    var i = 0
    while (i < dims) { b.sum(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf = {
    var i = 0
    while (i < dims) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VecSumBuf): Seq[Double] = {
    require(b.n > 0, "vector_avg over an empty group")
    b.sum.map(_ / b.n).toSeq
  }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
