package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface over Catalyst's runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `InjectRuntimeFilter`, not registered as public functions by
  * Spark). Registered via GraftExtensions as:
  *
  *  - `graft_bloom_agg(col, items, bits)` — aggregates a column into a
  *    bloom filter binary (items/bits are long literals; bounded by
  *    spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits).
  *  - `graft_might_contain(bloom, col)` — membership probe; `bloom` must
  *    be a constant or scalar subquery, so the filter is built ONCE and
  *    shipped to every task like a tiny broadcast.
  *
  * Both sides hash through the same `xxhash64` (seed 42) wrapper here, so
  * callers pass raw columns and cannot mismatch the hashing — the classic
  * bloom-join footgun. No false negatives, by BloomFilter's contract: a
  * `false` probe is definitely absent, so ¬might_contain survivors are
  * exact and only the (few) positives need an exact confirm join.
  */
object BloomOps {
  val aggIdentifier: FunctionIdentifier = FunctionIdentifier("graft_bloom_agg")
  val aggInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterAggregate].getName, "graft_bloom_agg")
  val aggBuilder: Seq[Expression] => Expression = {
    case Seq(c, items, bits) =>
      new BloomFilterAggregate(new XxHash64(Seq(c)), items, bits)
    case exprs => throw new IllegalArgumentException(
      s"graft_bloom_agg requires (col, estimatedItems, numBits), got ${exprs.size} args")
  }

  val mightIdentifier: FunctionIdentifier = FunctionIdentifier("graft_might_contain")
  val mightInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterMightContain].getName, "graft_might_contain")
  val mightBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) =>
      BloomFilterMightContain(bloom, new XxHash64(Seq(value)))
    case exprs => throw new IllegalArgumentException(
      s"graft_might_contain requires (bloom, col), got ${exprs.size} args")
  }
}
