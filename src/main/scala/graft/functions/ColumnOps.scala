package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the operator inventory.
  *
  * Oracle-parity rule (SURVEY.md §6, §8 "hard parts"): the driver
  * hash-compares Spark parquet output against DuckDB. Floating-point sums are
  * summation-order dependent, so every monetary aggregate goes through an
  * exact DECIMAL cast (the testdata's doubles are exact 2-decimal values —
  * verified against /root/testdata this session), then back to double. Both
  * engines then produce bit-identical results regardless of partitioning —
  * which also means results stay stable when the same plan runs on a
  * 1000-executor cluster with different partition counts.
  */
object ColumnOps {

  /** Exact sum of a 2-decimal double column, returned as double. */
  def sumExact2(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of an expression whose true value has `scale` decimals
    * (e.g. price*(1-disc) has 4). The double->decimal cast recovers the exact
    * decimal value (IEEE error ~1e-12 is far below the grid spacing).
    */
  def sumExact(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Decimal-exact revenue expression: l_extendedprice * (1 - l_discount). */
  def revenueExpr(price: Column, discount: Column): Column =
    (price * (lit(1.0) - discount)).cast(DecimalType(18, 4))

  /** Non-empty whitespace tokens of a text column (shared tokenizer for all
    * text-analysis operators; DuckDB equivalent:
    * `list_filter(string_split(text,' '), w -> w <> '')`).
    */
  def tokens(text: Column): Column =
    call_function("graft_tokens", text)

  /** Sequential-fold dot product of two double-array columns. Matches
    * DuckDB's sequential list_aggregate('sum') fold order.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm of a double-array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity between two double-array columns, rounded for
    * cross-engine stability (sqrt is IEEE-exact; the fold is sequential in
    * both engines; rounding absorbs any last-ulp libm divergence). "+ 0.0"
    * after the round kills the signed zero: a cosine in (-5e-7, 0) rounds
    * to -0.0 under DuckDB's C round but to +0.0 under Spark's BigDecimal
    * round, and the driver hashes raw float64 bytes — the oracles apply the
    * same normalization (IEEE: -0.0 + 0.0 = +0.0, every other value
    * unchanged). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6) + lit(0.0)

  /** Float array column -> double array column (DuckDB list math is f64). */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))
}
