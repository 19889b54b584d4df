package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew tooling promised in SCALE.md: when one key carries a large fraction
  * of rows, a single reducer becomes the straggler. Salting splits each key
  * across `salts` sub-groups for the first (heavy) aggregation, then merges
  * the per-salt partials — two shuffles, but each bounded by rows/salts per
  * key. Exact-decimal partials make the result independent of the salt
  * assignment.
  *
  * The salt is a DETERMINISTIC hash of the value-bearing columns (round-1
  * used monotonically_increasing_id, which changes across task retries and
  * re-planning — result still correct, but partial re-execution was not
  * reproducible). xxhash64 over (key, value) keeps rows of a heavy key
  * spread across salts while making every retry recompute the identical
  * partials.
  */
object SkewOps {
  def saltedSumExact2(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(key), col(value)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value).cast(DecimalType(18, 2))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$value"))
}
