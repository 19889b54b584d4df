package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew tooling promised in SCALE.md: when one key carries a large fraction
  * of rows, a single reducer becomes the straggler. Salting splits each key
  * across `salts` sub-groups for the first (heavy) aggregation, then merges
  * the per-salt partials — two shuffles, but each bounded by rows/salts per
  * key. Exact-decimal partials make the result independent of the salt
  * assignment, so any salt source works.
  */
object SkewOps {
  def saltedSumExact2(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value).cast(DecimalType(18, 2))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$value"))
}
