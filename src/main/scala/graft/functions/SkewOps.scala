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
  * The salt is a DETERMINISTIC hash of EVERY input column (round-1 used
  * monotonically_increasing_id, which changes across task retries and
  * re-planning — result still correct, but partial re-execution was not
  * reproducible; round-2 hashed only (key, value), which collapses to one
  * bucket when a heavy key carries a constant value — a common real skew
  * shape). Hashing the full row spreads a heavy key as long as ANY column
  * varies across its rows, while every retry recomputes identical partials.
  * Limitation (inherent to deterministic salting): rows identical in every
  * column carry no distinguishing information and land in one bucket; fully
  * duplicated heavy rows need a pre-aggregation (count per distinct row)
  * before salting.
  */
object SkewOps {
  def saltedSumExact2(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value).cast(DecimalType(18, 2))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$value"))
}
