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
    df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value).cast(DecimalType(18, 2))).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as(s"sum_$value"))

  /** Keys carrying more than 1/n of `df`'s rows, as a single column `hk` —
    * the phase-1 discovery of two-phase targeted salting (q_join_salted_hot).
    * Fully declarative (the scalar total rides along as a broadcast cross
    * join, no driver-side action), and the output is tiny BY DEFINITION —
    * at most n-1 keys can each exceed 1/n of the rows — so it is always
    * safe to broadcast, at any corpus size. */
  def hotKeys(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__tot"))))
      .filter(col("__c") > col("__tot") / n)
      .select(col(key).as("hk"))
}
