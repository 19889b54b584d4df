package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge (the standard technique Spark-ecosystem
  * libraries use to build DataFrames from custom logical plans — the
  * constructor surface is package-private by design). Only `ofRows` is
  * exposed; no other internals leak. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The physical plan a FRESH QueryExecution over `df`'s logical plan
    * would run — what a `df.write...` action actually executes (writes
    * wrap the logical plan in a new command and re-run the optimizer;
    * `df.queryExecution` is the cached execution only `df`'s own actions
    * use). Test-probe for conf-scoped optimizer rules: a rewrite that is
    * only pinned in the cached execution, not in the logical plan, shows
    * up here un-rewritten. */
  def freshExecutedPlan(df: DataFrame): String = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.sessionState.executePlan(df.queryExecution.logical).executedPlan.toString
  }
}
