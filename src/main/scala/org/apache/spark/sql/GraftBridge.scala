package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge (the standard technique Spark-ecosystem
  * libraries use to build DataFrames from custom logical plans — the
  * constructor surface is package-private by design). Only `ofRows` is
  * exposed; no other internals leak. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
