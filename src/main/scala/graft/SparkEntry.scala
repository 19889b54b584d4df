package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.MapperFacade
import graft.operators._
import graft.functions.Scalars
import graft.streaming.EventWindows

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and §8.
  * Each operator group contributes its `queries` + `oracles`; names are the
  * normative q_* identifiers from SURVEY.md §2.
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1-style pricing summary) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Joins.queries ++ Aggregates.queries ++
      Windows.queries ++ Scalars.queries ++ EventWindows.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Multimodal.queries ++ MapperFacade.queries ++ DataModel.queries

  /** DuckDB-equivalent SQL for every oracle-expressible query; names absent
    * here are declared no-oracle (approximate/hash-dependent ops) per the
    * contract. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Joins.oracles ++ Aggregates.oracles ++
      Windows.oracles ++ Scalars.oracles ++ EventWindows.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
      Multimodal.oracles ++ MapperFacade.oracles ++ DataModel.oracles
}
