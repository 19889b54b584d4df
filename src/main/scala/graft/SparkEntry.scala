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

  /** THE single list of operator groups. Both `queries`/`oracleSql` and the
    * global-uniqueness test derive from this, so adding a group here updates
    * every consumer at once (round 2: a hand-copied group list in the test
    * went stale and broke `sbt test` with zero real duplicates). */
  val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Joins.queries, Joins.oracles),
      (Aggregates.queries, Aggregates.oracles),
      (Windows.queries, Windows.oracles),
      (Scalars.queries, Scalars.oracles),
      (EventWindows.queries, EventWindows.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (MapperFacade.queries, MapperFacade.oracles),
      (DataModel.queries, DataModel.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Layout.queries, Layout.oracles),
      (Behavior.queries, Behavior.oracles),
      (Curation.queries, Curation.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** DuckDB-equivalent SQL for every oracle-expressible query; names absent
    * here are declared no-oracle (approximate/hash-dependent ops) per the
    * contract. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
