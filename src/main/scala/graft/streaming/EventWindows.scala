package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** SURVEY.md §2.9 — event-time windowing over `events`, declared in batch
  * mode (same `window()` / `session_window()` expressions Structured
  * Streaming executes incrementally; StreamOps wires the streaming variants
  * and the ScalaTest suite asserts batch/stream equivalence).
  *
  * ns-vs-µs note (FIXTURES.md): Spark reads the ns parquet timestamps
  * truncated to µs while DuckDB keeps ns, so every emitted timestamp is
  * truncated to a granularity (hour/second) where both agree.
  */
object EventWindows {
  type Q = (SparkSession, String) => DataFrame

  /** Shared aggregation bodies so the streaming variants (StreamOps) are the
    * same plan with a watermark in front. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("cnt"), col("sum_value"))

  def slidingAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
        col("event_type"), col("cnt"))

  // date_trunc yields LTZ even for NTZ input; cast back to naive.
  private def secTrunc(c: Column): Column =
    date_trunc("second", c).cast("timestamp_ntz")

  def sessionAgg(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        secTrunc(min(col("ts"))).as("sess_start"),
        (unix_timestamp(secTrunc(max(col("ts"))))
          - unix_timestamp(secTrunc(min(col("ts")))) + lit(1800L)).as("dur_s"))
      .select(col("user_id"), col("sess_start"), col("n_events"), col("dur_s"))

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> ((s, d) =>
      tumblingAgg(Tables.events(s, d)).orderBy("wstart", "event_type")),

    // Sliding windows multiply each row into 4 overlapping windows (Expand).
    // Oracle: each event belongs to the 4 epoch-aligned 15-min buckets
    // ending at its own bucket — expressible with time_bucket + range(0,4).
    "q_stream_sliding" -> ((s, d) =>
      slidingAgg(Tables.events(s, d)).orderBy("wstart", "event_type")),

    // Session windows, 30-min gap. Oracle = classic lag/cumsum island trick.
    "q_stream_session" -> ((s, d) =>
      sessionAgg(Tables.events(s, d)).orderBy("user_id", "sess_start")))

  val oracles: Map[String, String] = Map(
    "q_stream_sliding" ->
      ("SELECT wstart, wstart + INTERVAL 1 HOUR AS wend, event_type, count(*) AS cnt FROM " +
        "(SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS wstart, event_type " +
        "FROM events, UNNEST(range(0, 4)) AS t(k)) " +
        "GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    "q_stream_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS cnt, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    // e0 truncates ts to µs first (Spark reads µs-truncated ns timestamps,
    // so gap comparisons must happen at the SAME precision on both sides —
    // FIXTURES.md pitfall); both window orderings carry the event_id
    // tiebreak so duplicate timestamps can't make session ids flap.
    "q_stream_session" ->
      ("WITH e0 AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events), " +
        "g AS (SELECT user_id, event_id, ts, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk " +
        "FROM e0 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) " +
        "SELECT user_id, date_trunc('second', min(ts)) AS sess_start, " +
        "count(*) AS n_events, " +
        "epoch_us(date_trunc('second', max(ts))) // 1000000 - epoch_us(date_trunc('second', min(ts))) // 1000000 + 1800 AS dur_s " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start"))
}
