package graft.operators

import graft.Tables.ReportSortSyntax
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.ColumnOps._

/** SURVEY.md §2.5 (window functions) + §2.6's q_topk_per_group.
  *
  * Scale: the per-key windows (customer, user, brand) distribute across
  * executors — one shuffle on the partition key. THREE windows here are
  * global (single-task sort): q_window_ntile_pct's ranking (by design — its
  * distributed twin is q_window_ntile_dist), q_window_frame_range's
  * trailing-revenue frame (safe: it runs post-aggregation over one row per
  * DAY, not per order), and the 8-row partition-offset window inside
  * q_window_ntile_dist.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Ranking family; tie-free total order via the (price, orderkey) sort.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // Value-position family: first/last/nth within the partition's frame,
    // plus cume_dist — completes the window inventory beyond ranks/offsets.
    // The full-partition frame (unbounded both ways) makes first/nth/last
    // refer to the whole customer, not the running prefix.
    "q_window_nth" -> ((s, d) => {
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          first(col("o_orderkey")).over(full).as("top_order"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
          last(col("o_orderkey")).over(full).as("smallest_order"),
          round(cume_dist().over(ord), 6).as("cd"),
          row_number().over(ord).as("rn"))
        .filter(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    }),

    // Analytic family: lag/lead + running sum (decimal-exact) per user.
    "q_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(
          col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          sum(col("value").cast(DecimalType(18, 2))).over(wsum)
            .cast("double").as("run_sum"))
        .orderBy("event_id")
    }),

    // RANGE frame: 7-day trailing revenue over daily order totals. The
    // range frame runs over an integer day number (epoch days) so Spark and
    // DuckDB agree on frame bounds exactly.
    "q_window_frame_range" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("daily_dec"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
      val w = Window.orderBy("day_num").rangeBetween(-6, 0)
      daily.select(
        col("day"),
        col("daily_dec").cast("double").as("daily"),
        sum(col("daily_dec")).over(w).cast("double").as("trailing7"))
        .reportSort("day")
    }),

    // ntile + percent_rank. NOTE: unpartitioned window = single-task sort;
    // acceptable for a 15k-row dim snapshot, would be repartitionByRange +
    // global rank composition at 100 TB (documented in SCALE.md).
    "q_window_ntile_pct" -> ((s, d) => {
      val w = Window.orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, d)
        .select(
          col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct"))
        .orderBy("c_custkey")
    }),

    // The SAME ranking computed without a global window (SCALE.md §Windows):
    // range-repartition, rank locally per partition, then compose global
    // ranks from per-partition counts (a tiny 8-row prefix sum). This is the
    // 100 TB substitute for the single-task global sort above.
    "q_window_ntile_dist" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val ranged = c.repartitionByRange(8, col("c_acctbal"), col("c_custkey"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
      val local = ranged.withColumn("lrn", row_number().over(wLocal).cast("long"))
      val counts = local.groupBy("pid").agg(count(lit(1)).as("pn"))
      val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts
        .withColumn("off", coalesce(sum("pn").over(wOff), lit(0L)))
        .select("pid", "off")
      val total = counts.agg(sum("pn").as("n"))
      local.join(broadcast(offsets), "pid")
        .crossJoin(broadcast(total))
        .withColumn("grn", col("lrn") + col("off"))
        .select(
          col("c_custkey"), col("c_acctbal"),
          // standard NTILE bucketing: first (n % 4) buckets get one extra row
          expr("CAST(CASE WHEN grn <= (n % 4) * (n div 4 + 1) " +
            "THEN (grn - 1) div (n div 4 + 1) + 1 " +
            "ELSE (n % 4) + (grn - 1 - (n % 4) * (n div 4 + 1)) div (n div 4) + 1 END " +
            "AS INT)").as("quartile"),
          expr("CAST(grn - 1 AS DOUBLE) / (n - 1)").as("pct"))
        .orderBy("c_custkey")
    }),

    // Distributed top-k per group: rank within brand, keep top 2. Revenue is
    // ranked on the exact decimal so ordering is engine-independent.
    // r19: aggregate lineitem by l_partkey BEFORE the dim join (guide
    // §2.2/§3) — p_partkey is unique in part, so p_brand is functionally
    // determined by the key and the per-(brand, partkey) sums equal the
    // per-partkey sums; the broadcast probe now touches ~#parts aggregated
    // rows instead of every lineitem row, and the shuffle carries
    // (partkey, decimal) pairs with no brand string.
    // r19 follow-up: fanOutBy(l_partkey) — hash-repartition the
    // single-row-group scan on the aggregate's own key, so the decimal
    // revenue aggregation runs fully parallel after ONE exchange (the
    // groupBy's required partitioning is already satisfied; a round-robin
    // fan-out would have paid a second exchange).
    "q_topk_per_group" -> ((s, d) => {
      val rev = Tables.fanOutBy(Tables.lineitem(s, d), col("l_partkey"))
        .groupBy("l_partkey")
        .agg(sum(revenueExpr(col("l_extendedprice"), col("l_discount"))).as("rev_dec"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_partkey"), col("rev_dec"))
      val w = Window.partitionBy("p_brand").orderBy(col("rev_dec").desc, col("p_partkey"))
      rev.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("p_brand"), col("p_partkey"),
          col("rev_dec").cast("double").as("revenue"), col("rn"))
        .orderBy("p_brand", "rn")
    }),

    // Same result via the bounded mergeable TopKAggregator: the buffer holds
    // at most k pairs, so the shuffle carries k rows per (brand × partition)
    // instead of every part — the 100 TB top-k (SCALE.md §Windows).
    "q_topk_per_group_agg" -> ((s, d) => {
      import s.implicits._
      // r19: same aggregate-before-join + fanOutBy as q_topk_per_group
      val rev = Tables.fanOutBy(Tables.lineitem(s, d), col("l_partkey"))
        .groupBy("l_partkey")
        .agg(sum(revenueExpr(col("l_extendedprice"), col("l_discount"))).as("rev_dec"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_partkey"), col("rev_dec"))
      val ds = rev.select(col("p_brand"), col("p_partkey"),
        col("rev_dec").cast("decimal(38,18)"))
        .as[(String, Long, BigDecimal)]
      ds.groupByKey(_._1)
        .mapValues(t => graft.functions.RankedValue(t._3, t._2))
        .agg(new graft.functions.TopKAggregator(2).toColumn)
        .flatMap { case (brand, tops) =>
          tops.zipWithIndex.map { case (rv, i) => (brand, rv.id, rv.value, i + 1) }
        }
        .toDF("p_brand", "p_partkey", "rev", "rn")
        .select(col("p_brand"), col("p_partkey"),
          col("rev").cast("double").as("revenue"), col("rn"))
        .reportSort("p_brand", "rn")
    }),

    // TIME-interval RANGE frame (1 preceding hour per user) through the SQL
    // surface — the text runs VERBATIM in DuckDB as its own oracle (same
    // idiom as q_join_lateral). RANGE over a timestamp is set-based: rows
    // tied on ts are frame peers, so the result is deterministic without an
    // event_id tiebreak. One shuffle on user_id; per-row frame state is the
    // sliding hour, not the partition. (The events view comes from
    // Tables.table, so ts arrives rebuilt on the Spark side; the
    // parquet ns timestamps are µs-aligned, so both engines see identical
    // instants.)
    "q_window_time_range" -> ((s, d) => {
      // r19: register only the view the SQL reads — registerAll opened all
      // 10 parquet footers per execution for a query that touches events
      // alone (the accessor still goes through Tables.table, so ts arrives
      // rebuilt exactly as registerAll would have registered it).
      graft.Tables.table(s, d, "events").createOrReplaceTempView("events")
      s.sql(TimeRangeSql)
    }),

    // RATIO-TO-REPORT: each nation's share of its region's revenue — the
    // unframed partition-total window (sum OVER (PARTITION BY region)
    // with no ORDER BY = the whole partition as frame). The window sum
    // runs on the EXACT DECIMAL, so partial order can't move it; the one
    // double division per row happens after, then round(6). Cost shape:
    // the star join aggregates to one row per nation BEFORE the window,
    // so the window's partition state is ≤ nations-per-region rows. */
    "q_window_share" -> ((s, d) => {
      val rev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_d"))
      val w = Window.partitionBy("r_name")
      rev
        .withColumn("region_rev_d", sum(col("rev_d")).over(w))
        .select(col("r_name"), col("n_name"),
          col("rev_d").cast("double").as("revenue"),
          round(col("rev_d").cast("double") /
            col("region_rev_d").cast("double"), 6).as("share"))
        .reportSort("r_name", "n_name")
    }))

  /** Runs verbatim in both Spark and DuckDB. */
  lazy val TimeRangeSql: String =
    "SELECT event_id, user_id, " +
      "CAST(count(*) OVER w AS INTEGER) AS cnt_1h, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h " +
      "FROM events " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
      "ORDER BY event_id"

  val oracles: Map[String, String] = Map(
    "q_window_share" ->
      ("WITH rev AS (SELECT r_name, n_name, " +
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name) " +
        "SELECT r_name, n_name, CAST(rev_d AS DOUBLE) AS revenue, " +
        "round(CAST(rev_d AS DOUBLE) / " +
        "CAST(SUM(rev_d) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share " +
        "FROM rev ORDER BY r_name, n_name"),
    "q_window_time_range" -> TimeRangeSql,
    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "CAST(row_number() OVER w AS INTEGER) AS rn, " +
        "CAST(rank() OVER w AS INTEGER) AS rnk, " +
        "CAST(dense_rank() OVER w AS INTEGER) AS drnk " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)" +
        ") WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_window_nth" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, top_order, second_order, " +
        "smallest_order, cd, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "first_value(o_orderkey) OVER wf AS top_order, " +
        "nth_value(o_orderkey, 2) OVER wf AS second_order, " +
        "last_value(o_orderkey) OVER wf AS smallest_order, " +
        "round(cume_dist() OVER w, 6) AS cd, " +
        "CAST(row_number() OVER w AS INTEGER) AS rn " +
        "FROM orders WINDOW " +
        "w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey), " +
        "wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)" +
        ") WHERE rn <= 2 ORDER BY o_custkey, rn"),
    "q_window_analytic" ->
      ("SELECT event_id, user_id, value, " +
        "lag(value, 1) OVER w AS prev_v, lead(value, 1) OVER w AS next_v, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id) " +
        "ORDER BY event_id"),
    "q_window_frame_range" ->
      ("SELECT day, CAST(daily_dec AS DOUBLE) AS daily, " +
        "CAST(SUM(daily_dec) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing7 " +
        "FROM (SELECT CAST(o_orderdate AS DATE) AS day, " +
        "CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_num, " +
        "SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS daily_dec " +
        "FROM orders GROUP BY 1, 2) ORDER BY day"),
    "q_window_ntile_pct" ->
      ("SELECT c_custkey, c_acctbal, CAST(ntile(4) OVER w AS INTEGER) AS quartile, " +
        "percent_rank() OVER w AS pct FROM customer " +
        "WINDOW w AS (ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey"),
    // identical semantics, distributed formulation — same oracle
    "q_window_ntile_dist" ->
      ("SELECT c_custkey, c_acctbal, CAST(ntile(4) OVER w AS INTEGER) AS quartile, " +
        "percent_rank() OVER w AS pct FROM customer " +
        "WINDOW w AS (ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey"),
    "q_topk_per_group" ->
      ("SELECT p_brand, p_partkey, CAST(rev_dec AS DOUBLE) AS revenue, rn FROM (" +
        "SELECT p_brand, p_partkey, rev_dec, " +
        "CAST(row_number() OVER (PARTITION BY p_brand ORDER BY rev_dec DESC, p_partkey) AS INTEGER) AS rn " +
        "FROM (SELECT p_brand, p_partkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev_dec " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand, p_partkey)" +
        ") WHERE rn <= 2 ORDER BY p_brand, rn"),
    // identical semantics via the bounded aggregator — same oracle
    "q_topk_per_group_agg" ->
      ("SELECT p_brand, p_partkey, CAST(rev_dec AS DOUBLE) AS revenue, rn FROM (" +
        "SELECT p_brand, p_partkey, rev_dec, " +
        "CAST(row_number() OVER (PARTITION BY p_brand ORDER BY rev_dec DESC, p_partkey) AS INTEGER) AS rn " +
        "FROM (SELECT p_brand, p_partkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev_dec " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand, p_partkey)" +
        ") WHERE rn <= 2 ORDER BY p_brand, rn"))
}
