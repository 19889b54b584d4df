package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Behavioral analytics (SURVEY.md §2.14): semantics on hand-built data and
  * plan-shape proof that the one-shuffle design holds. */
class BehaviorSpec extends SparkSpec {

  test("sessionize plan shuffles ONCE on user_id (window + both aggs reuse it)") {
    val plan = physicalPlan(Behavior.queries("q_sessionize")(spark, sf))
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange hashpartitioning"))
    // hashpartitioning(user_id) satisfies the window AND both downstream
    // group-bys ((user_id, sid) ⊇ user_id co-location) — a second exchange
    // would mean the key-subset reuse broke
    assert(exchanges == 1, s"expected exactly 1 hash exchange:\n$plan")
  }

  test("sessionize semantics: 30-min gap splits, boundary exactly at gap does not") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: 3 events, second exactly 30:00 later (NOT a new session —
      // the rule is strictly greater), third 30:01 after that (new session)
      (1L, 1L, t("2024-01-01 10:00:00")),
      (2L, 1L, t("2024-01-01 10:30:00")),
      (3L, 1L, t("2024-01-01 11:00:01")),
      // user 2: single event = single session
      (4L, 2L, t("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val out = ev
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s").over(run))
      .groupBy("user_id").agg(max("sid").as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 2L, s"30:00 gap keeps the session, 30:01 splits: $out")
    assert(out(2L) == 1L)
  }

  test("funnel stages are monotone non-increasing and bounded by user count") {
    val out = rows(Behavior.queries("q_funnel")(spark, sf))
      .map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.keySet == Set("1_signup", "2_then_view", "3_then_purchase"))
    assert(out("1_signup") >= out("2_then_view"))
    assert(out("2_then_view") >= out("3_then_purchase"))
    assert(out("1_signup") <= users)
  }

  test("gap-fill: spine is contiguous per user, counts zero-filled, ffill carries") {
    val got = rows(Behavior.queries("q_gap_fill")(spark, sf))
    val byUser = got.groupBy(_.head.asInstanceOf[Long])
    byUser.foreach { case (_, rws) =>
      val days = rws.map(_(1).asInstanceOf[java.sql.Date].toLocalDate)
      days.sliding(2).foreach { case Seq(a, b) =>
        assert(b == a.plusDays(1), s"spine must be contiguous: $a -> $b")
      }
      // once any revenue is seen, the forward fill never returns to null
      val revs = rws.map(_(3))
      val firstSeen = revs.indexWhere(_ != null)
      if (firstSeen >= 0)
        assert(revs.drop(firstSeen).forall(_ != null), "ffill must carry forward")
    }
    // zero-filled gap days exist in this data (cnt = 0 rows on the spine)
    assert(got.exists(_(2).asInstanceOf[Long] == 0L), "expected zero-filled days")
  }

  test("q_anomaly_mad equals a brute-force lower-median/MAD fold") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).map { case (et, rws) =>
      def lowerMedian[A](xs: Seq[(Double, A)])(implicit ord: Ordering[A]): Double = {
        val sorted = xs.sortBy(identity)(Ordering.Tuple2(Ordering.Double.TotalOrdering, ord))
        sorted(((sorted.size + 1) / 2) - 1)._1
      }
      val med = lowerMedian(rws.toSeq.map(r => (r._3, r._2)))
      val resid = rws.toSeq.map(r => (math.abs(r._3 - med), r._2))
      val mad = lowerMedian(resid)
      val outliers = resid.count(_._1 > mad * 6).toLong
      et -> ((med, mad, outliers, rws.size.toLong))
    }
    val got = rows(Behavior.queries("q_anomaly_mad")(spark, sf))
      .map(r => r(0).asInstanceOf[String] ->
        ((r(1).asInstanceOf[Double], r(2).asInstanceOf[Double],
          r(3).asInstanceOf[Long], r(4).asInstanceOf[Long]))).toMap
    assert(got == expected)
    // robustness sanity: every group found a non-negative mad and med is a
    // value actually present in the group
    got.foreach { case (et, (med, mad, _, _)) =>
      assert(mad >= 0.0)
      assert(ev.exists(r => r._1 == et && r._3 == med), s"$et med not an order statistic")
    }
  }

  test("q_events_ewma streaming fold is bit-equal to the collect_list spelling") {
    // the collect_list formulation this round replaced stays as the test
    // twin: same seed (first value in (ts, event_id) order), same IEEE op
    // sequence — outputs must be IDENTICAL doubles, not merely close
    val twin = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("evs"))
      .withColumn("vs", expr("transform(evs, e -> e.value)"))
      .select(col("user_id"), size(col("vs")).as("n_events"),
        round(expr(
          "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1), " +
            "(s, v) -> 0.5 * v + 0.5 * s)"), 6).as("ewma"))
      .orderBy("user_id")
    assert(rows(Behavior.queries("q_events_ewma")(spark, sf)) == rows(twin))
  }

  test("ewma fold survives a 1e6-event whale user with O(1) state and exact value") {
    import spark.implicits._
    // one whale (10^6 events) + two minnows sharing its partitions: the
    // collect_list spelling would buffer one million structs in a single
    // aggregation buffer; the fold's state is three scalars per user.
    // values are i % 97 so the expected fold is cheap to replay in Scala.
    val whale = spark.range(1000000L).select(
      lit(7L).as("user_id"), col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
      (col("id") % 97).cast("double").as("value"))
    val minnows = spark.range(2L).select(
      (col("id") + 100L).as("user_id"), (col("id") + 2000000L).as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id")).as("ts"),
      lit(3.5).as("value"))
    val got = Behavior.ewmaByUser(whale.unionByName(minnows))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    var acc = 0.0d // replay: seed 0 % 97 = 0, then s' = 0.5 v + 0.5 s
    (1L until 1000000L).foreach(i => acc = 0.5 * (i % 97).toDouble + 0.5 * acc)
    val expect = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(7L) == ((1000000, expect)), s"whale fold diverged: ${got(7L)}")
    assert(got(100L) == ((1, 3.5)) && got(101L) == ((1, 3.5)))
  }
}
