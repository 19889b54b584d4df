package graft.operators

import graft.Tables.ReportSortSyntax
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ColumnOps._

/** SURVEY.md §2.3 — joins. The reference has no joins at all [U, §1]; this is
  * the "spark-surface" capability a usable analytics engine over the star
  * schema needs.
  *
  * Scale strategy (100 TB): dimension tables (region/nation/part/customer at
  * typical star-schema ratios) are broadcast — no shuffle of the fact table.
  * Fact-fact joins shuffle on the join key; AQE converts to broadcast at
  * runtime when a side turns out small, and splits skewed partitions.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  /** Run `body` with session confs set, restoring each key's PRIOR state
    * (set-back or unset) afterwards — so an opt-in optimizer-rule conf can
    * never leak into an unrelated future query's planning. Callers that
    * need a rule applied must force optimization INSIDE the scope (the
    * optimizer reads SQLConf lazily at first action, not at DataFrame
    * construction): `df.queryExecution.optimizedPlan` pins the rewritten
    * plan before the conf is restored.
    *
    * Concurrency (ADVICE r11): scoped sections SERIALIZE on a per-JVM
    * lock, so two conf-scoped builders can no longer interleave their
    * set/restore and clobber each other's state or plan with the wrong
    * rule set. Residual cross-talk: a concurrent query planned OUTSIDE
    * any withConf scope can still observe the conf mid-scope — harmless
    * for the opt-in rewrite rules scoped here (they fire only on their
    * own plan patterns), but a caller needing full isolation should build
    * on `spark.newSession()` (own SQLConf, shared context) instead. */
  private val confScopeLock = new Object
  private[graft] def withConf[T](s: SparkSession, kvs: (String, String)*)(body: => T): T =
    confScopeLock.synchronized {
      val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }

  /** Warehouse table name for a bucketed copy of `stem` (per sfDir — the
    * test/verify/bench scales must not clobber each other's buckets). */
  private[graft] def bucketTable(d: String, stem: String): String =
    s"graft_b_${stem}_" + d.replaceAll("[^A-Za-z0-9]", "_")

  // One bucketing pass per (session, sfDir): lineitem + orders written
  // bucketed AND sorted by the join key (16 buckets). Rows are unchanged, so
  // every oracle stays the plain-table SQL.
  private val bucketCache = new graft.SessionCache[java.lang.Boolean]()
  // The in-memory catalog dies with the JVM but the warehouse directory
  // survives; a fresh session's saveAsTable then fails with
  // LOCATION_ALREADY_EXISTS (create, not overwrite — the table is unknown
  // to the new catalog). Clear such orphaned locations first.
  private def clearOrphanLocation(s: SparkSession, table: String): Unit =
    if (!s.catalog.tableExists(table)) {
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

  private[graft] def ensureBucketed(s: SparkSession, d: String): Unit =
    bucketCache.getOrBuild(s, d) {
      clearOrphanLocation(s, bucketTable(d, "lineitem"))
      clearOrphanLocation(s, bucketTable(d, "orders"))
      Tables.lineitem(s, d).write.mode("overwrite")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(bucketTable(d, "lineitem"))
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(bucketTable(d, "orders"))
      java.lang.Boolean.TRUE
    }

  /** Blocked edit-distance join (PassJoin partition signatures — Li, Deng,
    * Feng, "PASS-JOIN: A Partition-based Method for Similarity Joins",
    * PVLDB 5(3), 2011): the scale-safe shape of `q_join_fuzzy`, whose
    * broadcast nested loop is only right for a dim-sized side.
    *
    * Scheme: each right string of length n splits into k+1 contiguous
    * segments. If ed(t, s) ≤ k, an optimal alignment edits at most k of
    * the k+1 segments (pigeonhole), so at least one segment survives
    * verbatim in t, displaced by at most k positions (the net
    * insertions/deletions before it), and |n − |t|| ≤ k. The probe side
    * therefore generates, for each candidate right-length n within ±k and
    * each segment index, the substrings at the segment's position ±k —
    * O((2k+1)²(k+1)) keys per row, a CONSTANT — and candidates come from a
    * plain equi-join on (n, segment index, segment content): linear
    * candidate space, shuffle-partitioned, NO nested loop (plan-asserted
    * in OperatorSpec). Exact verification (levenshtein ≤ k) runs only on
    * candidates, so the result provably EQUALS the unblocked join — this
    * is guaranteed-complete blocking, not a recall heuristic. */
  private[graft] def fuzzyJoinBlocked(a: DataFrame, aCol: String,
      b: DataFrame, bCol: String, k: Int): DataFrame = {
    require(aCol != bCol, "rename the join columns apart first")
    val kp1 = k + 1
    // segment geometry for a length-n string: k+1 contiguous parts, the
    // last (n mod (k+1)) parts one char longer (1-based start positions)
    def segLen(n: Column, i: Column): Column = {
      val rem = pmod(n, lit(kp1))
      ((n - rem) / kp1).cast("int") +
        when(i >= lit(kp1) - rem, 1).otherwise(0)
    }
    def segStart(n: Column, i: Column): Column = {
      val rem = pmod(n, lit(kp1))
      (i * ((n - rem) / kp1).cast("int") +
        greatest(lit(0), i - (lit(kp1) - rem)) + 1).cast("int")
    }
    val segs = b.select(col(bCol), explode(array((0 to k).map { i =>
      val n = length(col(bCol))
      struct(n.as("n"), lit(i).as("i"),
        col(bCol).substr(segStart(n, lit(i)), segLen(n, lit(i))).as("sig"))
    }: _*)).as("s"))
      .select(col(bCol), col("s.n"), col("s.i"), col("s.sig"))
    // The (2k+1)²(k+1) probe combos are DATA (one typedLit array literal),
    // not expression nodes: the signature is computed once inside a single
    // transform lambda. Unrolling the combos into per-key struct columns
    // (196 substr/when trees at k=3) makes analysis + whole-stage codegen
    // of the probe projection the dominant cost — ~10 s per run at k=3
    // regardless of data size — where this shape plans in milliseconds.
    val combos = typedLit(for { d <- -k to k; i <- 0 to k; shift <- -k to k }
      yield (d, i, shift))
    val probeArr = array_distinct(transform(combos, p => {
      val m = length(col(aCol))
      val n = m + p.getField("_1")
      val i = p.getField("_2")
      val len = segLen(n, i)
      val pos = segStart(n, i) + p.getField("_3")
      val sig = when(n >= 0 && len === 0, lit("")) // short right strings: empty segment matches trivially
        .when(pos >= 1 && pos + len - 1 <= m, col(aCol).substr(pos, len))
        .otherwise(lit(null))
      struct(n.as("n"), i.as("i"), sig.as("sig"))
    }))
    val probes = a.select(col(aCol), explode(probeArr).as("p"))
      .filter(col("p.sig").isNotNull)
      .select(col(aCol), col("p.n"), col("p.i"), col("p.sig"))
    probes.join(segs, Seq("n", "i", "sig"))
      .select(col(aCol), col(bCol)).distinct()
      .withColumn("dist", levenshtein(col(aCol), col(bCol)))
      .filter(col("dist") <= k)
  }

  val queries: Map[String, Q] = Map(
    // Explicit broadcast of the 5-row dim: BroadcastHashJoin, zero shuffle.
    "q_join_broadcast" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
        .reportSort("r_name")),

    // Equi-join, Catalyst picks the physical strategy (broadcast at this
    // scale; sort-merge/shuffled-hash when both sides are large).
    "q_join_hash" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sumExact2(col("o_totalprice")).as("revenue"))
        .reportSort("c_mktsegment")),

    // 4-way star join: fact table joined to progressively smaller dims —
    // customer/nation broadcast; lineitem⋈orders co-shuffles on orderkey.
    // (r19: a fanOut ahead of the broadcast probes was measured SLOWER —
    // 1.13 → 1.7 s — the per-row work is three cheap hash probes, below
    // the exchange's own cost; see OPTIMIZATION_r19.md.)
    "q_join_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sumExact(revenueExpr(col("l_extendedprice"), col("l_discount")), 4)
          .as("revenue"))
        .reportSort("n_name")),

    // Left-semi ("has orders") and left-anti ("has none") as one 2-row frame.
    "q_join_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("kind"), col("cnt"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")).select(lit("without_orders").as("kind"), col("cnt"))
      semi.union(anti).reportSort("kind")
    }),

    // Left-outer with 0-filled counts; customers with no orders first.
    "q_join_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("n_orders", "c_custkey")),

    // Equi key + theta residual: stays a hash/sort-merge join on the equi key
    // with the range predicate as a post-join filter — NOT a nested loop.
    "q_join_theta_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") && col("l_quantity") < col("p_size"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), sumExact2(col("l_quantity")).as("sum_qty"))
        .reportSort("p_brand")),

    // Pure non-equi join (no equi key at all) => BroadcastNestedLoopJoin.
    // Deliberately bounded to the 25-row dim: the nested loop is O(n*m) and
    // only sane when one side broadcasts — the plan shape the optimizer
    // must NOT pick for large sides (see q_join_theta_range, which keeps
    // its equi key precisely to avoid this).
    "q_join_cross_ineq" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val n1 = n.select(col("n_nationkey").as("k1"), col("n_regionkey").as("r1"))
      val n2 = n.select(col("n_nationkey").as("k2"))
      n1.join(n2, col("k1") < col("k2"))
        .groupBy("r1").agg(count(lit(1)).as("n_pairs"))
        .reportSort("r1")
    }),

    // Interval-overlap join on the SCALE path: each order carries a
    // [start, end) validity interval (start = o_orderdate, length =
    // o_orderkey%30+1 days — deterministic so DuckDB rebuilds it); 25
    // maintenance windows (90-day cadence, 45-day width) must find every
    // overlapping order. The naive form is a pure inequality join —
    // a nested loop that dies when BOTH sides are large (the dim here is
    // broadcastable, but real interval joins — sessions × incidents — are
    // not). The scale shape: EXPLODE each interval into the fixed-width
    // time buckets it covers (45-day grid ⇒ ≤2 buckets per short order
    // interval, 2 per window), EQUI-join on the bucket id, re-check the
    // exact overlap predicate, and de-dup pairs that met in two buckets.
    // All arithmetic in day numbers from a fixed epoch — identical
    // integer math in both engines, no interval-type divergence. At
    // 100 TB both sides shuffle on the bucket id (bounded fan-out ≤
    // ceil(len/bucket)+1), never a cartesian; bucket width tunes fan-out
    // vs per-bucket pair volume exactly like LSH band width.
    "q_join_interval" -> ((s, d) => {
      val bucket = 45
      // day number from 1990-01-01; 1995-01-01 is day 1826
      val day0 = to_date(lit("1990-01-01"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), day0).as("os"),
          (datediff(to_date(col("o_orderdate")), day0)
            + pmod(col("o_orderkey"), lit(30)) + lit(1)).as("oe"))
      val w = Tables.nation(s, d).select(col("n_nationkey").as("w_id"),
          (lit(1826) + col("n_nationkey") * lit(90)).as("ws"),
          (lit(1826) + col("n_nationkey") * lit(90) + lit(45)).as("we"))
      def explodeBuckets(df: DataFrame, s0: String, e0: String) =
        df.withColumn("bk",
          explode(sequence(floor(col(s0) / bucket).cast("int"),
            floor((col(e0) - 1) / bucket).cast("int"))))
      explodeBuckets(o, "os", "oe")
        .join(explodeBuckets(w, "ws", "we"), Seq("bk"))
        .filter(col("os") < col("we") && col("ws") < col("oe"))
        .select("w_id", "o_orderkey").distinct()
        .groupBy("w_id").agg(count(lit(1)).as("cnt"))
        .reportSort("w_id")
    }),

    // The SAME interval-overlap join written NAIVELY (pure inequality
    // condition — the declarative spelling a user would write) and rewritten
    // to the bucket-blocked equi-join AUTOMATICALLY by the injected
    // IntervalJoinRewrite optimizer rule (plans/IntervalJoinRewrite.scala;
    // opt-in conf, enabled here). Same oracle as q_join_interval — the
    // rewrite must be invisible in the results; the spec asserts the plan
    // flipped from nested-loop to an equi-join and flips back when the rule
    // is disabled. The rule confs are SCOPED to this builder (withConf
    // restores prior state — VERDICT r10 #6), and the rewrite is BAKED
    // INTO the returned logical plan: the optimized plan (rule applied,
    // conf still on) is re-wrapped as the query's own plan via
    // GraftBridge.ofRows, so every downstream execution — Bench's noop
    // write and Verify's parquet write each build a FRESH QueryExecution
    // around the logical plan — runs the equi-join with the conf off.
    // (A first cut only forced df.queryExecution.optimizedPlan, which
    // pins the CACHED execution df's own actions use but leaves every
    // write-path re-optimization a nested loop — caught by the
    // freshExecutedPlan spec probe.) Re-optimizing the rewritten plan is
    // a no-op for the rule: its fixed-point guard sees the bk equi
    // conjunct and the conf is off anyway.
    "q_join_interval_auto" -> ((s, d) =>
      withConf(s,
        "spark.graft.intervalJoin.enabled" -> "true",
        "spark.graft.intervalJoin.bucket" -> "45") {
        val day0 = to_date(lit("1990-01-01"))
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), day0).as("os"),
          (datediff(to_date(col("o_orderdate")), day0)
            + pmod(col("o_orderkey"), lit(30)) + lit(1)).as("oe"))
        val w = Tables.nation(s, d).select(col("n_nationkey").as("w_id"),
          (lit(1826) + col("n_nationkey") * lit(90)).as("ws"),
          (lit(1826) + col("n_nationkey") * lit(90) + lit(45)).as("we"))
        val df = w.join(o, col("os") < col("we") && col("ws") < col("oe"))
          .groupBy("w_id").agg(count(lit(1)).as("cnt"))
          .reportSort("w_id")
        org.apache.spark.sql.GraftBridge.ofRows(s,
          df.queryExecution.optimizedPlan)
      }),

    // Salted fact-dim equi-join for skewed keys: the fact side gets a
    // deterministic per-row salt in [0, 8), the dim side is replicated once
    // per salt value, and the join key becomes (key, salt) — so one hot
    // orderkey's rows spread across 8 reducers instead of one straggler.
    // Replication factor × dim size is the cost; result set is EXACTLY the
    // plain join (every fact row still meets its dim row, in exactly one
    // salt bucket), so the oracle is the unsalted join. AQE's skew-join
    // split is the automatic alternative; this is the explicit form for
    // engines/sinks where AQE can't reach (SCALE.md §skew).
    // shuffle_hash (r19): salting exists to spread a SHUFFLED join's hot
    // key across reducers — but Catalyst sizes the dim by its pre-explode
    // scan estimate and picked a broadcast join, replicating the ×salts
    // dim into one driver-built hash relation per execution (the exact
    // single-node hotspot salting is meant to avoid; guide §3.1 "estimates
    // are often badly wrong after explode"). The hint restores the shape
    // the operator demonstrates and the shape that survives a dim too big
    // to broadcast; measured 1.74 s → see OPTIMIZATION_r19.md.
    "q_join_salted" -> ((s, d) => {
      val salts = 8
      val fact = Tables.lineitem(s, d)
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
      val dim = Tables.orders(s, d)
        .withColumn("salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
        .hint("shuffle_hash")
      fact.join(dim, fact("l_orderkey") === dim("o_orderkey") && fact("salt") === dim("salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sumExact(revenueExpr(col("l_extendedprice"), col("l_discount")), 4)
            .as("revenue"))
        .reportSort("o_orderpriority")
    }),

    // Production-shape skew handling: TWO-PHASE targeted salting. The naive
    // q_join_salted replicates the ENTIRE dim ×salts — that cost scales
    // with the dim and dies at 1000×. The shape that survives: (1) find the
    // hot keys (a grouped count — its output is tiny by definition of
    // "hot"), broadcast that set; (2) salt ONLY hot-key rows on the fact
    // side and explode ONLY hot-key rows on the dim side. Cold keys pay
    // nothing. Skew is synthesized deterministically (80% of events land on
    // user 1 — the testdata is uniform); result provably equals the
    // unsalted join, so the oracle is the plain formulation. The
    // shuffle_hash hint keeps the join a real shuffled join at test scale
    // (the 150-row dim would otherwise broadcast and hide the mechanics).
    "q_join_salted_hot" -> ((s, d) => {
      val salts = 8
      val fact = Tables.events(s, d)
        .withColumn("uid", when(col("event_id") % 10 < 8, lit(1L))
          .otherwise(col("user_id")))
      val dim = Tables.events(s, d).select(col("user_id").as("du")).distinct()
      // hot = carries more than 1/50 of all rows; hotKeys' output is ≤49
      // rows by definition, so the broadcasts below are always safe
      val hot = graft.functions.SkewOps.hotKeys(fact, "uid", 50)
      val f2 = fact.join(broadcast(hot), col("uid") === col("hk"), "left")
        .withColumn("salt", when(col("hk").isNull, lit(0L))
          .otherwise(pmod(xxhash64(col("event_id")), lit(salts))))
        .drop("hk")
      val d2 = dim.join(broadcast(hot), col("du") === col("hk"), "left")
        .withColumn("salt", explode(when(col("hk").isNull, array(lit(0L)))
          .otherwise(array((0 until salts).map(i => lit(i.toLong)): _*))))
        .drop("hk")
      f2.join(d2.hint("shuffle_hash"),
          f2("uid") === d2("du") && f2("salt") === d2("salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 4))).cast("double").as("sum_value"))
        .reportSort("event_type")
    }),

    // Co-located (bucketed) join: both fact tables pre-written bucketed by
    // the join key into the session warehouse — the join then reads
    // co-partitioned buckets and needs NO Exchange on either side (asserted
    // in OperatorSpec). This is THE 100 TB fact-fact join strategy: pay the
    // bucketing shuffle once at ingest, never again across the join-heavy
    // workload. The bucket write is memoized per (session, sfDir) — same
    // build-once economics as the ANN indexes. The merge hint keeps the
    // plan SortMergeJoin at test scale (Catalyst would broadcast the small
    // side here; at production scale SMJ is what it picks anyway).
    "q_join_bucketed" -> ((s, d) => {
      ensureBucketed(s, d)
      s.table(bucketTable(d, "lineitem"))
        .join(s.table(bucketTable(d, "orders")).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sumExact(revenueExpr(col("l_extendedprice"), col("l_discount")), 4)
            .as("revenue"))
        .reportSort("o_orderpriority")
    }),

    // Correlated LATERAL subquery (top-2 customers by balance per nation)
    // through the SQL surface — Catalyst decorrelates the per-row dependent
    // subquery (DomainJoin rewrite) instead of executing it N times; the
    // same SQL text runs verbatim in DuckDB as the oracle.
    "q_join_lateral" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(LateralSql)
    }),

    // Null-safe equality join (<=>): the NULL-keyed group joins ITSELF
    // instead of being dropped like `=` would — the semantics entity stores
    // need for "unset property" keys. Keys are synthesized via nullif
    // (status 'P' -> NULL) since the testdata has no physical nulls.
    "q_join_nullsafe" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("k", expr("nullif(o_orderstatus, 'P')"))
      val left = o.groupBy("k").agg(count(lit(1)).as("cnt_all"))
      val right = o.filter(col("o_totalprice") > 150000)
        .groupBy("k").agg(count(lit(1)).as("cnt_big"))
        .withColumnRenamed("k", "rk")
      left.join(right, col("k") <=> col("rk"), "left_outer")
        .select(coalesce(col("k"), lit("UNSET")).as("status"),
          col("cnt_all"), coalesce(col("cnt_big"), lit(0L)).as("cnt_big"))
        .reportSort("status")
    }),

    // Fuzzy (edit-distance) self-join on nation names: levenshtein <= 3,
    // deliberately bounded to the 25-row dim where the O(n*m) broadcast
    // nested loop is the right plan. q_join_fuzzy_blocked below is the
    // scale shape; this one doubles as its oracle-provable twin.
    "q_join_fuzzy" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val a = n.select(col("n_name").as("na"))
      val b = n.select(col("n_name").as("nb"))
      a.join(b, col("na") < col("nb") && levenshtein(col("na"), col("nb")) <= 3)
        .select(col("na"), col("nb"), levenshtein(col("na"), col("nb")).as("dist"))
        .orderBy("na", "nb")
    }),

    // The SCALE shape of the fuzzy join: PassJoin partition-signature
    // blocking (guaranteed complete — see fuzzyJoinBlocked) makes the
    // candidate space linear and the join a shuffled equi-join, no nested
    // loop (plan-asserted in OperatorSpec). Same rows, same oracle as
    // q_join_fuzzy.
    "q_join_fuzzy_blocked" -> ((s, d) => {
      val n = Tables.nation(s, d)
      fuzzyJoinBlocked(
        n.select(col("n_name").as("na")),
        "na",
        n.select(col("n_name").as("nb")),
        "nb", 3)
        .filter(col("na") < col("nb"))
        .select(col("na"), col("nb"), col("dist"))
        .orderBy("na", "nb")
    }),

    // Same as-of semantics through the custom whole-operator path
    // (AsOfJoinPlan -> AsOfStrategy -> AsOfJoinExec, SCALE.md §Joins): two
    // co-shuffled sorted streams merged with O(1) state per partition.
    // Bit-identical output => same DuckDB oracle as q_join_asof.
    "q_join_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
      graft.plans.AsOf.joinLatestPrior(purchases, clicks,
        key = "user_id", ts = "ts", tie = "event_id",
        tsOutName = "last_click_ts")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).cast("timestamp_ntz").as("ts_s"),
          date_trunc("second", col("last_click_ts")).cast("timestamp_ntz")
            .as("click_ts_s"))
        .orderBy("event_id")
    }),

    // As-of with TOLERANCE: like q_join_asof but a prior click only counts
    // within the last 15 minutes (pandas merge_asof's `tolerance`, kdb's
    // windowed aj) — stale state must not join. Same single user_id shuffle;
    // the tolerance is a post-window filter on the matched timestamp.
    "q_join_asof_tolerance" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("click_ts_tol",
          when(col("last_click_ts") >= col("ts") - expr("INTERVAL 15 MINUTES"),
            col("last_click_ts")))
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).cast("timestamp_ntz").as("ts_s"),
          date_trunc("second", col("click_ts_tol")).cast("timestamp_ntz")
            .as("click_ts_s"))
        .orderBy("event_id")
    }),

    // As-of join (latest prior 'click' for each 'purchase', per user) as a
    // window over the unioned event stream: one shuffle on user_id, no
    // row-at-a-time lookup. SURVEY.md §2.3 chose this formulation so the
    // DuckDB oracle can express it identically.
    "q_join_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          // date_trunc yields LTZ even for NTZ input; cast back so the
          // parquet output stays a naive timestamp like DuckDB's.
          date_trunc("second", col("ts")).cast("timestamp_ntz").as("ts_s"),
          date_trunc("second", col("last_click_ts")).cast("timestamp_ntz").as("click_ts_s"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "q_join_broadcast" ->
      "SELECT r_name, count(*) AS n_nations FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
    "q_join_hash" ->
      "SELECT c_mktsegment, count(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "q_join_multi" ->
      "SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    // targeted salting provably equals the unsalted join
    "q_join_salted_hot" ->
      ("WITH fact_sk AS (SELECT event_type, value, CASE WHEN event_id % 10 < 8 THEN 1 ELSE user_id END AS uid FROM events), " +
        "dim_sk AS (SELECT DISTINCT user_id AS du FROM events) " +
        "SELECT event_type, count(*) AS cnt, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM fact_sk JOIN dim_sk ON uid = du GROUP BY event_type ORDER BY event_type"),
    // bucketing only changes the physical layout, never the rows
    "q_join_bucketed" ->
      "SELECT o_orderpriority, count(*) AS cnt, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q_join_semi_anti" ->
      "SELECT 'with_orders' AS kind, count(*) AS cnt FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders) UNION ALL SELECT 'without_orders' AS kind, count(*) AS cnt FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY kind",
    "q_join_outer" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY n_orders, c_custkey",
    "q_join_theta_range" ->
      "SELECT p_brand, count(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity < p_size GROUP BY p_brand ORDER BY p_brand",
    "q_join_cross_ineq" ->
      "SELECT n1.n_regionkey AS r1, count(*) AS n_pairs FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey GROUP BY 1 ORDER BY 1",
    // bucket blocking is complete (every overlapping pair shares >=1 covered
    // bucket), so the oracle is the plain inequality join — shared verbatim
    // by the rule-rewritten twin below
    "q_join_interval_auto" ->
      ("WITH o AS (SELECT o_orderkey, " +
        "datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS os, " +
        "datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) + (o_orderkey % 30) + 1 AS oe " +
        "FROM orders), " +
        "w AS (SELECT n_nationkey AS w_id, 1826 + n_nationkey * 90 AS ws, " +
        "1826 + n_nationkey * 90 + 45 AS we FROM nation) " +
        "SELECT w_id, count(*) AS cnt FROM w JOIN o ON os < we AND ws < oe " +
        "GROUP BY w_id ORDER BY w_id"),
    "q_join_interval" ->
      ("WITH o AS (SELECT o_orderkey, " +
        "datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS os, " +
        "datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) + (o_orderkey % 30) + 1 AS oe " +
        "FROM orders), " +
        "w AS (SELECT n_nationkey AS w_id, 1826 + n_nationkey * 90 AS ws, " +
        "1826 + n_nationkey * 90 + 45 AS we FROM nation) " +
        "SELECT w_id, count(*) AS cnt FROM w JOIN o ON os < we AND ws < oe " +
        "GROUP BY w_id ORDER BY w_id"),
    "q_join_salted" ->
      ("SELECT o_orderpriority, count(*) AS cnt, " +
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_join_lateral" -> LateralSql,
    "q_join_nullsafe" ->
      ("WITH o AS (SELECT nullif(o_orderstatus, 'P') AS k, o_totalprice FROM orders), " +
        "l AS (SELECT k, count(*) AS cnt_all FROM o GROUP BY k), " +
        "r AS (SELECT k AS rk, count(*) AS cnt_big FROM o WHERE o_totalprice > 150000 GROUP BY k) " +
        "SELECT COALESCE(l.k, 'UNSET') AS status, cnt_all, COALESCE(cnt_big, 0) AS cnt_big " +
        "FROM l LEFT JOIN r ON l.k IS NOT DISTINCT FROM r.rk ORDER BY status"),
    "q_join_fuzzy" ->
      ("SELECT a.n_name AS na, b.n_name AS nb, " +
        "CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist " +
        "FROM nation a JOIN nation b ON a.n_name < b.n_name " +
        "AND levenshtein(a.n_name, b.n_name) <= 3 ORDER BY na, nb"),
    // blocking is guaranteed complete, so the blocked query shares the
    // unblocked oracle verbatim
    "q_join_fuzzy_blocked" ->
      ("SELECT a.n_name AS na, b.n_name AS nb, " +
        "CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist " +
        "FROM nation a JOIN nation b ON a.n_name < b.n_name " +
        "AND levenshtein(a.n_name, b.n_name) <= 3 ORDER BY na, nb"),
    "q_join_asof" -> AsOfOracleSql,
    "q_join_asof_native" -> AsOfOracleSql,
    "q_join_asof_tolerance" ->
      ("SELECT event_id, user_id, date_trunc('second', ts) AS ts_s, " +
        "date_trunc('second', CASE WHEN last_click_ts >= ts - INTERVAL 15 MINUTE " +
        "THEN last_click_ts END) AS click_ts_s FROM (" +
        "SELECT event_id, user_id, ts, event_type, " +
        "last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts " +
        "FROM events) WHERE event_type = 'purchase' ORDER BY event_id"))

  /** Runs verbatim in both Spark and DuckDB. Lazy: referenced from the
    * `oracles` val above, which initializes before this definition. */
  lazy val LateralSql: String =
    "SELECT n_name, c_custkey, c_acctbal FROM nation, " +
      "LATERAL (SELECT c_custkey, c_acctbal FROM customer " +
      "WHERE c_nationkey = n_nationkey " +
      "ORDER BY c_acctbal DESC, c_custkey LIMIT 2) " +
      "ORDER BY n_name, c_acctbal DESC, c_custkey"

  private lazy val AsOfOracleSql: String =
    "SELECT event_id, user_id, date_trunc('second', ts) AS ts_s, date_trunc('second', last_click_ts) AS click_ts_s FROM (SELECT event_id, user_id, ts, event_type, last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts FROM events) WHERE event_type = 'purchase' ORDER BY event_id"
}
