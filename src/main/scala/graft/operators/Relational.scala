package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.ReportSortSyntax

/** SURVEY.md §2.1 (scans/sources/sinks), §2.2 (projection/filter/predicates),
  * §2.6 (sort/limit/top-k), §2.7 (set ops).
  *
  * These reproduce the reference's Datastore-query semantics — keys-only
  * scans, property filters, projections, sort+limit+cursor — as declarative
  * DataFrame plans [U capability model, SURVEY.md §1; reference checkout is
  * empty, SURVEY.md §0]. Scale notes per query inline: every filter and
  * projection here is pushed into the parquet scan by Catalyst, so at 100 TB
  * the scan reads only the referenced columns and skips row groups via
  * min/max stats.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // Session-cached JSONL copy of the documents table for q_source_jsonl —
  // the copy is the test fixture (testdata ships parquet only); the query
  // under test is the schema-pinned JSONL READ path.
  private val jsonlCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def jsonlDocsFor(s: SparkSession, d: String): String =
    jsonlCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-jsonl-docs")
      val path = s"$root/documents.jsonl"
      Tables.documents(s, d).write.mode("overwrite").json(path)
      path
    }

  // Session-cached CSV copy for q_source_csv (same fixture economics).
  // Quote-all on write so the text column's trailing spaces survive the
  // round trip; the read side disables whitespace trimming to match.
  private val csvCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def csvDocsFor(s: SparkSession, d: String): String =
    csvCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-csv-docs")
      val path = s"$root/documents.csv"
      Tables.documents(s, d).write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true").csv(path)
      path
    }

  // Per-(session, sfDir) base table for q_sink_partitioned: the events
  // table written ONCE partitioned by day; the declared query then
  // dynamic-overwrites one day per run (idempotent — same restatement
  // every time) and reads the final state back.
  private val dpoCache = new graft.SessionCache[String](graft.TempDirs.delete)
  // Serializes the per-invocation restatement write: two concurrent
  // builds of q_sink_partitioned in one session would race Spark's
  // commit protocol on the same partition directory (the same
  // concurrent-build class ADVICE r9 flagged on the bloom temp views).
  private[graft] val dpoWriteLock = new Object
  private[graft] def dayEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("ts").cast("date").as("day"),
      col("event_type"), col("value"))
  private def dpoDirFor(s: SparkSession, d: String): String =
    dpoCache.getOrBuild(s, d) {
      val dir = graft.TempDirs.create("graft-dpo")
      graft.sources.Sinks.overwritePartitions(
        dayEvents(s, d), dir, Seq("day"))
      dir
    }

  // Session-cached TWO-GENERATION parquet directory for q_source_evolved:
  // generation g=0 was written BEFORE the `source` column existed (even
  // doc_ids, three columns); g=1 carries the evolved four-column schema
  // (odd doc_ids). The fixture is the standard life of any long-lived
  // ingest directory — the schema grew a column mid-stream.
  private val evoCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def evolvedDocsFor(s: SparkSession, d: String): String =
    evoCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-evolved-docs")
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$root/g=0")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "n_chars", "source")
        .write.mode("overwrite").parquet(s"$root/g=1")
      root
    }

  // Session-cached commit-log table for q_commit_log: THREE commits built
  // through the optimistic protocol — create (an orders slice), a
  // read-modify-write (every open order's price + 10.0 — one exact IEEE
  // add), and an append (a second disjoint slice). Built once per
  // (session, sfDir); the declared query reads the committed head.
  private val clogCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def commitLogFor(s: SparkSession, d: String): String =
    clogCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitlog")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 0)
      }
      graft.sources.CommitLog.commit(s, root, "repricer", "adjust") { cur =>
        cur.get.withColumn("o_totalprice",
          when(col("o_orderstatus") === "O", col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      }
      // the third commit takes the O(delta) append path: only the new
      // slice's rows are written; the head references prior dirs + delta
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append")(
        orders.filter(col("o_orderkey") % 100 === 1))
      root
    }

  // Session-cached commit-log table for q_commit_log_compact: a create plus
  // three O(delta) appends leave a FOUR-directory head; compact consolidates
  // it into one coalesced directory (action="compact") and vacuum(keep=1,
  // grace 0) sweeps every pre-compact directory — the OPTIMIZE-then-clean
  // cadence a long-lived append table runs on a schedule. The declared
  // query reads the compacted head, so a compaction that dropped or
  // duplicated one row hash-fails the DuckDB gate.
  private val compactCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def compactLogFor(s: SparkSession, d: String): String =
    compactCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitcompact")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 2)
      }
      Seq(3, 4, 5).foreach { m =>
        graft.sources.CommitLog.commitAppend(s, root, "loader", "append")(
          orders.filter(col("o_orderkey") % 100 === m))
      }
      graft.sources.CommitLog.compact(s, root, "optimizer")
      graft.sources.CommitLog.vacuum(s, root, keep = 1, graceMs = 0L)
      root
    }

  // Session-cached commit-log table for q_commit_log_skip: four commits,
  // each carrying one disjoint `bucket` value (o_orderkey % 4), with
  // per-dir [min, max] bucket stats recorded in the commit JSON — so a
  // bucket-range read can prove which directories it never touched.
  private val skipCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def skipLogFor(s: SparkSession, d: String): String =
    skipCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitskip")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 4).as("bucket"))
      graft.sources.CommitLog.commit(s, root, "loader", "create",
        statsCol = Some("bucket")) { _ => orders.filter(col("bucket") === 0) }
      (1 to 3).foreach { k =>
        graft.sources.CommitLog.commitAppend(s, root, "loader", "append",
          statsCol = Some("bucket"))(orders.filter(col("bucket") === k))
      }
      // bloom sidecars over the PRIMARY key (uniformly scattered across
      // buckets — the shape min/max stats cannot prune) for
      // q_commit_log_bloom's point lookup
      graft.sources.CommitLog.addBloom(s, root, "o_orderkey", fpp = 0.0001)
      root
    }

  // Session-cached commit-log table for q_commit_log_merge: create + append
  // leave two dirs (key classes 6 and 7 mod 100, o_orderkey stats recorded),
  // then ONE merge commit applies updates (class-6 keys divisible by 3:
  // price + 5.0), inserts (class 8 — all-new keys), and deletes (class-7
  // keys divisible by 3) with copy-on-write dir pruning. CommitLogSpec proves the
  // pruning mechanics (untouched dirs byte-identical); this fixture gates
  // the merged END STATE through DuckDB.
  private val mergeCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def mergeLogFor(s: SparkSession, d: String): String =
    mergeCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitmerge")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create",
        statsCol = Some("o_orderkey")) { _ =>
        orders.filter(col("o_orderkey") % 100 === 6)
      }
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append",
        statsCol = Some("o_orderkey"))(
        orders.filter(col("o_orderkey") % 100 === 7))
      val updates = orders
        .filter(col("o_orderkey") % 100 === 6 && col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0)
        .withColumn("_del", lit(false))
      val inserts = orders.filter(col("o_orderkey") % 100 === 8)
        .withColumn("_del", lit(false))
      val deletes = orders
        .filter(col("o_orderkey") % 100 === 7 && col("o_orderkey") % 3 === 0)
        .withColumn("_del", lit(true))
      graft.sources.CommitLog.merge(s, root, "merger", "o_orderkey",
        updates.union(inserts).union(deletes), deleteCol = Some("_del"))
      root
    }

  // Session-cached commit-log table for q_commit_log_cdf: create (class
  // 12), append (class 13), then a merge applying updates (class-12 keys
  // divisible by 3: price + 5.0) and deletes (class-13 keys divisible by 3). The
  // declared result is the CHANGE FEED from version 1: the append's rows
  // synthesized as inserts (zero extra storage) plus the merge's persisted
  // changeset as upserts/deletes, each stamped with its commit version.
  private val cdfCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def cdfLogFor(s: SparkSession, d: String): String =
    cdfCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitcdf")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 12)
      }
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append")(
        orders.filter(col("o_orderkey") % 100 === 13))
      val updates = orders
        .filter(col("o_orderkey") % 100 === 12 && col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0)
        .withColumn("_del", lit(false))
      val deletes = orders
        .filter(col("o_orderkey") % 100 === 13 && col("o_orderkey") % 3 === 0)
        .withColumn("_del", lit(true))
      graft.sources.CommitLog.merge(s, root, "merger", "o_orderkey",
        updates.union(deletes), deleteCol = Some("_del"))
      root
    }

  // Session-cached commit-log table for q_commit_log_txn: three batches
  // appended via commitAppendOnce, with batch 1 deliberately delivered
  // TWICE — the foreachBatch crash-replay shape. The txn watermark in the
  // commit JSON makes the second delivery a no-op, so the declared state
  // holds each batch exactly once; a duplicated batch doubles class 10's
  // counts and hash-fails the oracle.
  private val txnCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def txnLogFor(s: SparkSession, d: String): String =
    txnCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-committxn")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      def slice(m: Int) = orders.filter(col("o_orderkey") % 100 === m)
      def once(b: Long, m: Int) =
        graft.sources.CommitLog.commitAppendOnce(s, root, "app1",
          "stream-append", appId = "app1", batchId = b)(slice(m))
      once(0L, 9); once(1L, 10)
      once(1L, 10) // re-delivery: must be a no-op
      once(2L, 11)
      root
    }

  // Session-cached commit-log table for q_commit_log_evolved: a create
  // (class-14 orders slice, three columns) followed by an EXPLICIT
  // evolve=true append (class 15) that adds a fourth column — the commit
  // records the widened schema in its JSON, so every reader answers the
  // union-with-typed-NULLs from the log instead of a mergeSchema footer
  // sweep. The old directory is never rewritten.
  private val evolveCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def evolveLogFor(s: SparkSession, d: String): String =
    evolveCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitevolve")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 14)
      }
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append",
        evolve = true)(
        orders.filter(col("o_orderkey") % 100 === 15)
          .withColumn("o_clerk_prio", col("o_orderkey") % 7))
      root
    }

  // Session-cached commit-log table for q_commit_log_restore and
  // q_commit_log_history: create (class-16 orders slice) → reprice (+10
  // on open orders) → append (class 17, "the bad load") → RESTORE to v2,
  // rolling the bad load back as a fourth, auditable commit. The declared
  // restore query reads the head (== v2's state); the history query reads
  // the audit surface, proving the rollback never rewrote history.
  private val restoreCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def restoreLogFor(s: SparkSession, d: String): String =
    restoreCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitrestore")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 16)
      }
      graft.sources.CommitLog.commit(s, root, "repricer", "adjust") { cur =>
        cur.get.withColumn("o_totalprice",
          when(col("o_orderstatus") === "O", col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      }
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append")(
        orders.filter(col("o_orderkey") % 100 === 17))
      graft.sources.CommitLog.restore(s, root, "operator", 2L)
      root
    }

  // Session-cached commit-log table for q_commit_log_write: built ENTIRELY
  // through the connector WRITE path (r13) — `df.write.format(
  // "graft.commitlog")`: mode("errorifexists") creates (class 18),
  // mode("append") appends O(delta) (class 19), and a txn append
  // (txnAppId/txnVersion) is delivered TWICE (class 20, the foreachBatch
  // crash-replay shape) — the second delivery must no-op against the txn
  // watermark exactly like the library route. A raw-parquet bypass, a
  // doubled txn batch, or an overwrite-instead-of-append all hash-fail.
  private val writeCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def writeLogFor(s: SparkSession, d: String): String =
    writeCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitwrite")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter(col("o_orderkey") % 100 === 18)
        .write.format("graft.commitlog").mode("errorifexists").save(root)
      orders.filter(col("o_orderkey") % 100 === 19)
        .write.format("graft.commitlog").mode("append").save(root)
      def txnAppend(): Unit = orders.filter(col("o_orderkey") % 100 === 20)
        .write.format("graft.commitlog").mode("append")
        .option("txnAppId", "wapp").option("txnVersion", "1").save(root)
      txnAppend()
      txnAppend() // re-delivery: a no-op against the txn watermark
      root
    }

  // Dataset-derived catalog NAME for the SQL fixtures (ADVICE r14):
  // GraftCatalog.initialize captures its `dir` conf ONCE per name —
  // Spark's CatalogManager caches the catalog instance — so a second
  // dataset in one session re-setting `spark.sql.catalog.<name>.dir`
  // would silently keep resolving tables against the FIRST dataset's
  // root. Embedding the dataset dir's hash in the name gives each
  // (session, dataset) pair its own catalog instance, matching the
  // SessionCache keying of every fixture that registers one. The SQL
  // fixtures' temp VIEWS carry the same suffix (code review r15):
  // session-global view names would let two datasets' concurrent
  // builders interleave view replacement and the statement that reads
  // it, restating one dataset's table with the other's rows. The suffix
  // is an MD5 prefix (ADVICE r15), not String.hashCode: keying catalog
  // identity on a 31-bit hash would let two dataset dirs collide and
  // silently alias their catalogs — exactly the cross-dataset
  // contamination the suffix exists to prevent. 12 hex chars (48 bits)
  // makes a same-session collision practically impossible.
  private def catName(tag: String, d: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    tag + md5.take(6).map(b => f"$b%02x").mkString
  }

  // Session-cached commit-log table for q_commit_log_insert: the CATALOG
  // write route (r13) — a GraftCatalog commitlog table accepts
  // `INSERT INTO` / `writeTo(...).append()` through the V1-write fallback,
  // routing every row through CommitLog.commitAppend (one audited O(delta)
  // commit), never a raw parquet write. Created from a class-21 slice,
  // then class 22 is INSERTed via the DSv2 AppendData path.
  private val insertCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def insertLogFor(s: SparkSession, d: String): String =
    insertCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitinsert")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter(col("o_orderkey") % 100 === 21)
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclq", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_cl " +
        s"USING `graft.commitlog` LOCATION '$table'")
      orders.filter(col("o_orderkey") % 100 === 22)
        .writeTo(s"$cat.orders_cl").append()
      root
    }

  // Session-cached commit-log table for q_commit_log_ts: create (class-23
  // slice) → reprice (+10 on open orders) → append (class 24), each commit
  // stamped with its wall-clock (r13). The fixture captures v2's recorded
  // ts_ms from the history audit; the declared query time-travels with
  // `option("timestampAsOf", ts_v2)` — the at-or-before boundary rule
  // resolves the EXACT timestamp to v2 itself, so the result is the
  // repriced pre-append state. Sleeps a few ms between commits so distinct
  // commits carry distinct wall-clocks (commits are orders of magnitude
  // slower in practice; the sleep pins the fixture's determinism).
  private val tsCache = new graft.SessionCache[(String, Long)](
    p => graft.TempDirs.delete(p._1))
  private def tsLogFor(s: SparkSession, d: String): (String, Long) =
    tsCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-committs")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter(col("o_orderkey") % 100 === 23)
      }
      Thread.sleep(20L)
      graft.sources.CommitLog.commit(s, root, "repricer", "adjust") { cur =>
        cur.get.withColumn("o_totalprice",
          when(col("o_orderstatus") === "O", col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
      }
      Thread.sleep(20L)
      graft.sources.CommitLog.commitAppend(s, root, "loader", "append")(
        orders.filter(col("o_orderkey") % 100 === 24))
      val ts2 = graft.sources.CommitLog.history(s, root)
        .filter(col("version") === 2).select("ts_ms").head().getLong(0)
      (root, ts2)
    }

  // Session-cached commit-log table for q_commit_log_skip2: four connector
  // WRITES each carrying one disjoint `bucket` (o_orderkey % 4) — and a
  // second derived column `wave` (bucket / 2) — with PER-COLUMN [min, max]
  // stats recorded via option("statsCols", "bucket,wave") (r13, the Delta
  // per-column skipping shape). The declared query filters on the SECOND
  // recorded column alone, so dirs 0–1 are pruned on evidence min/max
  // stats for `bucket` cannot provide; CommitLogSpec proves the
  // inputFiles-level pruning through both routes.
  private val skip2Cache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def skip2LogFor(s: SparkSession, d: String): String =
    skip2Cache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitskip2")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 4).as("bucket"),
          ((col("o_orderkey") % 4) / lit(2)).cast("long").as("wave"))
      (0 to 3).foreach { k =>
        orders.filter(col("bucket") === k)
          .write.format("graft.commitlog").mode("append")
          .option("statsCols", "bucket,wave").save(root)
      }
      root
    }

  // Session-cached commit-log table for q_commit_log_replace: the Delta
  // replaceWhere shape (r13) — a create carrying classes 25+26, then ONE
  // partial-overwrite commit restating ONLY class 26 (price +1.0) via
  // `mode("overwrite").option("replaceWhere", ...)`: kept rows are those
  // NOT matching, incoming rows are constraint-checked to all satisfy the
  // predicate (a row outside the claimed region fails the statement).
  private val replaceCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def replaceLogFor(s: SparkSession, d: String): String =
    replaceCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitreplace")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter((col("o_orderkey") % 100).isin(25, 26))
        .write.format("graft.commitlog").save(root)
      orders.filter(col("o_orderkey") % 100 === 26)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .write.format("graft.commitlog").mode("overwrite")
        .option("replaceWhere", "o_orderkey % 100 = 26").save(root)
      root
    }

  // Session-cached commit-log table for q_commit_log_cdf2: create (classes
  // 36+37), then a DELETE (class-37 keys divisible by 3) and an UPDATE (class-36
  // keys divisible by 3: price +7.0) — the r14 pruned-rewrite verbs that
  // persist their typed changesets, so the CHANGE FEED from v1 delivers
  // deletes and pre/post images instead of forcing a resync (the merge
  // CDF contract extended to the row-level SQL verbs).
  private val cdf2Cache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def cdf2LogFor(s: SparkSession, d: String): String =
    cdf2Cache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitcdf2")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      graft.sources.CommitLog.commit(s, root, "loader", "create") { _ =>
        orders.filter((col("o_orderkey") % 100).isin(36, 37))
      }
      graft.sources.CommitLog.delete(s, root, "cleaner",
        col("o_orderkey") % 100 === 37 && col("o_orderkey") % 3 === 0)
      graft.sources.CommitLog.update(s, root, "repricer",
        col("o_orderkey") % 100 === 36 && col("o_orderkey") % 3 === 0,
        Seq("o_totalprice" -> (col("o_totalprice") + 7.0)))
      root
    }

  // Session-cached commit-log table for q_commit_log_update: classes 29+30
  // created through the connector, then ONE SQL `UPDATE … WHERE` statement
  // (r14) reprices class-29 open orders — routed by RowLevelSqlStrategy
  // through CommitLog.update, the same evidence-pruned copy-on-write
  // engine as delete/replaceWhere. Rows where the predicate is false OR
  // NULL keep their stored values (the SQL rule).
  private val updateCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def updateLogFor(s: SparkSession, d: String): String =
    updateCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitupdate")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter((col("o_orderkey") % 100).isin(29, 30))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclu", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_u " +
        s"USING `graft.commitlog` LOCATION '$table'")
      s.sql(s"UPDATE $cat.orders_u SET o_totalprice = o_totalprice + 10.0 " +
        "WHERE o_orderstatus = 'O' AND o_orderkey % 100 = 29")
      root
    }

  // Session-cached commit-log table for q_commit_log_merge_sql: classes
  // 31+32 created, then ONE SQL `MERGE INTO … WHEN MATCHED THEN UPDATE
  // SET * WHEN NOT MATCHED THEN INSERT *` statement (r14) applies a
  // source of repriced class-31 rows (keys divisible by 3, +5.0) and
  // all-new class-33 rows — the classic upsert, compiled by
  // RowLevelSqlStrategy onto CommitLog.merge (keyed copy-on-write with
  // dir pruning and the persisted CDF changeset; claim-JSON
  // shape-identical to the library merge, spec-proved).
  private val mergeSqlCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def mergeSqlLogFor(s: SparkSession, d: String): String =
    mergeSqlCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitmergesql")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter((col("o_orderkey") % 100).isin(31, 32))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclm", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_m " +
        s"USING `graft.commitlog` LOCATION '$table'")
      orders.filter(col("o_orderkey") % 100 === 31 &&
          col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0)
        .union(orders.filter(col("o_orderkey") % 100 === 33))
        .createOrReplaceTempView(s"graft_merge_src_${catName("gclm", d).drop(4)}")
      s.sql(s"MERGE INTO $cat.orders_m t USING graft_merge_src_${catName("gclm", d).drop(4)} s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      root
    }

  // Session-cached commit-log table for q_commit_log_constraint: class 34
  // created, a CHECK constraint added (the Delta ALTER TABLE ADD
  // CONSTRAINT verb, r14 — validates existing rows first), then a
  // VIOLATING class-35 batch (negated prices) is rejected BEFORE any
  // commit and the valid class-35 batch lands; a compact proves the
  // constraint rides the carried metadata. Self-gating: broken
  // enforcement would land the negative-price rows and hash-fail the
  // oracle's class-34+35 rebuild.
  private val constraintCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def constraintLogFor(s: SparkSession, d: String): String =
    constraintCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitconstraint")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter(col("o_orderkey") % 100 === 34)
        .write.format("graft.commitlog").save(root)
      graft.sources.CommitLog.addConstraint(s, root, "dba",
        "price_positive", "o_totalprice > 0.0")
      val bad = orders.filter(col("o_orderkey") % 100 === 35)
        .withColumn("o_totalprice", -abs(col("o_totalprice")))
      try {
        bad.write.format("graft.commitlog").mode("append").save(root)
        throw new IllegalStateException(
          "constraint enforcement silently missed a violating batch")
      } catch { case _: IllegalArgumentException => () }
      orders.filter(col("o_orderkey") % 100 === 35)
        .write.format("graft.commitlog").mode("append").save(root)
      graft.sources.CommitLog.compact(s, root, "optimizer")
      root
    }

  // Session-cached GraftCatalog directory for q_commit_log_travel_sql —
  // the catalog names the commitLogFor table; the fixture under test is
  // the VERSION AS OF statement resolution, not a new history.
  private val travelCatCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def travelCatFor(s: SparkSession, d: String): String =
    travelCatCache.getOrBuild(s, d) { graft.TempDirs.create("graft-travelcat") }

  // Session-cached GraftCatalog directory for q_commit_log_call (names
  // the restoreLogFor table for the CALL statement).
  private val callCatCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def callCatFor(s: SparkSession, d: String): String =
    callCatCache.getOrBuild(s, d) { graft.TempDirs.create("graft-callcat") }

  // Session-cached commit-log table for q_commit_log_delete: two connector
  // writes (classes 27, 28), then ONE CommitLog.delete commit removing the
  // class-28 keys divisible by 3 — the dir-pruned copy-on-write DELETE verb behind
  // SQL `DELETE FROM` (r13). History stays travelable (unlike purge).
  private val deleteCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def deleteLogFor(s: SparkSession, d: String): String =
    deleteCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitdelete")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter(col("o_orderkey") % 100 === 27)
        .write.format("graft.commitlog").save(root)
      orders.filter(col("o_orderkey") % 100 === 28)
        .write.format("graft.commitlog").mode("append").save(root)
      graft.sources.CommitLog.delete(s, root, "cleaner",
        col("o_orderkey") % 100 === 28 && col("o_orderkey") % 3 === 0)
      root
    }

  // Session-cached commit-log table for q_commit_log_dv (r16 — VERDICT
  // r15 #1, merge-on-read deletes): three connector writes (classes 51,
  // 52, 53 — three immutable dirs), then ONE CommitLog.delete of each
  // class's MIN key — scattered point deletes hitting every dir. The
  // matched fraction is tiny, so the verb takes the DELETION-VECTOR
  // path: no data dir is rewritten (asserted loudly — the fixture is
  // the DV-path proof, not just the result), one `_dv` dataset + one
  // log file land, and every read route anti-joins the vector.
  private val dvCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def dvLogFor(s: SparkSession, d: String): String =
    dvCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitdv")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Seq(51, 52, 53).foreach { cls =>
        orders.filter(col("o_orderkey") % 100 === cls)
          .write.format("graft.commitlog").mode("append").save(root)
      }
      val mins = orders.filter((col("o_orderkey") % 100).isin(51, 52, 53))
        .groupBy((col("o_orderkey") % 100).as("cls"))
        .agg(org.apache.spark.sql.functions.min("o_orderkey").as("k"))
        .collect().map(_.getLong(1)).toSeq
      val before = graft.sources.CommitLog.latest(s, root).get
      val c = graft.sources.CommitLog.delete(s, root, "cleaner",
        col("o_orderkey").isin(mins: _*)).get
      require(c.dv.nonEmpty && c.dataDirs == before.dataDirs,
        s"q_commit_log_dv must land as a deletion vector over unchanged " +
          s"dirs, got dv=${c.dv} dirs=${c.dataDirs}")
      root
    }

  // Session-cached catalog table for q_commit_log_evolve_nested (r17 —
  // VERDICT r16 #4, nested additive evolution): class 60 created with a
  // STRUCT column, then `ALTER TABLE … ADD COLUMNS (meta.bonus DOUBLE)`
  // — ONE metadata commit, zero data rewritten (parquet's clipped read
  // fills the nested field with typed NULL in the pre-evolution dir) —
  // then an INSERT storing explicit nested values (including an
  // explicit NULL, which must stay NULL).
  private val evolveNestedCache =
    new graft.SessionCache[String](graft.TempDirs.delete)
  private def evolveNestedLogFor(s: SparkSession, d: String): String =
    evolveNestedCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitevnest")
      val table = s"$root/t"
      graft.sources.CommitLog.commit(s, table, "w", "create") { _ =>
        Tables.orders(s, d).filter(col("o_orderkey") % 100 === 60)
          .select(col("o_orderkey"),
            org.apache.spark.sql.functions.struct(
              col("o_orderstatus").as("st")).as("meta"),
            col("o_totalprice"))
      }
      val cat = catName("gcen", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_nest " +
        s"USING `graft.commitlog` LOCATION '$table'")
      val before = graft.sources.CommitLog.latest(s, table).get
      s.sql(s"ALTER TABLE $cat.orders_nest ADD COLUMNS (meta.bonus DOUBLE)")
      val evolved = graft.sources.CommitLog.latest(s, table).get
      require(evolved.dataDirs == before.dataDirs && evolved.rowInvisible &&
        evolved.schemaDDL.exists(_.contains("bonus")),
        s"q_commit_log_evolve_nested must widen by metadata alone, got " +
          s"${evolved.schemaDDL} dirs=${evolved.dataDirs}")
      s.sql(s"INSERT INTO $cat.orders_nest VALUES " +
        "(900000060, named_struct('st', 'F', 'bonus', 2.5), 111.0), " +
        "(900000061, named_struct('st', 'O', 'bonus', " +
        "CAST(NULL AS DOUBLE)), 222.0)")
      // NESTED existence DEFAULT (r19 — VERDICT r18 #3): every dir
      // staged so far predates the field, so ALL prior rows read
      // tier='std' through the withField rebuild (gated
      // 'defaults-nested'); the post-default insert stores explicit
      // values — incl. an explicit NULL that must stay NULL
      val preDefault = graft.sources.CommitLog.latest(s, table).get
      s.sql(s"ALTER TABLE $cat.orders_nest " +
        "ADD COLUMNS (meta.tier STRING DEFAULT 'std')")
      val defaulted = graft.sources.CommitLog.latest(s, table).get
      require(defaulted.dataDirs == preDefault.dataDirs &&
        defaulted.defaults.exists(d => d._1 == "meta.tier" && d._3 == "'std'"),
        s"q_commit_log_evolve_nested: the nested DEFAULT must land as one " +
          s"metadata commit, got ${defaulted.defaults}")
      s.sql(s"INSERT INTO $cat.orders_nest VALUES " +
        "(900000062, named_struct('st', 'F', 'bonus', 3.5, " +
        "'tier', 'gold'), 333.0), " +
        "(900000063, named_struct('st', 'O', 'bonus', " +
        "CAST(NULL AS DOUBLE), 'tier', CAST(NULL AS STRING)), 444.0)")
      root
    }

  // Session-cached commit-log table for q_commit_log_skip_str (r17 —
  // VERDICT r16 #2, TYPED data-skipping stats): three connector writes,
  // one per o_orderstatus value, with `statsCols` covering a STRING and
  // a TIMESTAMP column — pre-r17 the long-cast stats machinery recorded
  // NOTHING for either type, so `WHERE status = …` scans never pruned a
  // dir. The fixture asserts both columns' per-dir ranges actually
  // recorded; CommitLogSpec proves the inputFiles-level pruning.
  private val skipStrCache =
    new graft.SessionCache[String](graft.TempDirs.delete)
  private def skipStrLogFor(s: SparkSession, d: String): String =
    skipStrCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitskipstr")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      Seq("F", "O", "P").foreach { st =>
        orders.filter(col("o_orderstatus") === st)
          .write.format("graft.commitlog").mode("append")
          .option("statsCols", "o_orderstatus,o_orderdate").save(root)
      }
      val head = graft.sources.CommitLog.latest(s, root).get
      require(head.statsCols.toSet == Set("o_orderstatus", "o_orderdate") &&
        head.dataDirs.forall(dd => head.stats.get(dd).exists(bc =>
          bc.contains("o_orderstatus") && bc.contains("o_orderdate"))),
        s"q_commit_log_skip_str must record string+timestamp stats, got " +
          s"statsCols=${head.statsCols} stats=${head.stats}")
      root
    }

  // Session-cached commit-log table for q_commit_log_merge_dv (r17 —
  // VERDICT r16 #1, merge-on-read MERGE): two connector writes (classes
  // 58, 59 — two immutable dirs), then ONE CommitLog.merge carrying a
  // scattered CDC changeset — each class's MIN key repriced (update),
  // each class's MAX key flag-deleted, two synthetic inserts. The
  // matched fraction is tiny, so the verb takes the DELETION-VECTOR
  // path: every prior dir carries byte-identical (asserted loudly — the
  // fixture is the DV-merge proof, not just the result), the changeset
  // lands as one appended dir + one `_dv` dataset, and every read
  // anti-joins the vector.
  private val mergeDvCache =
    new graft.SessionCache[String](graft.TempDirs.delete)
  private def mergeDvLogFor(s: SparkSession, d: String): String =
    mergeDvCache.getOrBuild(s, d) {
      import s.implicits._
      val root = graft.TempDirs.create("graft-commitmergedv")
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Seq(58, 59).foreach { cls =>
        orders.filter(col("o_orderkey") % 100 === cls)
          .write.format("graft.commitlog").mode("append").save(root)
      }
      val keyRows = orders
        .filter((col("o_orderkey") % 100).isin(58, 59))
        .groupBy((col("o_orderkey") % 100).as("cls"))
        .agg(org.apache.spark.sql.functions.min("o_orderkey").as("kmin"),
          org.apache.spark.sql.functions.max("o_orderkey").as("kmax"))
        .collect()
      val mins = keyRows.map(_.getLong(1)).toSeq
      val maxs = keyRows.map(_.getLong(2)).toSeq
      val changes = orders.filter(col("o_orderkey").isin(mins: _*))
        .withColumn("o_totalprice", lit(999.99))
        .withColumn("del", lit(false))
        .unionByName(orders.filter(col("o_orderkey").isin(maxs: _*))
          .withColumn("del", lit(true)))
        .unionByName(Seq((900000058L, "F", 111.11, false),
          (900000059L, "O", 222.22, false))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "del"))
      val before = graft.sources.CommitLog.latest(s, root).get
      val c = graft.sources.CommitLog.merge(s, root, "cdc", "o_orderkey",
        changes, deleteCol = Some("del"))
      require(c.dv.nonEmpty &&
        before.dataDirs.forall(c.dataDirs.contains) &&
        c.dataDirs.size == before.dataDirs.size + 1,
        s"q_commit_log_merge_dv must land merge-on-read: one appended " +
          s"dir + a vector over carried dirs, got dv=${c.dv} " +
          s"dirs=${c.dataDirs}")
      root
    }

  // Session-cached catalog table for q_commit_log_dv_sql (r16): the
  // STATEMENT face of the DV delete — `DELETE FROM <cat>.orders_dv
  // WHERE o_orderkey IN (min54, min55)` routes SupportsDelete →
  // CommitLog.delete, whose threshold rule picks the vector; the
  // declared read is `spark.table` (the DSv2 V1Scan fallback route), so
  // the oracle gates the catalog read path over a vectored commit.
  private val dvSqlCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def dvSqlLogFor(s: SparkSession, d: String): String =
    dvSqlCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitdvsql")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      Seq(54, 55).foreach { cls =>
        orders.filter(col("o_orderkey") % 100 === cls)
          .write.format("graft.commitlog").mode("append").save(table)
      }
      val cat = catName("gcdv", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_dv " +
        s"USING `graft.commitlog` LOCATION '$table'")
      val mins = orders.filter((col("o_orderkey") % 100).isin(54, 55))
        .groupBy((col("o_orderkey") % 100).as("cls"))
        .agg(org.apache.spark.sql.functions.min("o_orderkey").as("k"))
        .collect().map(_.getLong(1)).toSeq
      s.sql(s"DELETE FROM $cat.orders_dv WHERE o_orderkey IN " +
        mins.mkString("(", ", ", ")"))
      val c = graft.sources.CommitLog.latest(s, table).get
      require(c.dv.nonEmpty,
        s"q_commit_log_dv_sql's DELETE must land as a deletion vector, " +
          s"got dv=${c.dv} action=${c.action}")
      root
    }

  // Session-cached catalog table for q_commit_log_rename (r16 — VERDICT
  // r15 #2, column mapping): class 56 created, `ALTER TABLE … RENAME
  // COLUMN o_totalprice TO price` (ONE metadata commit — the fixture
  // asserts zero data dirs moved and the frozen physical mapping), then
  // class 57 INSERTed through the renamed schema (staged under the
  // frozen physical name). The declared read aggregates `price` through
  // `spark.table` — old dirs project physical→logical, the new dir
  // proves the write path translates.
  private val renameCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def renameLogFor(s: SparkSession, d: String): String =
    renameCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitrename")
      val table = s"$root/table"
      // a struct column rides along (r18 — VERDICT r17 #3, nested
      // mapping): `meta.wt` carries 2× the price, later renamed to
      // `meta.weight` metadata-only
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          org.apache.spark.sql.functions.struct(
            (col("o_totalprice") * 2).as("wt")).as("meta"))
      orders.filter(col("o_orderkey") % 100 === 56)
        .write.format("graft.commitlog").save(table)
      val cat = catName("gcrn", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_rn " +
        s"USING `graft.commitlog` LOCATION '$table'")
      val before = graft.sources.CommitLog.latest(s, table).get
      s.sql(s"ALTER TABLE $cat.orders_rn RENAME COLUMN o_totalprice TO price")
      // NESTED rename (r18): meta.wt -> meta.weight, one metadata commit
      s.sql(s"ALTER TABLE $cat.orders_rn RENAME COLUMN meta.wt TO weight")
      val after = graft.sources.CommitLog.latest(s, table).get
      require(after.dataDirs == before.dataDirs &&
        after.colMap.get("meta.weight").contains("wt"),
        s"q_commit_log_rename must be metadata-only over a frozen " +
          s"path-keyed mapping, got dirs=${after.dataDirs} map=${after.colMap}")
      // time travel to the pre-rename version shows the OLD nested name
      require(graft.sources.CommitLog.readVersion(s, table, before.version)
        .get.schema("meta").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.sameElements(Array("wt")),
        "q_commit_log_rename: time travel must show the old nested name")
      val view = s"graft_rn_src_${catName("gcrn", d).drop(4)}"
      orders.filter(col("o_orderkey") % 100 === 57)
        .withColumnRenamed("o_totalprice", "price")
        .select(col("o_orderkey"), col("o_orderstatus"), col("price"),
          col("meta").cast("struct<weight:double>").as("meta"))
        .createOrReplaceTempView(view)
      s.sql(s"INSERT INTO $cat.orders_rn SELECT * FROM $view")
      root
    }

  // Session-cached catalog table for q_commit_log_widen (r18 — VERDICT
  // r17 #4, safe type widening): class 61 created with an INT `qty`
  // column, `ALTER TABLE … ALTER COLUMN qty TYPE BIGINT` (ONE metadata
  // commit — the fixture asserts zero data dirs moved and the "retype"
  // action), then class 62 INSERTed with values only the wide type can
  // hold (qty + 4e9, beyond int range). Old int32 files read through
  // parquet's lossless read-side promotion under the pinned bigint
  // schema; the declared read aggregates the widened column through
  // spark.table, so a stale pinned type, a broken promotion, or a
  // mistranslated post-retype write all hash-fail against the oracle's
  // relational rebuild.
  private val widenCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def widenLogFor(s: SparkSession, d: String): String =
    widenCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitwiden")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 1000).cast("int").as("qty"),
          struct((col("o_orderkey") % 1000).cast("int").as("q2")).as("m"))
      orders.filter(col("o_orderkey") % 100 === 61)
        .write.format("graft.commitlog").save(table)
      val cat = catName("gcwd", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_wd " +
        s"USING `graft.commitlog` LOCATION '$table'")
      val before = graft.sources.CommitLog.latest(s, table).get
      s.sql(s"ALTER TABLE $cat.orders_wd ALTER COLUMN qty TYPE BIGINT")
      // the NESTED leaf widens through the same whitelist (r19 —
      // VERDICT r18 #3): one metadata commit, the int32 leaf under the
      // pinned bigint schema reads through parquet's per-leaf promotion
      s.sql(s"ALTER TABLE $cat.orders_wd ALTER COLUMN m.q2 TYPE BIGINT")
      val after = graft.sources.CommitLog.latest(s, table).get
      require(after.dataDirs == before.dataDirs && after.action == "retype" &&
        after.schemaDDL.exists(_.contains("q2: BIGINT")),
        s"q_commit_log_widen must retype metadata-only, got " +
          s"dirs=${after.dataDirs} action=${after.action} " +
          s"ddl=${after.schemaDDL}")
      val view = s"graft_wd_src_${catName("gcwd", d).drop(4)}"
      orders.filter(col("o_orderkey") % 100 === 62)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("qty").cast("bigint") + 4000000000L).as("qty"),
          struct((col("m.q2").cast("bigint") + 4000000000L).as("q2")).as("m"))
        .createOrReplaceTempView(view)
      s.sql(s"INSERT INTO $cat.orders_wd SELECT * FROM $view")
      root
    }

  // Session-cached catalog table for q_commit_log_partition (r19 —
  // VERDICT r18 #1, PARTITIONED BY): class 63 orders land in a
  // year-partitioned commitlog table (CREATE … PARTITIONED BY (yr),
  // INSERT INTO splits one staged dir per present year with exact
  // recorded values), then `INSERT OVERWRITE … PARTITION (yr = '1995')`
  // restates ONLY that year (+1000 reprice) — the fixture asserts every
  // other year's dirs carried IDENTICALLY (the partition-addressed
  // restatement Delta users reach for) and that the recorded spec
  // survives. The declared read aggregates per year through spark.table
  // (the dir-pruned catalog route); the oracle rebuilds the final state
  // relationally, so an overwrite that leaked into another partition,
  // dropped the restated rows, or lost partition identity hash-fails.
  private val partitionCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def partitionLogFor(s: SparkSession, d: String): String =
    partitionCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitpart")
      val cat = catName("gcpt", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_pt (" +
        "yr STRING, o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "USING `graft.commitlog` PARTITIONED BY (yr)")
      val view = s"graft_pt_src_${catName("gcpt", d).drop(4)}"
      Tables.orders(s, d).filter(col("o_orderkey") % 100 === 63)
        .select(year(col("o_orderdate")).cast("string").as("yr"),
          col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      s.sql(s"INSERT INTO $cat.orders_pt SELECT * FROM $view")
      val table = s"$root/cat/orders_pt"
      val before = graft.sources.CommitLog.latest(s, table).get
      require(before.partitionBy == Seq("yr") &&
        before.partVals.nonEmpty,
        s"q_commit_log_partition: spec must be recorded, got " +
          s"${before.partitionBy} / ${before.partVals.size} dirs")
      s.sql(s"INSERT OVERWRITE $cat.orders_pt PARTITION (yr = '1995') " +
        s"SELECT o_orderkey, o_totalprice + 1000 FROM $view " +
        "WHERE yr = '1995'")
      val after = graft.sources.CommitLog.latest(s, table).get
      val untouched = before.partVals.collect {
        case (dir, vs) if vs != Seq("1995") => dir }.toSet
      require(untouched.subsetOf(after.dataDirs.toSet),
        "q_commit_log_partition: a one-year restatement must carry " +
          s"every other year's dirs — lost ${
            untouched -- after.dataDirs.toSet}")
      root
    }

  // Session-cached catalog table for q_commit_log_generated (r19 —
  // VERDICT r18 #2, GENERATED ALWAYS AS): the table declares
  // `bucket BIGINT GENERATED ALWAYS AS (o_orderkey % 8)` at CREATE;
  // class 65 INSERTs through SQL supplying the (correct) generated
  // values — validated against the expression before staging — and
  // class 66 appends through the LIBRARY face OMITTING the column,
  // which materializes it from the recorded expression. The fixture
  // asserts a CONFLICTING explicit value refuses with no commit. The
  // declared read aggregates per bucket through spark.table; the oracle
  // recomputes the expression relationally, so a wrong materialization,
  // a leaked violating batch, or a lost validation hash-fails.
  private val generatedCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def generatedLogFor(s: SparkSession, d: String): String =
    generatedCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitgen")
      val cat = catName("gcgn", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_gn (" +
        "o_orderkey BIGINT, o_totalprice DOUBLE, " +
        "bucket BIGINT GENERATED ALWAYS AS (o_orderkey % 8)) " +
        "USING `graft.commitlog`")
      val table = s"$root/cat/orders_gn"
      require(graft.sources.CommitLog.latest(s, table).get.gens ==
        Seq("bucket" -> "o_orderkey % 8"),
        "q_commit_log_generated: the expression must be recorded")
      val view = s"graft_gn_src_${catName("gcgn", d).drop(4)}"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      s.sql(s"INSERT INTO $cat.orders_gn SELECT o_orderkey, " +
        s"o_totalprice, o_orderkey % 8 FROM $view " +
        "WHERE o_orderkey % 100 = 65")
      // the library append face omits the column → materialized
      graft.sources.CommitLog.commitAppend(s, table, "fixture", "append")(
        s.table(view).filter(col("o_orderkey") % 100 === 66))
      // a conflicting explicit value refuses, nothing commits
      val v = graft.sources.CommitLog.latest(s, table).get.version
      val refused =
        try {
          s.sql(s"INSERT INTO $cat.orders_gn VALUES (8, 1.0, 7)")
          false
        } catch { case _: Exception => true }
      require(refused &&
        graft.sources.CommitLog.latest(s, table).get.version == v,
        "q_commit_log_generated: a violating INSERT must refuse " +
          "with no commit")
      root
    }

  // Session-cached commit-log table for q_commit_log_merge_nmbs (r15 —
  // VERDICT r14 #1): classes 38+39 created, then ONE SQL MERGE whose
  // WHEN NOT MATCHED BY SOURCE clauses run the retention/sync pattern —
  // matched class-38 keys (÷3) reprice (+5), unmatched class-39 keys ÷3
  // are NMBS-DELETEd, and the remaining unmatched OPEN rows take a
  // first-match-wins NMBS UPDATE (+1). The NMBS changeset piece is the
  // head anti-joined against source keys (head-scan-bounded).
  private val nmbsCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def nmbsLogFor(s: SparkSession, d: String): String =
    nmbsCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitnmbs")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter((col("o_orderkey") % 100).isin(38, 39))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclb", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_b " +
        s"USING `graft.commitlog` LOCATION '$table'")
      orders.filter(col("o_orderkey") % 100 === 38 &&
          col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0)
        .createOrReplaceTempView(s"graft_nmbs_src_${catName("gclb", d).drop(4)}")
      s.sql(s"MERGE INTO $cat.orders_b t USING graft_nmbs_src_${catName("gclb", d).drop(4)} s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 100 = 39 " +
        "AND t.o_orderkey % 3 = 0 THEN DELETE " +
        "WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'O' " +
        "THEN UPDATE SET o_totalprice = t.o_totalprice + 1.0")
      root
    }

  // Session-cached commit-log table for q_commit_log_merge_multi (r15 —
  // VERDICT r14 #2): a per-(status, bucket) aggregate table — a genuine
  // COMPOSITE key — merged through SQL with a two-equality ON: matched
  // buckets < 2 reprice (+100), bucket-4 tuples re-land under bucket+10
  // as inserts. CommitLog.mergeOn keys the changeset by the tuple and
  // composes per-column pruning evidence.
  private val multiKeyCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def multiKeyLogFor(s: SparkSession, d: String): String =
    multiKeyCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitmulti")
      val table = s"$root/table"
      val base = Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 40)
        // % 7, NOT % 5: keys ≡ 40 (mod 100) are all ≡ 0 (mod 5), which
        // would collapse the bucket to a constant and the composite key
        // to status alone (code review r15 — the r14-close parity trap)
        .groupBy(col("o_orderstatus"), (col("o_orderkey") % 7).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
      base.write.format("graft.commitlog").save(table)
      val cat = catName("gclk", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_k " +
        s"USING `graft.commitlog` LOCATION '$table'")
      base.filter(col("bucket") < 2)
        .withColumn("total", col("total") + 100.0)
        .union(base.filter(col("bucket") === 4)
          .withColumn("bucket", col("bucket") + 10))
        .createOrReplaceTempView(s"graft_multi_src_${catName("gclk", d).drop(4)}")
      s.sql(s"MERGE INTO $cat.orders_k t USING graft_multi_src_${catName("gclk", d).drop(4)} s " +
        "ON t.o_orderstatus = s.o_orderstatus AND t.bucket = s.bucket " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      root
    }

  // Session-cached commit-log table for q_commit_log_update_nested (r15 —
  // VERDICT r14 #4): class 41 stored with a STRUCT column, then ONE SQL
  // `UPDATE t SET info.price = … WHERE …` — the struct-field assignment
  // compiles to a whole-column withField replacement, sibling fields
  // carried from the stored row (the oracle's flattened rebuild
  // hash-fails if `status` was clobbered or non-matching rows touched).
  private val nestedCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def nestedLogFor(s: SparkSession, d: String): String =
    nestedCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitnested")
      val table = s"$root/table"
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 41)
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")).as("info"))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclw", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_w " +
        s"USING `graft.commitlog` LOCATION '$table'")
      s.sql(s"UPDATE $cat.orders_w SET info.price = info.price + 10.0 " +
        "WHERE info.status = 'O' AND o_orderkey % 3 = 0")
      root
    }

  // Session-cached commit-log table for q_commit_log_merge_evolve (r15;
  // single-commit since r16 — VERDICT r15 #4): class 42 created WITHOUT
  // `note`, then ONE `MERGE WITH SCHEMA EVOLUTION` whose source carries
  // the extra column — the analyzer's widening is STAGED
  // (GraftCatalog.pendingEvolve, no commit) and the merge execution
  // FOLDS it into its one row-visible commit, recording the widened
  // schema there: untouched class-42 rows read `note` as typed NULL,
  // repriced (÷3) rows tag 'upd', class-43 inserts tag 'new'; an
  // EXPLAINed statement leaves no commit at all (spec).
  private val evolveMergeCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def evolveMergeLogFor(s: SparkSession, d: String): String =
    evolveMergeCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitmevolve")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter(col("o_orderkey") % 100 === 42)
        .write.format("graft.commitlog").save(table)
      val cat = catName("gcle", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_e " +
        s"USING `graft.commitlog` LOCATION '$table'")
      orders.filter(col("o_orderkey") % 100 === 42 &&
          col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 5.0)
        .withColumn("note", lit("upd"))
        .union(orders.filter(col("o_orderkey") % 100 === 43)
          .withColumn("note", lit("new")))
        .createOrReplaceTempView(s"graft_evolve_src_${catName("gcle", d).drop(4)}")
      s.sql(s"MERGE WITH SCHEMA EVOLUTION INTO $cat.orders_e t " +
        s"USING graft_evolve_src_${catName("gcle", d).drop(4)} s ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      root
    }

  // Session-cached commit-log table for q_commit_log_replace_sql (r15):
  // classes 45+46 created with an explicit `cls` column, then ONE SQL
  // `INSERT INTO … REPLACE WHERE cls = 46 SELECT …` statement restates
  // the class-46 region (+1.0) — Spark's OverwriteByExpression routed
  // through SupportsOverwrite onto CommitLog.replaceWhere, the same
  // dir-pruned restatement verb as the writer option (one verb, three
  // faces). Incoming rows outside the claimed region fail the verb.
  private val replaceSqlCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def replaceSqlLogFor(s: SparkSession, d: String): String =
    replaceSqlCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitreplsql")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 100).as("cls"))
      orders.filter(col("cls").isin(45, 46))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gclp", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_p " +
        s"USING `graft.commitlog` LOCATION '$table'")
      orders.filter(col("cls") === 46)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .createOrReplaceTempView(s"graft_replace_src_${catName("gclp", d).drop(4)}")
      s.sql(s"INSERT INTO $cat.orders_p REPLACE WHERE cls = 46 " +
        s"SELECT * FROM graft_replace_src_${catName("gclp", d).drop(4)}")
      root
    }

  // Session-cached commit-log table for q_commit_log_delete_sql (r15):
  // classes 47+48 created, then ONE SQL `DELETE FROM … WHERE` with an
  // ARITHMETIC predicate — a shape the SupportsDelete face cannot
  // translate to source Filters, so it exercises the strategy route
  // (RowLevelSqlStrategy → CommitLog.delete, the same evidence-pruned
  // rewrite engine; NULL/false predicate rows keep, the SQL rule).
  private val deleteSqlCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def deleteSqlLogFor(s: SparkSession, d: String): String =
    deleteSqlCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitdelsql")
      val table = s"$root/table"
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      orders.filter((col("o_orderkey") % 100).isin(47, 48))
        .write.format("graft.commitlog").save(table)
      val cat = catName("gcld", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", s"$root/cat")
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_d " +
        s"USING `graft.commitlog` LOCATION '$table'")
      s.sql(s"DELETE FROM $cat.orders_d " +
        "WHERE o_orderkey % 100 = 48 AND o_orderkey % 3 = 0")
      root
    }

  // Session-cached catalog for q_commit_log_ctas (r15 — VERDICT r14 #3):
  // `CREATE TABLE … USING graft.commitlog AS SELECT …` — the non-staging
  // V2 CTAS path (createTable, then the V1-write append through the
  // commit protocol; Spark drops the name on a failed write). The
  // managed table lives under the catalog root; its history starts with
  // ONE auditable "create" commit (spec-asserted), never a raw write.
  private val ctasCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def ctasCatFor(s: SparkSession, d: String): String =
    ctasCache.getOrBuild(s, d) {
      val root = graft.TempDirs.create("graft-commitctas")
      val cat = catName("gclx", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", root)
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 44)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView(s"graft_ctas_src_${catName("gclx", d).drop(4)}")
      s.sql(s"CREATE TABLE $cat.orders_x USING `graft.commitlog` " +
        s"AS SELECT * FROM graft_ctas_src_${catName("gclx", d).drop(4)}")
      root
    }

  val queries: Map[String, Q] = Map(
    // DELETE verb end state (r13 — CommitLog.delete, the engine behind
    // SQL `DELETE FROM` on catalog tables): one audited dir-pruned
    // copy-on-write commit removes exactly the rows where the predicate
    // is TRUE; the oracle rebuilds the surviving set relationally, so an
    // over-delete (the NULL-semantics bug class), a surviving matched
    // row, or a lost unmatched row all hash-fail. History stays
    // travelable — purge is the verb that drops it.
    "q_commit_log_delete" -> ((s, d) => {
      val root = deleteLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // DELETION-VECTOR delete (r16 — VERDICT r15 #1, merge-on-read): one
    // scattered point delete (each dir's MIN key) lands as a `_dv`
    // vector + one log file with ZERO data dirs rewritten (the fixture
    // asserts the commit shape loudly), and the connector read
    // anti-joins the vector — the oracle rebuilds the survivors
    // relationally, so a resurrected deleted row, a lost survivor, or a
    // vector applied to the wrong dir all hash-fail. At 100 TB this is
    // what makes k scattered point deletes O(changeset) bytes instead
    // of ~k copy-on-write dir rewrites; compact materializes vectors
    // away on the OPTIMIZE cadence.
    "q_commit_log_dv" -> ((s, d) => {
      val root = dvLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // NESTED ADDITIVE EVOLUTION (r17 — VERDICT r16 #4): `ADD COLUMNS
    // (meta.bonus DOUBLE)` widens INSIDE the struct column as one
    // metadata commit; the pre-evolution dir reads the nested field as
    // typed NULL through the catalog route while post-evolution inserts
    // store explicit values (incl. an explicit NULL that must stay
    // NULL). The oracle rebuilds the final state relationally, so a
    // clipped nested read, a lost insert value, or a default leaking
    // where none exists all hash-fail.
    "q_commit_log_evolve_nested" -> ((s, d) => {
      val root = evolveNestedLogFor(s, d)
      s.table(s"${catName("gcen", d)}.orders_nest")
        .groupBy(col("meta.st").as("st"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"),
          count(col("meta.bonus")).as("n_bonus"),
          count(col("meta.tier")).as("n_tier"),
          count(when(col("meta.tier") === "std", 1)).as("n_std"))
        .reportSort("st")
    }),

    // TYPED DATA SKIPPING (r17 — VERDICT r16 #2): a status-split table
    // with STRING (7-byte order-preserving prefix encoding) and
    // TIMESTAMP (epoch-second) per-dir min/max recorded — the declared
    // read pushes `o_orderstatus = 'O'` through the connector, whose
    // FileIndex prunes to the one matching dir (inputFiles-asserted in
    // CommitLogSpec); pre-r17 a string/date predicate never pruned
    // anything. The oracle rebuilds the yearly rollup relationally, so
    // a wrongly-pruned dir (lost rows) or an unsound encoding
    // (equality matching the wrong dir) hash-fails.
    "q_commit_log_skip_str" -> ((s, d) => {
      val root = skipStrLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .filter(col("o_orderstatus") === "O")
        .groupBy(org.apache.spark.sql.functions.year(col("o_orderdate"))
          .as("yr"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("yr")
    }),

    // MERGE-ON-READ MERGE (r17 — VERDICT r16 #1): a scattered CDC
    // changeset (per-class min repriced, max deleted, two inserts) lands
    // as ONE appended dir + ONE deletion vector with every prior dir
    // carried byte-identical (the fixture asserts the commit shape
    // loudly) — O(changeset) bytes where copy-on-write paid ~k dir
    // rewrites, the production upsert-cadence shape at 100 TB. The
    // declared read anti-joins the vector through the connector; the
    // oracle rebuilds the post-merge state relationally, so a
    // resurrected pre-image, a lost update, or a dropped insert all
    // hash-fail.
    "q_commit_log_merge_dv" -> ((s, d) => {
      val root = mergeDvLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // COLUMN MAPPING (r16 — VERDICT r15 #2): `RENAME COLUMN` as ONE
    // metadata commit over frozen physical names (the fixture asserts
    // zero data dirs moved), with a post-rename INSERT staged under the
    // frozen physical — the declared read aggregates the renamed
    // `price` through spark.table, so a lost mapping (physical names
    // leaking), a stale projection, or a mistranslated write all
    // hash-fail against the oracle's relational rebuild.
    "q_commit_log_rename" -> ((s, d) => {
      val root = renameLogFor(s, d)
      s.table(s"${catName("gcrn", d)}.orders_rn")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("price").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"),
          round(sum(col("meta.weight").cast("decimal(18,2)")).cast("double"), 2)
            .as("wtotal"))
        .reportSort("o_orderstatus")
    }),

    // SAFE TYPE WIDENING (r18 — VERDICT r17 #4; nested r19 — VERDICT
    // r18 #3): `ALTER COLUMN qty TYPE BIGINT` AND the nested leaf
    // `ALTER COLUMN m.q2 TYPE BIGINT`, each ONE metadata commit (the
    // fixture asserts zero dirs moved); old int32 dirs — top-level and
    // nested leaf alike — read through parquet's lossless read-side
    // promotion under the pinned bigint schema, and the post-retype
    // append holds values beyond int range — the declared read sums
    // both widened columns across the mixed dirs through spark.table.
    "q_commit_log_widen" -> ((s, d) => {
      widenLogFor(s, d)
      s.table(s"${catName("gcwd", d)}.orders_wd")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sq"),
          sum(col("m.q2")).as("sq2"))
        .reportSort("o_orderstatus")
    }),

    // PARTITION COLUMNS (r19 — VERDICT r18 #1): a year-partitioned
    // table built through CREATE … PARTITIONED BY + INSERT INTO (split
    // staging, exact per-dir values), restated for ONE year via the
    // static `INSERT OVERWRITE … PARTITION` face — the fixture asserts
    // every other year's dirs carried identically. The declared read is
    // spark.table (the catalog route plans through the shared evidence
    // pruning, so a partition filter reads only matching dirs —
    // PartitionSpec asserts the planned file set).
    "q_commit_log_partition" -> ((s, d) => {
      val root = partitionLogFor(s, d)
      s.table(s"${catName("gcpt", d)}.orders_pt")
        .groupBy("yr")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("yr")
    }),

    // GENERATED COLUMNS (r19 — VERDICT r18 #2): `bucket BIGINT GENERATED
    // ALWAYS AS (o_orderkey % 8)` declared at CREATE; SQL INSERT supplies
    // validated values, the library append omits the column and gets it
    // materialized, and a conflicting batch refuses with no commit (the
    // fixture asserts all three). The declared read groups by the
    // generated column through spark.table.
    "q_commit_log_generated" -> ((s, d) => {
      val root = generatedLogFor(s, d)
      s.table(s"${catName("gcgn", d)}.orders_gn")
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("bucket")
    }),

    // The STATEMENT face of the DV delete (r16): `DELETE FROM <cat>.t
    // WHERE key IN (…)` routes SupportsDelete → CommitLog.delete →
    // the vector path, and the declared read is `spark.table` — the
    // DSv2 route (V1Scan fallback over the DV-aware plan) — so the
    // catalog read path over a vectored commit is oracle-gated too.
    "q_commit_log_dv_sql" -> ((s, d) => {
      dvSqlLogFor(s, d)
      s.table(s"${catName("gcdv", d)}.orders_dv")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // PARTIAL OVERWRITE — replaceWhere (r13, the Delta restatement verb):
    // the declared result reads the head after one serializable commit
    // replaced exactly the class-26 region with its repriced restatement,
    // leaving class 25 untouched. The oracle rebuilds both slices
    // relationally — a leaked old row, a lost kept row, or a restatement
    // that escaped its region all hash-fail. At 100 TB this is the
    // idempotent "restate this day" pattern: one rewrite commit, bounded
    // by the snapshot (production narrows to affected partitions).
    "q_commit_log_replace" -> ((s, d) => {
      val root = replaceLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // Connector WRITE path end state (r13 — sources/CommitLogSource
    // .createRelation(mode)): the fixture's create + append + twice-
    // delivered txn append all route through the commit protocol from
    // `df.write`, and the declared result aggregates the committed head
    // via the connector read. The oracle holds each class exactly once —
    // a duplicated txn batch, a lost append, or a mode that rewrote
    // instead of appending all hash-fail. At 100 TB: the write path IS
    // commitAppend — O(delta) rows + one log file per batch.
    "q_commit_log_write" -> ((s, d) => {
      val root = writeLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // Catalog INSERT route (r13 — CommitLogCatalogTable.newWriteBuilder):
    // `INSERT INTO` / writeTo(...).append() on a GraftCatalog commitlog
    // table is a V1-write-fallback commitAppend — one audited O(delta)
    // commit through the same optimistic claim as the library route. The
    // declared result reads the table back through the catalog; the
    // oracle holds the created class plus the inserted class.
    "q_commit_log_insert" -> ((s, d) => {
      insertLogFor(s, d)
      s.table(s"${catName("gclq", d)}.orders_cl")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // TIMESTAMP AS OF (r13 — CommitLog.commitAtTimestamp + the connector's
    // timestampAsOf option): time travel by wall-clock with Delta's rule —
    // the newest commit whose monotonized timestamp is at-or-before the
    // target. The fixture probes the BOUNDARY: the target IS v2's recorded
    // ts_ms, which must resolve to v2 itself (at-or-before, not strictly-
    // before), so the result is the repriced state WITHOUT the later
    // append. CommitLogSpec pins ordering/boundary/missing-field loudness.
    "q_commit_log_ts" -> ((s, d) => {
      val (root, ts2) = tsLogFor(s, d)
      s.read.format("graft.commitlog")
        .option("timestampAsOf", ts2.toString).load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // PER-COLUMN data skipping (r13 — the Delta multi-column min/max
    // story): each commit records [min, max] for a column SET
    // (statsCols), and the connector's FileIndex narrows one range PER
    // recorded column from the pushed conjuncts. The declared predicate
    // filters on the SECOND column alone — pruning evidence the
    // single-column q_commit_log_skip shape cannot provide —
    // and the oracle rebuilds the slice relationally, so a wrongly
    // pruned dir hash-fails. At 100 TB real probes filter on
    // (event_time, tenant, key) at once; this is that shape.
    "q_commit_log_skip2" -> ((s, d) => {
      val root = skip2LogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .filter(col("wave") === 1)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // RESTORE through the commit log (CommitLog.restore — the Delta
    // RESTORE verb, r12): the head is rolled back to version 2's content
    // as a NEW row-visible commit, so the bad append stays auditable and
    // time-travelable while every reader sees the pre-load state. The
    // oracle rebuilds v2's state relationally — a surviving bad-load row,
    // a lost repriced row, or a restore that silently rewrote history all
    // hash-fail. At 100 TB: one snapshot rewrite, the same copy-on-write
    // price as purge, with stats re-recorded so skipping survives.
    "q_commit_log_restore" -> ((s, d) => {
      val root = restoreLogFor(s, d)
      graft.sources.CommitLog.readLatest(s, root).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // CALL procedure output as a DECLARED, oracle-gated query (r14 —
    // VERDICT r13 #7): `CALL gclh.history(table => 'orders_h')` runs the
    // stored procedure through Spark's CALL statement and the result —
    // the same deterministic create→adjust→append→restore chain as
    // q_commit_log_history — hash-matches the literal-VALUES oracle, so
    // the ProcedureCatalog surface itself is now correctness-gated, not
    // just spec-covered.
    "q_commit_log_call" -> ((s, d) => {
      val root = restoreLogFor(s, d)
      val cat = catName("gclh", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", callCatFor(s, d))
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_h " +
        s"USING `graft.commitlog` LOCATION '$root'")
      s.sql(s"CALL $cat.history(`table` => 'orders_h')")
        .select(col("version"), col("writer"), col("action"),
          col("n_dirs"), col("row_invisible"))
        .reportSort("version")
    }),

    // COMMIT HISTORY audit surface (CommitLog.history, r12 as a declared
    // query): who changed the table, in which version order, by which
    // verb, how many dirs each head carried, and whether consumers skip
    // it — read from the log alone (O(versions) tiny JSON files, never a
    // data dir). The fixture's four-commit history (create → adjust →
    // append → restore) is fully deterministic, so the oracle pins it as
    // literal VALUES — proving the restore APPENDED to history instead of
    // rewriting it, and that the O(delta) append really carried two dirs.
    "q_commit_log_history" -> ((s, d) => {
      val root = restoreLogFor(s, d)
      graft.sources.CommitLog.history(s, root)
        .select(col("version"), col("writer"), col("action"),
          col("n_dirs"), col("row_invisible"))
        .reportSort("version")
    }),

    // CONNECTOR route over the commit log (sources/CommitLogSource.scala —
    // VERDICT r11 #1): the same committed head as q_commit_log, read
    // through `spark.read.format("graft.commitlog")` instead of the
    // library call. The plan is Spark's own vectorized parquet scan over a
    // FileIndex listing exactly the head commit's immutable directories
    // (the published Delta DataSource pattern), with pushed filters pruning
    // whole dirs through the SAME statsKeepDirs/bloomKeepDirs planning the
    // library route uses (CommitLogSpec proves route-equality and
    // file-level pruning). Oracle = q_commit_log's relational rebuild: the
    // connector must see the identical serialized history.
    "q_commit_log_sql" -> ((s, d) => {
      val root = commitLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // ADDITIVE SCHEMA EVOLUTION on the commit log (CommitLog.commitAppend
    // evolve=true — VERDICT r11 #2): the evolve append records the widened
    // schema in its commit JSON, and the snapshot read pins it, so the
    // pre-evolution directory's rows carry typed NULLs in the new column
    // WITHOUT any rewrite and WITHOUT a mergeSchema footer sweep (the log
    // already knows the union — at 100 TB that is one JSON field instead
    // of a footer read per historical file at every planning). Read
    // through the connector route; the oracle rebuilds the same union with
    // an explicit NULL branch, so a dropped old row, a mis-typed NULL, or
    // a clipped new column all hash-fail. CommitLogSpec proves incremental
    // consumers ride through the evolution without resync.
    "q_commit_log_evolved" -> ((s, d) => {
      val root = evolveLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
            .as("o_totalprice"),
          col("o_clerk_prio"))
        .orderBy("o_orderkey")
    }),

    // Multi-writer table head through the OPTIMISTIC COMMIT LOG
    // (sources/CommitLog.scala — the lakehouse-style create-exclusive
    // claim protocol that replaces AtomicSwap's single-maintainer rename
    // for cross-session writers): three committed versions (create,
    // read-modify-write reprice, append) built once per session, then the
    // declared result aggregates the committed HEAD snapshot. The oracle
    // rebuilds the same final state relationally from orders — proving
    // the serialized commit history applied each mutation exactly once.
    // CommitLogSpec covers the concurrency surface (8-writer
    // serializability, torn-tail repair, snapshot-consistent reads,
    // vacuum); this query gates the end state through DuckDB.
    "q_commit_log" -> ((s, d) => {
      val root = commitLogFor(s, d)
      graft.sources.CommitLog.readLatest(s, root).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // TIME TRAVEL over the same commit log: the declared result reads
    // version 2 — after the read-modify-write reprice, BEFORE the append
    // — through CommitLog.readVersion (retained history is immutable
    // snapshot dirs, so the read is an ordinary parquet scan of the old
    // version's dir list). The oracle rebuilds v2's state relationally:
    // the repriced first slice only. This is the "what did the table hold
    // before the last commit" audit read; at 100 TB it costs the old
    // snapshot's scan, not a log replay.
    "q_commit_log_travel" -> ((s, d) => {
      val root = commitLogFor(s, d)
      graft.sources.CommitLog.readVersion(s, root, 2L).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // TABLE CONSTRAINTS end state (r14 — VERDICT r13 #3): a CHECK
    // constraint recorded in the commit JSON gates every write verb
    // before staging — the fixture's violating batch is rejected with no
    // commit, the valid batch lands, and the constraint survives the
    // compact; the oracle rebuilds classes 34+35, so enforcement that
    // leaked the negative-price batch (or dropped the valid one)
    // hash-fails. CommitLogSpec proves every-route rejection and
    // append/compact/restore survival.
    "q_commit_log_constraint" -> ((s, d) => {
      val root = constraintLogFor(s, d)
      s.read.format("graft.commitlog").load(root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // SQL UPDATE end state (r14 — VERDICT r13 #1, the single most common
    // lakehouse verb): `UPDATE gclu.orders_u SET … WHERE …` routes
    // through CommitLog.update — ONE audited evidence-pruned
    // copy-on-write commit applying the assignment where the predicate
    // is TRUE. The oracle rebuilds both classes relationally with the
    // CASE applied, so an over-update (NULL/false rows touched), a
    // missed matching row, or a lost carried class all hash-fail.
    "q_commit_log_update" -> ((s, d) => {
      updateLogFor(s, d)
      s.table(s"${catName("gclu", d)}.orders_u")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // SQL MERGE INTO end state (r14 — VERDICT r13 #1): the classic
    // upsert statement compiled onto CommitLog.merge — updates replace
    // matched keys' rows, inserts land new keys, carried dirs stay
    // byte-identical (spec), and the statement's commit JSON is
    // shape-identical to the library merge's (spec). The oracle rebuilds
    // the merged end state relationally, the q_commit_log_merge pattern.
    "q_commit_log_merge_sql" -> ((s, d) => {
      mergeSqlLogFor(s, d)
      s.table(s"${catName("gclm", d)}.orders_m")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // MERGE … WHEN NOT MATCHED BY SOURCE (r15 — VERDICT r14 #1): the
    // retention/sync statement — matched keys reprice, unmatched stored
    // keys are conditionally deleted or updated FIRST-MATCH-WINS. The
    // oracle rebuilds the end state relationally: an over-delete, a
    // second-clause update applied to first-clause rows, or a touched
    // matched row all hash-fail. At 100 TB the NMBS piece costs one
    // head-scan-bounded anti-join against the (broadcastable) source.
    "q_commit_log_merge_nmbs" -> ((s, d) => {
      val root = nmbsLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // COMPOSITE-key MERGE (r15 — VERDICT r14 #2): the changeset is keyed
    // by the (status, bucket) TUPLE — a single-column key would clobber
    // sibling buckets, which the oracle's tuple-exact rebuild hash-fails.
    "q_commit_log_merge_multi" -> ((s, d) => {
      val root = multiKeyLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .select(col("o_orderstatus"), col("bucket"), col("cnt"), col("total"))
        .reportSort("o_orderstatus", "bucket")
    }),

    // NESTED-field SQL UPDATE (r15 — VERDICT r14 #4): `SET info.price =
    // …` mutates ONE struct field; the flattened oracle proves sibling
    // `status` carried and non-matching rows untouched.
    "q_commit_log_update_nested" -> ((s, d) => {
      val root = nestedLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .select(col("o_orderkey"),
          col("info.status").as("status"),
          col("info.price").as("price"))
        .orderBy("o_orderkey")
    }),

    // MERGE WITH SCHEMA EVOLUTION (r15 — VERDICT r14 #5): one statement,
    // ONE audited commit since r16 (the Delta single-transaction shape):
    // the merge folds the staged widening — old dirs read `note` as
    // typed NULL through the recorded DDL. The oracle pins all three
    // row classes: carried NULL-note, repriced 'upd', inserted 'new'.
    "q_commit_log_merge_evolve" -> ((s, d) => {
      val root = evolveMergeLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "note")
        .orderBy("o_orderkey")
    }),

    // SQL DELETE through the STRATEGY route (r15): an arithmetic
    // predicate has no source-Filter translation, so this statement
    // would have died at the canDeleteWhere gate — the planner strategy
    // compiles the full condition onto CommitLog.delete. The oracle
    // rebuilds the surviving set relationally: an over-delete (NULL
    // semantics), a surviving matched row, or a lost unmatched row all
    // hash-fail.
    "q_commit_log_delete_sql" -> ((s, d) => {
      val root = deleteSqlLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // SQL REPLACE WHERE (r15): `INSERT INTO … REPLACE WHERE cond
    // SELECT …` is the statement face of the r13 partial-overwrite verb
    // — the oracle rebuilds both slices relationally, so a leaked old
    // row, a lost kept row, or a restatement escaping its region all
    // hash-fail; an untranslatable predicate refuses at planning.
    "q_commit_log_replace_sql" -> ((s, d) => {
      val root = replaceSqlLogFor(s, d)
      s.read.format("graft.commitlog").load(s"$root/table")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // CTAS on a commit-log table (r15 — VERDICT r14 #3): CREATE TABLE …
    // AS SELECT routes createTable + the V1-write append through the
    // commit protocol (history starts with one "create" commit —
    // spec-asserted); the declared read aggregates the managed table.
    "q_commit_log_ctas" -> ((s, d) => {
      ctasCatFor(s, d)
      s.table(s"${catName("gclx", d)}.orders_x")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // SQL TIME TRAVEL by table NAME (r14 — VERDICT r13 #2): the same v2
    // read as q_commit_log_travel, but through the STATEMENT —
    // `SELECT … FROM gclt.orders_v VERSION AS OF 2` resolves through
    // GraftCatalog.loadTable(ident, version) to a table pinned at v2's
    // immutable directory list. The oracle is the identical relational
    // rebuild, so the statement route and the library route are gated
    // against the same truth; CommitLogSpec proves row-equality with the
    // options route, TIMESTAMP AS OF, and the vacuumed-version loudness.
    "q_commit_log_travel_sql" -> ((s, d) => {
      val root = commitLogFor(s, d)
      val cat = catName("gclt", d)
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.dir", travelCatFor(s, d))
      s.sql(s"CREATE TABLE IF NOT EXISTS $cat.orders_v " +
        s"USING `graft.commitlog` LOCATION '$root'")
      s.sql("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) " +
        s"AS total FROM $cat.orders_v VERSION AS OF 2 " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")
    }),

    // COMPACTION through the commit log (sources/CommitLog.compact — the
    // lakehouse OPTIMIZE): the fixture's four-directory append history is
    // consolidated to one directory and vacuumed, and the declared result
    // aggregates the compacted head. The oracle rebuilds the same union
    // relationally from orders, proving compaction is row-invisible;
    // CommitLogSpec covers the mechanics (dir collapse, file bound,
    // travel-before-vacuum, no-op on a compact head). At 100 TB this is
    // what bounds scan planning at O(targetFiles + appends-since-compact)
    // files instead of O(history).
    "q_commit_log_compact" -> ((s, d) => {
      val root = compactLogFor(s, d)
      graft.sources.CommitLog.readLatest(s, root).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // DATA SKIPPING through commit-log min/max stats (CommitLog
    // .readLatestWhere — the Delta/Iceberg file-stats story at directory
    // granularity): each commit records its dir's [min, max] of a
    // designated column in the commit JSON, and a key-range read scans
    // only intersecting dirs (here 1 of 4 — CommitLogSpec proves the
    // pruning via inputFiles), with the row predicate still applied after.
    // The oracle rebuilds the same slice relationally, so pruning that
    // dropped a row it shouldn't have hash-fails. At 100 TB: a key-range
    // probe of an append history costs O(matching dirs), not O(history).
    "q_commit_log_skip" -> ((s, d) => {
      val root = skipLogFor(s, d)
      graft.sources.CommitLog.readLatestWhere(s, root, "bucket", 2L, 2L).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // POINT-lookup data skipping via BLOOM SIDECARS (CommitLog
    // .readLatestPoint — the Delta bloom-index story): the probe key
    // (the primary key, uniformly scattered across all four dirs) defeats
    // min/max stats, but each dir's `_bloom/<dir>.bin` sidecar answers
    // "definitely absent" with no false negatives, so the exact-key read
    // scans ~1 of 4 dirs (CommitLogSpec proves pruning via inputFiles and
    // the corrupt-sidecar degrade path). Oracle = the same point SELECT —
    // a wrongly-skipped dir would drop the row and hash-fail. At 100 TB:
    // key probes cost O(dirs that might hold the key), not O(history).
    "q_commit_log_bloom" -> ((s, d) => {
      val root = skipLogFor(s, d)
      graft.sources.CommitLog.readLatestPoint(s, root, "o_orderkey", 32L).get
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "bucket")
        .reportSort("o_orderkey")
    }),

    // MERGE INTO through the commit log (CommitLog.merge — the Delta
    // upsert/delete verb): one serializable commit applies updates,
    // inserts, and flagged deletes to the keyed table, rewriting ONLY the
    // directories whose recorded o_orderkey stats might contain a merge
    // key (copy-on-write dir pruning; all-new-key changesets degrade to
    // an O(delta) append). The oracle rebuilds the merged end state
    // relationally — a stale row left beside its update, a lost delete,
    // or a dropped insert all hash-fail. At 100 TB: a merge costs the
    // affected dirs' rewrite + the changeset scan, never a table rewrite.
    "q_commit_log_merge" -> ((s, d) => {
      val root = mergeLogFor(s, d)
      graft.sources.CommitLog.readLatest(s, root).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // EXACTLY-ONCE idempotent appends (CommitLog.commitAppendOnce — the
    // Delta `txn` watermark): each append records (appId, batchId) in its
    // commit, and a batch at-or-below the newest retained watermark
    // no-ops — so foreachBatch re-delivery (crash between sink write and
    // checkpoint advance) cannot duplicate rows. The fixture delivers
    // batch 1 twice; the oracle holds each batch once, so a duplicated
    // batch hash-fails. StreamOps.runStreamToCommitLog rides this to make
    // writeStream → commit log exactly-once end-to-end (StreamingSpec).
    "q_commit_log_txn" -> ((s, d) => {
      val root = txnLogFor(s, d)
      graft.sources.CommitLog.readLatest(s, root).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
        .reportSort("o_orderstatus")
    }),

    // CHANGE DATA FEED over the commit log (CommitLog.changesSince — the
    // Delta CDF shape and vocabulary): row-level deltas from a base
    // version to the head, typed insert / update_preimage /
    // update_postimage / delete (pre-images and deletes carry the STORED
    // row) and stamped with their commit version, so downstream keyed
    // state — and, because every type carries an algebraic sign,
    // downstream AGGREGATES — ride THROUGH merges instead of resyncing.
    // Appends synthesize inserts from their own data dirs at zero
    // storage; merges persist their changeset to _changes/<newDir>,
    // keyed by the new data dir's unique name and written BEFORE the
    // claim, so a visible merge commit always has a visible feed;
    // purge deliberately breaks the feed (a CDF that
    // retained purged rows as delete records would defeat retention).
    // Oracle rebuilds the same typed rows relationally — a missing
    // delete, a double-delivered insert, or a mis-stamped version all
    // hash-fail. At 100 TB: consuming a merge costs the changeset's
    // size, not the table's.
    // CHANGE FEED through the r14 row-level verbs (q_commit_log_cdf's
    // sibling): the DELETE and UPDATE commits persist typed changesets,
    // so the feed from v1 delivers the deleted rows and the update's
    // pre/post images — each stamped with its commit version — instead
    // of the pre-r14 resync. The oracle rebuilds every change row
    // relationally, so a missing image, a wrong pre-value, or a feed
    // that leaked non-matching rows all hash-fail.
    "q_commit_log_cdf2" -> ((s, d) => {
      val root = cdf2LogFor(s, d)
      graft.sources.CommitLog.changesSince(s, root, 1L).get
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
            .as("o_totalprice"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
        .orderBy("commit_version", "change_type", "o_orderkey")
    }),

    "q_commit_log_cdf" -> ((s, d) => {
      val root = cdfLogFor(s, d)
      graft.sources.CommitLog.changesSince(s, root, 1L).get
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice").cast("decimal(18,2)").cast("double"), 2)
            .as("o_totalprice"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
        .orderBy("commit_version", "change_type", "o_orderkey")
    }),

    // INCREMENTAL VIEW MAINTENANCE from the change feed (DataModel
    // .maintainAggFromChanges): a per-status (count, sum) is materialized
    // at version 1 and maintained to the head PURELY from changesSince —
    // the append's inserts add, the merge's pre-images subtract exactly
    // the rows its post-images replace, deletes subtract the stored row.
    // Decimal arithmetic keeps the fold exact, so the oracle — the same
    // aggregate recomputed directly over the final state — must
    // hash-match: incremental maintenance and recomputation are provably
    // interchangeable. At 100 TB: refreshing the aggregate after a merge
    // costs the changeset's scan, not the table's — materialized-view
    // maintenance derived from the log.
    "q_commit_log_incr_agg" -> ((s, d) => {
      val root = cdfLogFor(s, d)
      val base = graft.sources.CommitLog.readVersion(s, root, 1L).get
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      val changes = graft.sources.CommitLog.changesSince(s, root, 1L).get
        .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
      graft.operators.DataModel
        .maintainAggFromChanges(base, changes, "o_orderstatus", "o_totalprice")
        .select(col("o_orderstatus"), col("cnt"),
          round(col("total").cast("double"), 2).as("total"))
        .reportSort("o_orderstatus")
    }),

    // Schema-evolved read: one directory, two parquet generations, the
    // newer with an added column — read through mergeSchema, which unions
    // the footer schemas and nulls the missing column for old files (the
    // mechanics every long-lived ingest needs when the contract grows).
    // Columns are selected EXPLICITLY: merged field order depends on file
    // enumeration, and a declared result must not. Scale: mergeSchema
    // costs one footer read per file at planning (distributed); the data
    // scan itself still prunes columns per file — old files read 3
    // columns, new files 4, nothing is rewritten. The oracle rebuilds the
    // same union from the documents table with an explicit NULL branch.
    "q_source_evolved" -> ((s, d) =>
      s.read.option("mergeSchema", "true").parquet(evolvedDocsFor(s, d))
        .select("doc_id", "lang", "n_chars", "source")
        .orderBy("doc_id")),

    // Non-parquet ingestion into the same table contract (the reference
    // loads JSONL exports [U]): a JSONL copy of documents read back
    // through Tables.loadAs with the parquet twin's schema pinned — the
    // oracle (plain SELECT over the parquet table) proves the two routes
    // hash-identical. Line-splittable input + pinned schema = the scan
    // parallelizes and type-checks exactly like the parquet path.
    "q_source_jsonl" -> ((s, d) =>
      Tables.loadAs(s, jsonlDocsFor(s, d), Tables.documents(s, d).schema)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // CSV twin of q_source_jsonl — the OTHER common first mile. Unlike
    // JSONL, CSV has no self-describing field names per row, so the pinned
    // schema + header is the whole type contract; the full text column
    // (embedded spaces, quoted) rides the round trip and is length-checked
    // in the output, proving payload fidelity, not just key columns.
    "q_source_csv" -> ((s, d) =>
      Tables.loadAs(s, csvDocsFor(s, d), Tables.documents(s, d).schema)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_len"))
        .orderBy("doc_id")),

    // Keys-only kind scan: column pruning means the 100 TB scan reads two
    // int64 columns only (check: ReadSchema in .explain).
    "q_scan_keysonly" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")),

    // COUNT(*): parquet metadata-only at best; partial counts per partition,
    // single-row final combine — no data shuffle.
    "q_scan_count" -> ((s, d) =>
      Tables.orders(s, d).agg(count(lit(1)).as("cnt"))),

    // JSONL sink row shape (the reference's GCS JSONL writer [U]); the JSON
    // string is built from stable-typed fields so DuckDB can reproduce it
    // byte-identically.
    "q_sink_jsonl" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          concat(
            lit("{\"o_orderkey\":"), col("o_orderkey").cast("string"),
            lit(",\"o_orderstatus\":\""), col("o_orderstatus"),
            lit("\",\"o_orderpriority\":\""), col("o_orderpriority"),
            lit("\"}")).as("json"))
        .orderBy("o_orderkey")),

    // Day restatement via DYNAMIC partition overwrite — the backfill
    // primitive: the events table sits day-partitioned on disk (written
    // once per session); each run re-states the EARLIEST day (keeps only
    // its purchases — "the day after reprocessing") through
    // Sinks.overwritePartitions, which replaces exactly that day's
    // directory and leaves every other day's files byte-untouched
    // (SinksTopKSpec asserts untouched file paths). The declared result is
    // the read-back per-day rollup, so the oracle independently proves the
    // on-disk final state: restated day = purchases only, all other days
    // intact — a static overwrite would have emptied them.
    "q_sink_partitioned" -> ((s, d) => {
      val dir = dpoDirFor(s, d)
      val ev = dayEvents(s, d)
      val restate = ev
        .join(broadcast(ev.agg(min("day").as("day0"))),
          col("day") === col("day0"))
        .filter(col("event_type") === "purchase")
        .select("day", "event_type", "value")
      // A dynamic overwrite with ZERO rows touches no partitions at all —
      // the old day-0 files would silently survive while the oracle
      // expects purchases-only. That can only happen if the fixture's
      // earliest day has no purchases; fail loudly instead of diverging
      // (an empty restatement that MEANS "delete the day" would use an
      // explicit partition drop, not an overwrite). The restated frame is
      // persisted across guard + write so the join computes once.
      restate.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (restate.isEmpty) throw new IllegalStateException(
          "q_sink_partitioned: earliest day has no purchase events — " +
            "dynamic overwrite would be a no-op, not a restatement")
        dpoWriteLock.synchronized {
          graft.sources.Sinks.overwritePartitions(restate, dir, Seq("day"))
        }
      } finally restate.unpersist(blocking = false)
      s.read.parquet(dir)
        .withColumn("day", col("day").cast("date"))
        .groupBy("day")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4)
            .as("rev"))
        .reportSort("day")
    }),

    // Namespace iteration (reference walks __namespace__ [U]): one branch per
    // "namespace" (documents.source), unioned back. Catalyst collapses the
    // union of disjoint filters into parallel scans of the same files.
    "q_source_union_ns" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val branches = (0 to 7).map(i => docs.filter(col("source") === s"src$i"))
      branches.reduce(_ unionByName _)
        .groupBy("source").agg(count(lit(1)).as("cnt"))
        .reportSort("source")
    }),

    // Equality property filter (Datastore's core predicate [U]).
    "q_filter_eq" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"))),

    // Inequality + equality combo; both predicates reach PushedFilters.
    "q_filter_ineq" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 100000 &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // IN (= repeated equality in Datastore [U]) + null guard.
    "q_filter_in_null" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY") &&
          col("c_acctbal").isNotNull)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    // Projection query with computed column; decimal cast keeps the derived
    // revenue bit-identical to the DuckDB oracle.
    "q_project_rename" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)").cast("double").as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Sort + limit + offset (the reference's cursor-paging analogue [U]).
    // Catalyst plans sort+limit as TakeOrderedAndProject: per-partition top-k,
    // then a k-row merge on the driver — no global sort at 100 TB.
    "q_limit_offset_sort" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(100)),

    // Multi-key global sort + limit -> TakeOrderedAndProject (top-k).
    "q_sort_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(500)),

    // Correlated EXISTS — Catalyst decorrelates to a left-semi join; the
    // SQL text runs verbatim in DuckDB, so the oracle is the same string.
    "q_subquery_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(SubqueryExistsSql)
    }),

    // Correlated scalar subqueries (decorrelated to aggregated joins). The
    // predicate compares exact decimals (price × count > sum) instead of a
    // float average, so boundary rows can't flip between engines.
    "q_subquery_scalar" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(SubqueryScalarSql)
    }),

    // UNION = union + dedup (shuffle on the full row).
    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    }),

    // INTERSECT: customers ordering in both 1995 and 1996.
    "q_set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // EXCEPT: customers with orders minus those with an 'F' order.
    "q_set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    }))

  /** Runs verbatim in both Spark and DuckDB. */
  val SubqueryExistsSql: String =
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
      "ORDER BY c_custkey"

  /** Runs verbatim in both Spark and DuckDB. */
  val SubqueryScalarSql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
      "WHERE CAST(o_totalprice AS DECIMAL(18,2)) * " +
      "(SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) > " +
      "(SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) " +
      "ORDER BY o_orderkey"

  val oracles: Map[String, String] = Map(
    "q_commit_log_restore" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 16) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_call" ->
      ("SELECT * FROM (VALUES " +
        "(CAST(1 AS BIGINT), 'loader', 'create', 1, FALSE), " +
        "(CAST(2 AS BIGINT), 'repricer', 'adjust', 1, FALSE), " +
        "(CAST(3 AS BIGINT), 'loader', 'append', 2, FALSE), " +
        "(CAST(4 AS BIGINT), 'operator', 'restore', 1, FALSE)) " +
        "AS h(version, writer, action, n_dirs, row_invisible) " +
        "ORDER BY version"),
    "q_commit_log_history" ->
      ("SELECT * FROM (VALUES " +
        "(CAST(1 AS BIGINT), 'loader', 'create', 1, FALSE), " +
        "(CAST(2 AS BIGINT), 'repricer', 'adjust', 1, FALSE), " +
        "(CAST(3 AS BIGINT), 'loader', 'append', 2, FALSE), " +
        "(CAST(4 AS BIGINT), 'operator', 'restore', 1, FALSE)) " +
        "AS h(version, writer, action, n_dirs, row_invisible) " +
        "ORDER BY version"),
    "q_commit_log_delete" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 27 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 28 AND o_orderkey % 3 <> 0) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_dv" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (51, 52, 53) " +
        "AND o_orderkey NOT IN (" +
        "SELECT coalesce(min(o_orderkey), -1) FROM orders WHERE o_orderkey % 100 = 51 " +
        "UNION ALL SELECT coalesce(min(o_orderkey), -1) FROM orders WHERE o_orderkey % 100 = 52 " +
        "UNION ALL SELECT coalesce(min(o_orderkey), -1) FROM orders WHERE o_orderkey % 100 = 53) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_rename" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total, " +
        "round(CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE), 2) AS wtotal " +
        "FROM orders WHERE o_orderkey % 100 IN (56, 57) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_evolve_nested" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus AS st, o_totalprice AS tp, " +
        "CAST(NULL AS DOUBLE) AS bonus, 'std' AS tier " +
        "FROM orders WHERE o_orderkey % 100 = 60 " +
        "UNION ALL SELECT 'F', 111.0, 2.5, 'std' " +
        "UNION ALL SELECT 'O', 222.0, CAST(NULL AS DOUBLE), 'std' " +
        "UNION ALL SELECT 'F', 333.0, 3.5, 'gold' " +
        "UNION ALL SELECT 'O', 444.0, CAST(NULL AS DOUBLE), " +
        "CAST(NULL AS VARCHAR)) " +
        "SELECT st, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(tp AS DECIMAL(18,2))) AS DOUBLE), 2) AS total, " +
        "count(bonus) AS n_bonus, count(tier) AS n_tier, " +
        "count(CASE WHEN tier = 'std' THEN 1 END) AS n_std " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_skip_str" ->
      ("SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderstatus = 'O' " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_merge_dv" ->
      ("WITH keys AS (SELECT o_orderkey % 100 AS cls, " +
        "min(o_orderkey) AS kmin, max(o_orderkey) AS kmax " +
        "FROM orders WHERE o_orderkey % 100 IN (58, 59) GROUP BY 1), " +
        "snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderkey IN (SELECT kmin FROM keys) THEN 999.99 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 IN (58, 59) " +
        "AND o_orderkey NOT IN (SELECT kmax FROM keys) " +
        "UNION ALL SELECT 'F', 111.11 UNION ALL SELECT 'O', 222.22) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_widen" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, CAST(o_orderkey % 1000 AS BIGINT) AS qty " +
        "FROM orders WHERE o_orderkey % 100 = 61 " +
        "UNION ALL " +
        "SELECT o_orderstatus, CAST(o_orderkey % 1000 AS BIGINT) + 4000000000 AS qty " +
        "FROM orders WHERE o_orderkey % 100 = 62) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(qty) AS BIGINT) AS sq, " +
        "CAST(sum(qty) AS BIGINT) AS sq2 " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_partition" ->
      ("WITH base AS (SELECT CAST(year(o_orderdate) AS STRING) AS yr, " +
        "o_totalprice FROM orders WHERE o_orderkey % 100 = 63), " +
        "snap AS (SELECT yr, o_totalprice FROM base WHERE yr <> '1995' " +
        "UNION ALL SELECT yr, o_totalprice + 1000 FROM base " +
        "WHERE yr = '1995') " +
        "SELECT yr, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_generated" ->
      ("SELECT o_orderkey % 8 AS bucket, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (65, 66) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_dv_sql" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (54, 55) " +
        "AND o_orderkey NOT IN (" +
        "SELECT coalesce(min(o_orderkey), -1) FROM orders WHERE o_orderkey % 100 = 54 " +
        "UNION ALL SELECT coalesce(min(o_orderkey), -1) FROM orders WHERE o_orderkey % 100 = 55) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_replace" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 25 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice + 1.0 " +
        "FROM orders WHERE o_orderkey % 100 = 26) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_write" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (18, 19, 20) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_insert" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (21, 22) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_ts" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 23) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_skip2" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE (o_orderkey % 4) // 2 = 1 " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_sql" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 0 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 1) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_evolved" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice, " +
        "CAST(NULL AS BIGINT) AS o_clerk_prio " +
        "FROM orders WHERE o_orderkey % 100 = 14 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "o_orderkey % 7 " +
        "FROM orders WHERE o_orderkey % 100 = 15 ORDER BY o_orderkey"),
    "q_commit_log" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 0 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 1) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_constraint" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (34, 35) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_update" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' AND o_orderkey % 100 = 29 " +
        "THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 IN (29, 30)) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_merge_sql" ->
      ("WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 IN (31, 32)), " +
        "changes AS (" +
        "SELECT o_orderkey, o_orderstatus, o_totalprice + 5.0 AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 31 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 33), " +
        "merged AS (" +
        "SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes) " +
        "UNION ALL SELECT * FROM changes) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM merged GROUP BY 1 ORDER BY 1"),
    "q_commit_log_merge_nmbs" ->
      ("WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 IN (38, 39)), " +
        "merged AS (" +
        // matched: class-38 keys divisible by 3 reprice +5
        "SELECT o_orderkey, o_orderstatus, o_totalprice + 5.0 AS o_totalprice " +
        "FROM base WHERE o_orderkey % 100 = 38 AND o_orderkey % 3 = 0 " +
        // not matched by source: first clause deletes class-39 ÷3; the
        // second (first-match-wins) updates remaining OPEN rows +1
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 1.0 " +
        "ELSE o_totalprice END " +
        "FROM base WHERE NOT (o_orderkey % 100 = 38 AND o_orderkey % 3 = 0) " +
        "AND NOT (o_orderkey % 100 = 39 AND o_orderkey % 3 = 0)) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM merged GROUP BY 1 ORDER BY 1"),
    "q_commit_log_merge_multi" ->
      ("WITH base AS (SELECT o_orderstatus, o_orderkey % 7 AS bucket, " +
        "count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 = 40 GROUP BY 1, 2), " +
        "merged AS (" +
        "SELECT o_orderstatus, bucket, cnt, " +
        "CASE WHEN bucket < 2 THEN total + 100.0 ELSE total END AS total " +
        "FROM base " +
        "UNION ALL SELECT o_orderstatus, bucket + 10, cnt, total " +
        "FROM base WHERE bucket = 4) " +
        "SELECT o_orderstatus, bucket, cnt, total FROM merged " +
        "ORDER BY o_orderstatus, bucket"),
    "q_commit_log_update_nested" ->
      ("SELECT o_orderkey, o_orderstatus AS status, " +
        "CASE WHEN o_orderstatus = 'O' AND o_orderkey % 3 = 0 " +
        "THEN o_totalprice + 10.0 ELSE o_totalprice END AS price " +
        "FROM orders WHERE o_orderkey % 100 = 41 ORDER BY o_orderkey"),
    "q_commit_log_merge_evolve" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "CAST(NULL AS VARCHAR) AS note " +
        "FROM orders WHERE o_orderkey % 100 = 42 AND o_orderkey % 3 <> 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice + 5.0, 'upd' " +
        "FROM orders WHERE o_orderkey % 100 = 42 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, 'new' " +
        "FROM orders WHERE o_orderkey % 100 = 43 " +
        "ORDER BY o_orderkey"),
    "q_commit_log_delete_sql" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (47, 48) " +
        "AND NOT (o_orderkey % 100 = 48 AND o_orderkey % 3 = 0) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_replace_sql" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 45 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice + 1.0 " +
        "FROM orders WHERE o_orderkey % 100 = 46) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_ctas" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 = 44 " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_travel_sql" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 0) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_travel" ->
      ("WITH snap AS (" +
        "SELECT o_orderstatus, " +
        "CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0 " +
        "ELSE o_totalprice END AS o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 0) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM snap GROUP BY 1 ORDER BY 1"),
    "q_commit_log_compact" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (2, 3, 4, 5) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_bloom" ->
      ("SELECT o_orderkey, o_orderstatus, o_totalprice, " +
        "o_orderkey % 4 AS bucket FROM orders WHERE o_orderkey = 32 " +
        "ORDER BY o_orderkey"),
    "q_commit_log_merge" ->
      ("WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 IN (6, 7)), " +
        "changes AS (" +
        "SELECT o_orderkey, o_orderstatus, o_totalprice + 5.0 AS o_totalprice, " +
        "FALSE AS del FROM orders WHERE o_orderkey % 100 = 6 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, FALSE " +
        "FROM orders WHERE o_orderkey % 100 = 8 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, TRUE " +
        "FROM orders WHERE o_orderkey % 100 = 7 AND o_orderkey % 3 = 0), " +
        "merged AS (" +
        "SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes) " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice FROM changes WHERE NOT del) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM merged GROUP BY 1 ORDER BY 1"),
    "q_commit_log_cdf2" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice, " +
        "'delete' AS change_type, CAST(2 AS BIGINT) AS commit_version " +
        "FROM orders WHERE o_orderkey % 100 = 37 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "'update_preimage', CAST(3 AS BIGINT) " +
        "FROM orders WHERE o_orderkey % 100 = 36 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice + 7.0 AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "'update_postimage', CAST(3 AS BIGINT) " +
        "FROM orders WHERE o_orderkey % 100 = 36 AND o_orderkey % 3 = 0 " +
        "ORDER BY commit_version, change_type, o_orderkey"),
    "q_commit_log_cdf" ->
      ("SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice, " +
        "'insert' AS change_type, CAST(2 AS BIGINT) AS commit_version " +
        "FROM orders WHERE o_orderkey % 100 = 13 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "'delete', CAST(3 AS BIGINT) " +
        "FROM orders WHERE o_orderkey % 100 = 13 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice + 5.0 AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "'update_postimage', CAST(3 AS BIGINT) " +
        "FROM orders WHERE o_orderkey % 100 = 12 AND o_orderkey % 3 = 0 " +
        "UNION ALL SELECT o_orderkey, o_orderstatus, " +
        "round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2), " +
        "'update_preimage', CAST(3 AS BIGINT) " +
        "FROM orders WHERE o_orderkey % 100 = 12 AND o_orderkey % 3 = 0 " +
        "ORDER BY commit_version, change_type, o_orderkey"),
    "q_commit_log_incr_agg" ->
      ("WITH final AS (" +
        "SELECT o_orderstatus, CASE WHEN o_orderkey % 3 = 0 " +
        "THEN o_totalprice + 5.0 ELSE o_totalprice END AS p " +
        "FROM orders WHERE o_orderkey % 100 = 12 " +
        "UNION ALL SELECT o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey % 100 = 13 AND o_orderkey % 3 <> 0) " +
        "SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM final GROUP BY 1 ORDER BY 1"),
    "q_commit_log_txn" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 100 IN (9, 10, 11) " +
        "GROUP BY 1 ORDER BY 1"),
    "q_commit_log_skip" ->
      ("SELECT o_orderstatus, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total " +
        "FROM orders WHERE o_orderkey % 4 = 2 " +
        "GROUP BY 1 ORDER BY 1"),
    "q_source_evolved" ->
      ("SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS source " +
        "FROM documents WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, lang, n_chars, source " +
        "FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id"),
    "q_source_jsonl" ->
      "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id",
    "q_source_csv" ->
      "SELECT doc_id, lang, source, n_chars, CAST(length(text) AS INTEGER) AS text_len FROM documents ORDER BY doc_id",
    "q_subquery_exists" -> SubqueryExistsSql,
    "q_subquery_scalar" -> SubqueryScalarSql,
    "q_scan_keysonly" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_scan_count" ->
      "SELECT count(*) AS cnt FROM orders",
    "q_sink_jsonl" ->
      """SELECT o_orderkey, '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || ',"o_orderstatus":"' || o_orderstatus || '","o_orderpriority":"' || o_orderpriority || '"}' AS json FROM orders ORDER BY o_orderkey""",
    "q_sink_partitioned" ->
      ("WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events), " +
        "d0 AS (SELECT min(day) AS day0 FROM e), " +
        "f AS (SELECT e.* FROM e, d0 WHERE day <> day0 OR event_type = 'purchase') " +
        "SELECT day, count(*) AS cnt, " +
        "round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS rev " +
        "FROM f GROUP BY day ORDER BY day"),
    "q_source_union_ns" ->
      ("SELECT source, count(*) AS cnt FROM (" +
        (0 to 7).map(i => s"SELECT * FROM documents WHERE source = 'src$i'")
          .mkString(" UNION ALL ") +
        ") GROUP BY source ORDER BY source"),
    "q_filter_eq" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
    "q_filter_ineq" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000 AND o_orderdate >= TIMESTAMP '1996-01-01' ORDER BY o_orderkey",
    "q_filter_in_null" ->
      "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY') AND c_acctbal IS NOT NULL ORDER BY c_custkey",
    "q_project_rename" ->
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q_limit_offset_sort" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 10",
    "q_sort_multi" ->
      "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem ORDER BY l_shipdate DESC, l_orderkey, l_linenumber LIMIT 500",
    "q_set_union" ->
      "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE' ORDER BY c_custkey",
    "q_set_intersect" ->
      "SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995 INTERSECT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996 ORDER BY o_custkey",
    "q_set_except" ->
      "SELECT o_custkey FROM orders EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' ORDER BY o_custkey")
}
