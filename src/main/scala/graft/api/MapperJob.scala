package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, pmod, struct, xxhash64}

/** SURVEY.md §4 entry point 3 — the reference-shaped mapper API: a `Job`
  * declares a query (which "kind" to scan) and a per-record `next` callback,
  * and the runner executes it as a distributed Spark plan [U: mirrors
  * datastore-mapper's Job/Next ergonomics; reference checkout is empty, see
  * SURVEY.md §0].
  *
  * The reference's machinery maps onto Spark wholesale (SURVEY.md §5):
  * scatter-shard planning -> parquet split planning; slice checkpoint/resume
  * -> task retry from lineage; lease locks -> deterministic re-execution +
  * atomic file commit; per-shard progress entities -> accumulators; GCS
  * compose -> coalesce(1) on write.
  */
trait MapperJob[T, O] extends Serializable {
  /** The "kind" scan + property filters (Datastore Query analogue). */
  def query(spark: SparkSession, sfDir: String): Dataset[T]
  /** Per-entity map callback; 0-or-more outputs (filter + transform). */
  def next(t: T): IterableOnce[O]
  /** Lifecycle hooks (reference: JobStarted/JobCompleted [U]). */
  def jobStarted(spark: SparkSession): Unit = {}
  def jobCompleted(spark: SparkSession, processed: Long): Unit = {}
  /** Per-slice hooks on the resumable path — the reference's shard/slice
    * boundary callbacks [U]. `sliceStarted` fires before a slice executes;
    * `sliceCommitted` after its _SUCCESS marker lands, with the slice's
    * processed count; `sliceSkipped` when a restart finds the slice already
    * committed by a previous run. Defaults are no-ops. */
  def sliceStarted(spark: SparkSession, slice: Int): Unit = {}
  def sliceCommitted(spark: SparkSession, slice: Int, processed: Long): Unit = {}
  def sliceSkipped(spark: SparkSession, slice: Int): Unit = {}

  /** Namespace iteration on the resumable path [U: the reference iterates
    * Datastore namespaces between the job and shard levels, firing
    * namespace-boundary lifecycle callbacks]. `namespaceColumn = None`
    * (default) keeps single-namespace behavior — no namespace hooks fire.
    * When set, [[MapperRunner.runToParquetResumable]] groups the input by
    * the column's string value, processes namespaces in sorted order (each
    * into its own `ns=<value>` output partition with its own slice set),
    * and fires these hooks around each group — the job → namespace → slice
    * hook hierarchy. Like `jobStarted`/`jobCompleted`, namespace hooks
    * RE-FIRE on a restart even when every slice inside skips via its
    * marker: they bracket iteration, not work; `namespaceCompleted`'s
    * `processed` is the whole-namespace total (skipped slices included),
    * mirroring `jobCompleted`. Namespace values must be path-safe (they
    * name output directories) and of small cardinality — they are
    * partition GROUPS (tenants, Datastore namespaces), collected to the
    * driver for ordered iteration. */
  def namespaceColumn: Option[Column] = None
  def namespaceStarted(spark: SparkSession, ns: String): Unit = {}
  def namespaceCompleted(spark: SparkSession, ns: String, processed: Long): Unit = {}

  /** Job chaining [U: a datastore-mapper job can trigger a continuation job
    * on completion]: `this` runs to completion (its `jobCompleted` hook
    * fires), then `next` starts with THIS job's output directory as its
    * input. Executed by [[MapperRunner.runChainedResumable]], which also
    * carries the slice checkpoint-resume contract ACROSS the boundary. */
  def andThen[T2, O2](next: MapperJob[T2, O2]): ChainedMapperJob[T, O, T2, O2] =
    ChainedMapperJob(this, next)
}

/** A two-stage chain built by [[MapperJob.andThen]]. */
final case class ChainedMapperJob[T1, O1, T2, O2](
    first: MapperJob[T1, O1], second: MapperJob[T2, O2])

object MapperRunner {
  /** Lazily runs the mapper as mapPartitions. Progress is an `Observation`
    * on the INPUT rows, not an accumulator inside the transformation:
    * observed metrics are computed once per completed action, so task
    * retries/speculation can't inflate the count the way accumulator
    * increments inside mapPartitions would — the effectively-once
    * accounting the reference's per-shard progress entities provided [U]. */
  def run[T, O: Encoder](spark: SparkSession, sfDir: String,
      job: MapperJob[T, O]): (Dataset[O], Observation) = {
    job.jobStarted(spark)
    val obs = Observation()
    val out = job.query(spark, sfDir)
      .observe(obs, count(lit(1)).as("processed"))
      .mapPartitions(it => it.flatMap(job.next))
    (out, obs)
  }

  /** Run + write ("compose" = single output file, like the reference's GCS
    * compose fan-in [U]); fires jobCompleted with the processed count. */
  def runToParquet[T, O: Encoder](spark: SparkSession, sfDir: String,
      job: MapperJob[T, O], outPath: String): Long = {
    val (out, obs) = run(spark, sfDir, job)
    out.coalesce(1).write.mode("overwrite").parquet(outPath)
    val processed = obs.get("processed").asInstanceOf[Long]
    job.jobCompleted(spark, processed)
    processed
  }

  /** Resumable batch run — the reference's slice/cursor checkpoint-resume
    * semantics [U] for WHOLE-JOB restarts, which task-retry lineage alone
    * does not give (that only covers task failure inside one job).
    *
    * The input is cut into `chunks` deterministic slices (default: xxhash64
    * over the full input row, so the assignment is stable across runs,
    * retries and re-planning). Each slice is processed and committed as its
    * own directory `outPath/chunk=<i>` — commit atomicity is Spark's file
    * committer plus its _SUCCESS marker. A restart skips every slice whose
    * marker exists and reprocesses only the rest: each input row lands in
    * the final output exactly once (spec-asserted by a kill/resume test).
    * Read the combined result with `spark.read.parquet(outPath)` (the
    * `chunk` directory column comes along; drop it if unwanted).
    *
    * Scale: default hash chunking re-scans the input once per slice — the
    * deliberate price of restartability on an unpartitioned input. For a
    * week-long 100 TB backfill, pass `chunkBy` aligned with the input's
    * partition layout (e.g. its date column): partition pruning then makes
    * each slice read only its own data, and resume costs nothing extra.
    *
    * Returns (processed rows, slice ids actually executed this run);
    * skipped slices contribute their (recomputed, deterministic) input
    * counts to `processed` so jobCompleted sees whole-job totals.
    */
  def runToParquetResumable[T: Encoder, O: Encoder](
      spark: SparkSession, sfDir: String, job: MapperJob[T, O],
      outPath: String, chunks: Int = 16,
      chunkBy: Option[Column] = None): (Long, Seq[Int]) = {
    require(chunks > 0, s"chunks must be positive, got $chunks")
    job.jobStarted(spark)
    val df = job.query(spark, sfDir).toDF()
    val (processed, ran) = job.namespaceColumn match {
      case None =>
        runSlices(spark, df, job, outPath, chunks, chunkBy, sliceBase = 0)
      case Some(nsCol) =>
        // Namespace list collected to the driver: namespaces are partition
        // GROUPS (Datastore namespaces, tenant ids) — small cardinality by
        // contract, exactly the reference's namespace-iteration shape [U].
        // Sorted so slice ids (nsIndex*chunks + c) and hook order are
        // deterministic across runs — resume depends on it. Null-safe
        // comparison so a NULL namespace forms its own "null" group rather
        // than silently dropping rows.
        val ns = nsCol.cast("string")
        val values = df.select(ns.as("ns")).distinct().orderBy("ns")
          .collect().map(_.getString(0))
        var total = 0L
        val ranAll = scala.collection.mutable.ArrayBuffer.empty[Int]
        values.zipWithIndex.foreach { case (v, i) =>
          job.namespaceStarted(spark, v)
          val (p, r) = runSlices(spark, df.filter(ns <=> lit(v)), job,
            s"$outPath/ns=$v", chunks, chunkBy, sliceBase = i * chunks)
          job.namespaceCompleted(spark, v, p)
          total += p
          ranAll ++= r
        }
        (total, ranAll.toSeq)
    }
    job.jobCompleted(spark, processed)
    (processed, ran)
  }

  /** The slice checkpoint/commit loop shared by the single-namespace and
    * per-namespace paths. Slice ids reported to hooks and returned in `ran`
    * are GLOBAL (`sliceBase + chunk`), so the job → namespace → slice
    * ordering is provable from the hook stream; without namespaces
    * `sliceBase` is 0 and ids equal chunk ids, the pre-namespace API. */
  private def runSlices[T: Encoder, O: Encoder](
      spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      job: MapperJob[T, O], outPath: String, chunks: Int,
      chunkBy: Option[Column], sliceBase: Int): (Long, Seq[Int]) = {
    val sliceId = pmod(chunkBy.getOrElse(xxhash64(struct(col("*")))), lit(chunks))
    var processed = 0L
    val ran = scala.collection.mutable.ArrayBuffer.empty[Int]
    // Marker checks go through Hadoop's FileSystem so resume works on any
    // supported filesystem (HDFS/S3/GCS), not just local disk — java.io.File
    // would silently re-run every slice of a remote 100 TB backfill.
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    (0 until chunks).foreach { c =>
      val dir = s"$outPath/chunk=$c"
      val slice = df.filter(sliceId === c)
      val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      if (marker.getFileSystem(hadoopConf).exists(marker)) {
        // committed by a previous run; the deterministic slice expression
        // makes this count identical to what that run processed
        job.sliceSkipped(spark, sliceBase + c)
        processed += slice.count()
      } else {
        job.sliceStarted(spark, sliceBase + c)
        val obs = Observation()
        slice.observe(obs, count(lit(1)).as("processed"))
          .as[T](implicitly[Encoder[T]])
          .mapPartitions(it => it.flatMap(job.next))
          .write.mode("overwrite").parquet(dir)
        val sliceProcessed = obs.get("processed").asInstanceOf[Long]
        job.sliceCommitted(spark, sliceBase + c, sliceProcessed)
        processed += sliceProcessed
        ran += sliceBase + c
      }
    }
    (processed, ran.toSeq)
  }

  /** Entity MUTATION through the facade [U: datastore-mapper jobs iterate
    * entities and can put/delete them, not only export] — the
    * transform-in-place shape: the job's `query` reads the LIVE table at
    * `path`, `next` returns the entity's replacement(s) (empty = delete),
    * the full output lands BESIDE the live directory, and
    * [[graft.AtomicSwap]] replaces it with the compact/retrain
    * checked-rename contract: a crash leaves the old snapshot live (or
    * fully intact at `<path>.old`), never half-rewritten. Returns the
    * processed entity count. */
  def rewriteInPlace[T, O: Encoder](spark: SparkSession, path: String,
      job: MapperJob[T, O], keepGenerations: Int = 0): Long = {
    job.jobStarted(spark)
    val obs = Observation()
    val tmp = path + ".rewriting"
    job.query(spark, path)
      .observe(obs, count(lit(1)).as("processed"))
      .mapPartitions(it => it.flatMap(job.next))
      .write.mode("overwrite").parquet(tmp)
    val processed = obs.get("processed").asInstanceOf[Long]
    graft.AtomicSwap.replace(spark.sparkContext.hadoopConfiguration,
      path, tmp, "rewriteInPlace", keepGenerations = keepGenerations)
    job.jobCompleted(spark, processed)
    processed
  }

  /** Read the `back`-th previous generation of a mutated table (see
    * [[graft.AtomicSwap.versionPath]]) — the time-travel escape hatch over
    * the copy-on-write verbs when they ran with `keepGenerations > 0`.
    * Throws with the retained-generation count when asked further back
    * than retention kept. */
  def readVersion(spark: SparkSession, path: String,
      back: Int = 1): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    graft.AtomicSwap.versionPath(conf, path, back) match {
      case Some(p) => spark.read.parquet(p)
      case None => throw new java.util.NoSuchElementException(
        s"no generation $back back of $path — retention kept fewer; " +
          "run the mutation verb with keepGenerations > 0")
    }
  }

  /** Delete-by-predicate over a parquet table — the common mutation,
    * without requiring a typed job: survivors pass through UNCHANGED
    * (row-identical rewrite), rows matching the predicate are removed, and
    * NULL-predicate rows are kept (SQL DELETE semantics). Same
    * copy-on-write atomic swap as [[rewriteInPlace]]. Returns
    * (kept, deleted), accounted by an Observation on the one rewrite pass
    * — no second scan. */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: Column, keepGenerations: Int = 0): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, not, when}
    val obs = Observation()
    val tmp = path + ".rewriting"
    spark.read.parquet(path)
      .observe(obs, count(lit(1)).as("total"),
        count(when(predicate, 1)).as("deleted"))
      .filter(not(coalesce(predicate, lit(false))))
      .write.mode("overwrite").parquet(tmp)
    val total = obs.get("total").asInstanceOf[Long]
    val deleted = obs.get("deleted").asInstanceOf[Long]
    graft.AtomicSwap.replace(spark.sparkContext.hadoopConfiguration,
      path, tmp, "deleteWhere", keepGenerations = keepGenerations)
    (total - deleted, deleted)
  }

  /** Upsert-by-key over a parquet table — the datastore "put" verb [U:
    * datastore-mapper jobs put entities]: rows of `updates` REPLACE live
    * rows sharing their key and rows with unseen keys are inserted, in one
    * copy-on-write pass (live anti-join updates' keys, union updates) with
    * the same [[graft.AtomicSwap]] contract as the other mutation verbs.
    * `updates` must carry the live schema. Returns (updated, inserted),
    * accounted by Observations on the single rewrite — no extra scan. At
    * scale the anti-join shuffles on the key once; a partitioned store
    * would bound the rewrite to the touched partitions, the same way the
    * segmented indexes replace only their own `seg=` directories. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], keepGenerations: Int = 0): (Long, Long) = {
    val live = spark.read.parquet(path)
    val obsL = Observation(); val obsK = Observation(); val obsU = Observation()
    val keyed = updates.select(keyCols.map(col): _*)
    val tmp = path + ".rewriting"
    live
      .observe(obsL, count(lit(1)).as("live"))
      .join(keyed, keyCols, "left_anti")
      .observe(obsK, count(lit(1)).as("kept"))
      .unionByName(updates.observe(obsU, count(lit(1)).as("upd")))
      .write.mode("overwrite").parquet(tmp)
    val liveN = obsL.get("live").asInstanceOf[Long]
    val kept = obsK.get("kept").asInstanceOf[Long]
    val updN = obsU.get("upd").asInstanceOf[Long]
    graft.AtomicSwap.replace(spark.sparkContext.hadoopConfiguration,
      path, tmp, "upsert", keepGenerations = keepGenerations)
    val updated = liveN - kept
    (updated, updN - updated)
  }

  /** Run a [[ChainedMapperJob]] with the resumable slice contract carried
    * ACROSS the chain boundary: job A checkpoints per slice into `midPath`;
    * when its final slice commits, its `jobCompleted` hook fires and job B
    * starts — reading A's output at `midPath` as its input — checkpointing
    * into `outPath`. ONE restart of this call resumes wherever the kill
    * landed: A's committed slices skip via their `_SUCCESS` markers (B
    * never starts early, because a restart re-walks A first), and B's
    * committed slices skip likewise. Combined progress = A's + B's
    * processed counts, with each job's own lifecycle events intact. */
  def runChainedResumable[T1: Encoder, O1: Encoder, T2: Encoder, O2: Encoder](
      spark: SparkSession, sfDir: String,
      chain: ChainedMapperJob[T1, O1, T2, O2],
      midPath: String, outPath: String,
      chunks: Int = 16): (Long, Seq[Int], Seq[Int]) = {
    val (pa, ranA) = runToParquetResumable(spark, sfDir, chain.first,
      midPath, chunks)
    // chain.first.jobCompleted has fired inside the call above — the
    // continuation starts on the completion hook, consuming A's output
    val (pb, ranB) = runToParquetResumable(spark, midPath, chain.second,
      outPath, chunks)
    (pa + pb, ranA, ranB)
  }
}

/** The contract-facing demo job: re-expresses q_sink_jsonl through the
  * mapper facade (same oracle SQL) — typed Dataset in, JSONL-ish out. */
object MapperFacade {
  final case class OrderRow(
      o_orderkey: Long, o_orderstatus: String, o_orderpriority: String)
  final case class JsonOut(o_orderkey: Long, json: String)

  object JsonlJob extends MapperJob[OrderRow, JsonOut] {
    def query(spark: SparkSession, sfDir: String): Dataset[OrderRow] = {
      import spark.implicits._
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .as[OrderRow]
    }
    def next(t: OrderRow): IterableOnce[JsonOut] = Iterator.single(JsonOut(
      t.o_orderkey,
      s"""{"o_orderkey":${t.o_orderkey},"o_orderstatus":"${t.o_orderstatus}","o_orderpriority":"${t.o_orderpriority}"}"""))
  }

  // Session-scoped MUTABLE copies of the documents table — the entity
  // stores the mutation queries operate on. Copies because the testdata is
  // read-only and a mutation query must own its target; one per mutation
  // query (their mutations must not interact — Verify/Bench run queries in
  // arbitrary order), cached per (session, sfDir) so the copy cost is paid
  // once, evicted with the temp-dir sweep.
  private val mutCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private val rwCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private val upCache = new graft.SessionCache[String](graft.TempDirs.delete)
  private def ownedDocsCopy(cache: graft.SessionCache[String],
      s: SparkSession, d: String, tag: String): String =
    cache.getOrBuild(s, d) {
      val root = graft.TempDirs.create(tag)
      val path = s"$root/documents"
      graft.Tables.documents(s, d).write.mode("overwrite").parquet(path)
      path
    }
  private def mutableDocsFor(s: SparkSession, d: String): String =
    ownedDocsCopy(mutCache, s, d, "graft-mutable-docs")

  /** The rewrite twin of q_mutate_delete: a TYPED transform-in-place job.
    * Entities from the retired `src13` feed are dropped (`next` returns
    * empty — the facade's flatMap contract covers delete and rewrite in
    * one pass); every survivor's `lang` normalizes to upper case. Both
    * steps are idempotent, so re-execution rewrites the identical entity
    * set. The job's `query` selects only the columns its output carries,
    * so it reads the live table equally before and after the first
    * rewrite. */
  final case class DocEnt(doc_id: Long, lang: String, source: String,
      n_chars: Long)
  object NormalizeJob extends MapperJob[DocEnt, DocEnt] {
    def query(spark: SparkSession, path: String): Dataset[DocEnt] = {
      import spark.implicits._
      spark.read.parquet(path)
        .select("doc_id", "lang", "source", "n_chars").as[DocEnt]
    }
    def next(t: DocEnt): IterableOnce[DocEnt] =
      if (t.source == "src13") Iterator.empty
      else Iterator.single(t.copy(lang = t.lang.toUpperCase))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mapper_jsonl" -> ((s, d) => {
      import s.implicits._
      MapperRunner.run(s, d, JsonlJob)._1.toDF().orderBy(col("o_orderkey"))
    }),

    // Entity MUTATION through the facade (VERDICT r7 missing #2 made
    // driver-checked): delete-by-predicate with the copy-on-write atomic
    // swap, then read the LIVE table back. Re-execution is idempotent —
    // the predicate's rows are already gone, so every rep rewrites the
    // identical survivor set. The oracle runs the equivalent SELECT over
    // the ORIGINAL table: survivors must be row-identical to never having
    // had the deleted rows.
    "q_mutate_delete" -> ((s, d) => {
      val path = mutableDocsFor(s, d)
      MapperRunner.deleteWhere(s, path, col("doc_id") % 7 === 0)
      s.read.parquet(path)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // The rewrite verb through the same facade (on its OWN table copy):
    // a typed job drops one source's entities and normalizes the rest,
    // rewriteInPlace swaps the result in atomically, and the query reads
    // the LIVE table back. The oracle applies the equivalent
    // transform-SELECT to the original table.
    "q_mutate_rewrite" -> ((s, d) => {
      import s.implicits._
      val path = ownedDocsCopy(rwCache, s, d, "graft-rewrite-docs")
      MapperRunner.rewriteInPlace(s, path, NormalizeJob)
      s.read.parquet(path)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // The put verb (upsert-by-key) through the facade, on its OWN copy:
    // one deterministic batch both UPDATES every doc_id % 10 == 0 entity
    // (source recurated) and INSERTS a shifted twin of every
    // doc_id % 50 == 0 doc — derived from the original table, so
    // re-execution converges (updates rewrite the same values, inserts
    // replace identical rows). The oracle applies the same merge as a
    // SELECT over the original table.
    "q_mutate_upsert" -> ((s, d) => {
      val path = ownedDocsCopy(upCache, s, d, "graft-upsert-docs")
      val orig = graft.Tables.documents(s, d)
      val updates = orig.filter(col("doc_id") % 10 === 0)
        .withColumn("source", lit("curated"))
        .unionByName(orig.filter(col("doc_id") % 50 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      MapperRunner.upsert(s, path, updates, Seq("doc_id"))
      s.read.parquet(path)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "q_mapper_jsonl" ->
      """SELECT o_orderkey, '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || ',"o_orderstatus":"' || o_orderstatus || '","o_orderpriority":"' || o_orderpriority || '"}' AS json FROM orders ORDER BY o_orderkey""",
    "q_mutate_delete" ->
      ("SELECT doc_id, source, lang, n_chars FROM documents " +
        "WHERE NOT (doc_id % 7 = 0) ORDER BY doc_id"),
    "q_mutate_rewrite" ->
      ("SELECT doc_id, upper(lang) AS lang, source, n_chars FROM documents " +
        "WHERE source <> 'src13' ORDER BY doc_id"),
    "q_mutate_upsert" ->
      ("SELECT doc_id, lang, " +
        "CASE WHEN doc_id % 10 = 0 THEN 'curated' ELSE source END AS source, " +
        "n_chars FROM documents " +
        "UNION ALL SELECT doc_id + 1000000 AS doc_id, lang, source, n_chars " +
        "FROM documents WHERE doc_id % 50 = 0 ORDER BY doc_id"))
}
