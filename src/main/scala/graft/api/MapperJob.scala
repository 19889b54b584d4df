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
}

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
        job.sliceSkipped(spark, c)
        processed += slice.count()
      } else {
        job.sliceStarted(spark, c)
        val obs = Observation()
        slice.observe(obs, count(lit(1)).as("processed"))
          .as[T](implicitly[Encoder[T]])
          .mapPartitions(it => it.flatMap(job.next))
          .write.mode("overwrite").parquet(dir)
        val sliceProcessed = obs.get("processed").asInstanceOf[Long]
        job.sliceCommitted(spark, c, sliceProcessed)
        processed += sliceProcessed
        ran += c
      }
    }
    job.jobCompleted(spark, processed)
    (processed, ran.toSeq)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mapper_jsonl" -> ((s, d) => {
      import s.implicits._
      MapperRunner.run(s, d, JsonlJob)._1.toDF().orderBy(col("o_orderkey"))
    }))

  val oracles: Map[String, String] = Map(
    "q_mapper_jsonl" ->
      """SELECT o_orderkey, '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) || ',"o_orderstatus":"' || o_orderstatus || '","o_orderpriority":"' || o_orderpriority || '"}' AS json FROM orders ORDER BY o_orderkey""")
}
