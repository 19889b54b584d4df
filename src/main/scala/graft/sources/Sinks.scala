package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** SURVEY.md §3.2 — the reference's source/sink surface re-expressed:
  * Datastore kinds -> parquet tables (graft.Tables); GCS JSONL writer +
  * compose -> writeJsonl(compose = true); BigQuery load -> partitioned
  * parquet as the (zero-egress) warehouse sink stand-in. Formats are the
  * engine's I/O boundary; everything else is format-agnostic DataFrames.
  *
  * Scale: `compose = true` (single output file) is the reference's GCS
  * compose semantics and only sane at test scale; production writes one
  * file per task plus `partitionBy` directory pruning, and relies on
  * Spark's atomic file-commit protocol (the lease-lock equivalent).
  */
object Sinks {
  def writeJsonl(df: DataFrame, path: String, compose: Boolean = false): Unit =
    (if (compose) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).json(path)

  /** Warehouse sink: columnar, optionally hive-partitioned by columns. */
  def writeWarehouse(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** DYNAMIC partition overwrite: replace ONLY the partitions `df`
    * contains rows for, leaving every other partition's files byte-
    * untouched (spec-asserted) — the day-restatement primitive behind
    * backfills and late-data reprocessing. Spark's default overwrite mode
    * is STATIC (drops the whole table root first); the mode is passed as a
    * PER-WRITE DataFrameWriter option, which overrides the session conf
    * for this write only — no session-global conf flip, so a concurrent
    * overwrite by another writer in the same session keeps ITS configured
    * mode (the r10 helper flipped the session conf around the write and
    * silently made any concurrent static overwrite dynamic). At 100 TB:
    * the write cost is the restated partitions' data, never the table's —
    * plus the same atomic per-partition file-commit every other write
    * here relies on. Concurrent writes to the SAME path still need
    * external serialization (the commit protocol races on the partition
    * directories, as with any Spark file sink). */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  /** ORC sink — the second columnar format (bundled orc-core); same
    * pruning/pushdown surface as parquet through the shared DSv2 reader. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Small-files compaction: rewrite a parquet directory into ~`targetFiles`
    * files (write-new-then-swap, so readers never see a half state). The
    * maintenance job every long-running ingest needs — streaming sinks and
    * per-slice mappers accrete small files, and scan parallelism degrades
    * into per-file task overhead. At 100 TB run per partition directory
    * with targetFiles sized to ~128-512 MB outputs. */
  def compactParquet(spark: SparkSession, dir: String, targetFiles: Int): Unit = {
    val tmp = s"$dir-compact-tmp"
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new java.io.File(s"$dir-compact-old")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    new java.io.File(dir).renameTo(old)
    new java.io.File(tmp).renameTo(new java.io.File(dir))
    rm(old)
  }

  /** Bucketed managed table (SCALE.md §Joins): co-bucketing both sides of a
    * recurring fact-fact join on the join key removes the exchange from
    * every downstream join — the 100 TB layout move. Requires the session
    * catalog (saveAsTable), so it's a layout tool, not a query-path sink. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}

object Sources {
  /** JSONL/CSV reads pin the caller's schema (no inference pass, no type
    * drift between batches) and are explicitly PERMISSIVE: a corrupt line
    * yields null columns — captured whole if the schema declares Spark's
    * `columnNameOfCorruptRecord` — instead of failing a 100 TB ingest at
    * row one-billion. Both formats are line-splittable, so the scan
    * parallelizes like parquet. `Tables.loadAs` dispatches here by path
    * suffix — the one non-parquet route into the table contract. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("mode", "PERMISSIVE").csv(path)
}
