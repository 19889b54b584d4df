package graft

import org.apache.spark.sql.SparkSession

/** Single place for the session config the engine depends on. */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // native engine functions (cosine_similarity) via Catalyst extensions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); Spark 4 can only surface it as
      // a long (Tables.events converts to a µs TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // µs parquet timestamps on write (not INT96/ns) so the driver's reader
      // sees the same logical type DuckDB produces for the oracle result.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // let keyed ops consume the graft connectors' on-disk clustering
      // (KeyGroupedPartitioning reported by IvfScan/IndexScan): without this
      // Spark ignores connector-reported partitioning and re-shuffles data
      // the layout already groups by cid / term-bucket
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession =
    install(builder(s"local[$cpus]", cpus).getOrCreate())

  /** Post-create installation for the one hook the extensions API cannot
    * reach (r19): `experimental.extraOptimizations` runs as the LAST
    * optimizer batch ("User Provided Optimizers") — the only injection
    * point sequenced AFTER the V2 push-down batch that creates the
    * V1ScanWrapper [[graft.plans.RestoreV1ScanStatistics]] rewrites
    * (injectOptimizerRule and injectPreCBORule both run before it).
    * Idempotent; every engine entry point wraps its getOrCreate. */
  def install(s: SparkSession): SparkSession = {
    if (!s.experimental.extraOptimizations
        .contains(graft.plans.RestoreV1ScanStatistics))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+
          graft.plans.RestoreV1ScanStatistics
    s
  }
}
