package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, TempDirs}

/** Persisted mergeable sketches — SCALE.md's "materialize sketches once,
  * roll up anywhere" 100 TB pattern made a first-class artifact instead of
  * a prose claim.
  *
  *  - HLL sketch TABLES: per-group DataSketches HLL binaries written to
  *    parquet at the finest rollup grain. Any coarser rollup is
  *    `hll_union_agg` over the stored binaries — HLL union is register-max,
  *    so the estimate is IDENTICAL to sketching the fact directly
  *    (spec-asserted equality, not just error-envelope). At 100 TB the
  *    fact scan happens once at ingest; every later distinct-count rollup
  *    reads kilobytes of sketches instead.
  *  - Bloom BINARIES: the decontamination prefilter persisted once and
  *    reloaded in any later session/batch (incremental decontamination —
  *    new corpus batches probe the stored benchmark filter without
  *    re-aggregating the benchmark). Probes route through the same
  *    `graft_might_contain`/xxhash64 surface as the in-query scalar
  *    subquery, so stored and freshly-built filters are interchangeable.
  *
  * Sketch-table builds are session-memoized (same SessionCache + TempDirs
  * eviction discipline as the IVF/inverted-index layouts).
  */
object SketchStore {
  private val hllDirCache = new graft.SessionCache[String](graft.TempDirs.delete)

  /** Sketch table over orders: distinct-customer HLL per
    * (o_orderpriority, o_orderstatus) — the finest grain any declared
    * rollup needs. Built once per (session, sfDir). */
  def ordersCustomerHll(s: SparkSession, d: String): DataFrame = {
    val dir = hllDirCache.getOrBuild(s, d) {
      val out = TempDirs.create("graft-hll-sketches")
      Tables.orders(s, d)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
        .write.mode("overwrite").parquet(out)
      out
    }
    s.read.parquet(dir)
  }

  private val kmvDirCache = new graft.SessionCache[String](graft.TempDirs.delete)

  /** KMV/theta sketch table over orders (r13 — the HLL store's theta
    * sibling, so INTERSECTIONS also answer from storage): distinct-
    * customer KMV per (o_orderpriority, o_orderstatus). Rollups merge the
    * stored Array[Long] sketches with [[graft.functions.KmvMergeAggregator]]
    * — exact sketch algebra, estimate-identical to sketching the fact
    * (spec-asserted). Built once per (session, sfDir). */
  def ordersCustomerKmv(s: SparkSession, d: String): DataFrame = {
    val dir = kmvDirCache.getOrBuild(s, d) {
      val out = TempDirs.create("graft-kmv-sketches")
      val kmv = udaf(new graft.functions.KmvAggregator(
        graft.functions.Theta.DefaultK))
      Tables.orders(s, d)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(kmv(col("o_custkey")).as("sk"))
        .write.mode("overwrite").parquet(out)
      out
    }
    s.read.parquet(dir)
  }

  /** Persist a bloom filter over `c` (xxhash64'd by graft_bloom_agg) as a
    * one-row binary parquet at `path`. */
  def writeBloom(df: DataFrame, c: String, items: Long, bits: Long,
      path: String): Unit =
    df.agg(expr(s"graft_bloom_agg($c, ${items}L, ${bits}L)").as("bloom"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted bloom binary (driver-side: one row, ~bits/8 bytes —
    * the whole point is that this is small enough to ship as a literal). */
  def readBloom(s: SparkSession, path: String): Array[Byte] =
    s.read.parquet(path).head().getAs[Array[Byte]]("bloom")

  /** Membership probe of `c` against a loaded bloom binary — the same
    * expression surface as the scalar-subquery route, with the filter
    * embedded as a literal. */
  def mightContain(bloom: Array[Byte], c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("graft_might_contain", lit(bloom), c)
}
