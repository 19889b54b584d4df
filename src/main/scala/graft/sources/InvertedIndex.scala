package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk inverted index: term → sorted posting list of doc_ids, stored
  * partitioned by a hash BUCKET of the term so a term lookup reads exactly
  * one of `buckets` directories (partition pruning) instead of scanning the
  * corpus — the index-backed query shape the reference's Datastore backend
  * implies (every Datastore query is index-backed [U, SURVEY.md §0]).
  *
  * Build: one explode + distinct + groupBy(term) — two shuffles, run once;
  * lookups are then corpus-size-independent (bucket dir + term filter).
  * The bucket expression `pmod(xxhash64(term), buckets)` is evaluated on a
  * LITERAL at lookup time, so Catalyst constant-folds it and the partition
  * filter prunes at planning. At 100 TB, posting lists for stop-word-class
  * terms exceed a single row's practical size — production splits postings
  * into fixed-size segments (term, seg_no, doc_ids); the lookup shape is
  * unchanged (explode over segments).
  */
object InvertedIndex {
  val DefaultBuckets = 64

  private def toks = expr("filter(split(text, ' '), w -> w <> '')")

  private def postings(docs: DataFrame, buckets: Int): DataFrame =
    docs.select(col("doc_id"), explode(toks).as("term"))
      .distinct()
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"),
        count(lit(1)).as("df"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))

  def build(docs: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit =
    postings(docs, buckets).write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)

  /** Incremental append: the new docs' postings land as ADDITIONAL segment
    * rows in the same bucket partitions (dynamic-partition append — nothing
    * existing is rewritten, and only the new docs shuffle). A term present
    * in both builds then has one row per build; [[lookup]] already explodes
    * every matching row, so lookups over (initial + appended) equal a
    * from-scratch build on the union, provided the corpora are doc-disjoint
    * (append-only doc_ids — re-ingesting a doc needs a compaction rebuild).
    * This IS the posting-segment strategy the build doc describes; `df` is
    * per-segment, so a total document frequency is sum(df) over a term's
    * segments. */
  def append(docs: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit =
    postings(docs, buckets).write.mode("append")
      .partitionBy("bucket").parquet(dir)

  /** Segment compaction: after many [[append]]s a hot term accumulates one
    * segment row per batch; this folds them back to one row per term
    * (merged sorted postings, summed df) and rewrites the index in place.
    * One shuffle keyed by term — run it on the cadence LSM stores run
    * their merges, amortized across the append-heavy interval. The write
    * goes through a temp directory + atomic-ish swap so a reader never
    * sees a half-compacted index (same pattern as the ORC compaction
    * sink). Lookup results are unchanged by construction. */
  def compact(spark: SparkSession, dir: String,
      buckets: Int = DefaultBuckets): Unit = {
    val merged = spark.read.parquet(dir)
      .select(col("term"), explode(col("doc_ids")).as("doc_id"))
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"),
        count(lit(1)).as("df"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
    val tmp = dir + ".compacting"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** All doc_ids whose text contains `term`, via the index: reads one
    * bucket directory, one term row, explodes its postings. */
  def lookup(spark: SparkSession, dir: String, term: String,
      buckets: Int = DefaultBuckets): DataFrame =
    spark.read.parquet(dir)
      .filter(col("bucket") === pmod(xxhash64(lit(term)), lit(buckets.toLong))
        && col("term") === term)
      .select(explode(col("doc_ids")).as("doc_id"))
      .orderBy("doc_id")
}
