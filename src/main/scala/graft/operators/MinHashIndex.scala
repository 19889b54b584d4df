package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MinHash+LSH dedup maintenance (VERDICT r7 next #5): an
  * APPEND-ONLY on-disk index of everything the near-dup pipeline derives
  * from text — collapse groups, LSH bucket membership, shingle postings —
  * segmented by ingest batch exactly like [[graft.sources.InvertedIndex]]'s
  * `seg=` layout. A new batch computes ONLY ITS OWN shingles/signatures
  * (one pass over the batch, corpus untouched) and lands them as a new
  * segment; [[pairs]] then reconstructs the full near-dup pair set from the
  * STORED components — byte-identical to a from-scratch
  * [[Dedup.minhashNearDupPairs]] over the union corpus (spec-asserted) —
  * and [[freshPairs]] answers the steady-state question ("which pairs does
  * THIS batch introduce?") probing only the buckets the batch touched.
  *
  * Layout (all writes per-`seg` dynamic-partition-overwrite, so a retried
  * batch id replaces exactly its own partitions — the same retry-idempotent
  * contract as `InvertedIndex.append` / `IvfIndex.appendTo`):
  * {{{
  * dir/_graft_minhash.json            k / bands / rowsPerBand / buckets
  * dir/groups/seg=S                   (tkey, rep, members, has_sh)
  * dir/buckets/pb=P/seg=S             (rep, band, bh)   pb = pmod(xxhash64(band, bh), buckets)
  * dir/postings/pb=P/seg=S            (rep, sh)         pb = pmod(xxhash64(sh), buckets)
  * }}}
  *
  * Why this is exact across segments: the collapse key `tkey` (sha2 of raw
  * text) is stored, so identical texts arriving in different batches merge
  * at READ time (`groupBy(tkey)` over the doc-scale groups table — never
  * over text); their per-segment reps remap to the global min rep, and
  * because identical text means identical shingles, signatures, and bucket
  * keys, the remapped bucket/posting rows dedupe to exactly what a
  * from-scratch run over the union computes. The member-weighted df cap is
  * applied at read time against CURRENT global group sizes, so a shingle's
  * survival always matches the ground truth on today's corpus — the part
  * of the cap that cannot be precomputed per batch.
  *
  * Scale: appends are linear in the batch. [[pairs]] reads stored
  * components (each far smaller than re-shingling text: k hashes per doc
  * vs every 3-gram of every doc) with one doc-scale remap join;
  * [[freshPairs]] additionally restricts candidate generation to buckets
  * containing a batch-touched group. `pb` hash-partitioning keeps a future
  * pruned probe possible at the directory level, mirrors the inverted
  * index's bucket layout, and bounds file counts via the same
  * repartition-before-partitioned-write guard.
  *
  * Out of contract (same as the other segmented indexes): re-appending the
  * same doc_id in two different segments, and compaction under a live
  * reader.
  */
object MinHashIndex {
  final case class Params(k: Int = 16, bands: Int = 4, rowsPerBand: Int = 4,
      buckets: Int = 64)

  private val MetaFile = "_graft_minhash.json"
  private val MetaRe =
    """"k"\s*:\s*(\d+).*"bands"\s*:\s*(\d+).*"rowsPerBand"\s*:\s*(\d+).*"buckets"\s*:\s*(\d+)""".r.unanchored

  private def hadoopFs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(graft.sources.InvertedIndex.driverHadoopConf), p)
  }

  private def writeMeta(dir: String, p: Params): Unit = {
    // temp + rename: readers only ever see a complete file (same contract
    // as InvertedIndex.writeMeta)
    val (fs, root) = hadoopFs(dir)
    fs.mkdirs(root)
    val target = new org.apache.hadoop.fs.Path(root, MetaFile)
    val tmp = new org.apache.hadoop.fs.Path(root, s".$MetaFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"k": ${p.k}, "bands": ${p.bands}, "rowsPerBand": ${p.rowsPerBand}, "buckets": ${p.buckets}}"""
        .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(target, false)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"writeMeta: rename $tmp -> $target failed")
    }
  }

  def readMeta(dir: String): Params = {
    val (fs, root) = hadoopFs(dir)
    val f = new org.apache.hadoop.fs.Path(root, MetaFile)
    require(fs.exists(f), s"$dir is not a MinHashIndex (no $MetaFile)")
    val in = fs.open(f)
    val text = try {
      val out = new java.io.ByteArrayOutputStream(256)
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
    text match {
      case MetaRe(k, b, r, bu) => Params(k.toInt, b.toInt, r.toInt, bu.toInt)
      case _ => throw new IllegalStateException(
        s"$dir/$MetaFile exists but is not a MinHashIndex descriptor: $text")
    }
  }

  /** First build = the meta write plus the first segment's append. */
  def build(docs: DataFrame, dir: String, params: Params = Params()): Unit = {
    writeMeta(dir, params)
    append(docs, dir, seg = 0L)
  }

  /** Append one ingest batch: ONE shingle pass over the batch (the corpus
    * is never read), derived components land as this segment's partitions.
    * `seg` is required-distinct per batch; a retry with the same id
    * replaces exactly its own partitions. */
  def append(docs: DataFrame, dir: String, seg: Long): Unit = {
    val p = readMeta(dir)
    // same collapse as minhashNearDupPairs: sha2 of RAW text, one agg
    val grp = docs
      .groupBy(sha2(col("text").cast("binary"), 256).as("tkey"))
      .agg(min("doc_id").as("rep"),
        sort_array(collect_list(col("doc_id"))).as("members"),
        first(col("text")).as("text"))
      .localCheckpoint() // feeds groups-out AND the shingle pass once
    val sh = Dedup.shingles(
        grp.select(col("rep").as("doc_id"), col("text")))
      .localCheckpoint() // feeds has_sh, signatures AND postings
    val hasSh = sh.select(col("doc_id").as("rep")).distinct()
      .withColumn("has_sh", lit(true))
    writeSeg(
      grp.join(hasSh, Seq("rep"), "left")
        .select(col("tkey"), col("rep"), col("members"),
          coalesce(col("has_sh"), lit(false)).as("has_sh")),
      s"$dir/groups", seg, Seq("seg"))
    writeSeg(
      Dedup.bandBuckets(Dedup.minhashSignatures(sh, p.k), p.bands, p.rowsPerBand)
        .select(col("doc_id").as("rep"), col("band"), col("bh"))
        .withColumn("pb", pmod(xxhash64(col("band"), col("bh")), lit(p.buckets))),
      s"$dir/buckets", seg, Seq("pb", "seg"))
    writeSeg(
      sh.select(col("doc_id").as("rep"), col("sh"))
        .withColumn("pb", pmod(xxhash64(col("sh")), lit(p.buckets))),
      s"$dir/postings", seg, Seq("pb", "seg"))
  }

  /** Retry-idempotent per-segment partitioned write with the small-file
    * guard (cluster on the partition columns first, or every upstream
    * partition emits a file into every directory). */
  private def writeSeg(df: DataFrame, root: String, seg: Long,
      partCols: Seq[String]): Unit =
    df.withColumn("seg", lit(seg))
      .repartitionByRange(partCols.map(col): _*)
      .write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy(partCols: _*).parquet(root)

  /** The stored components, remapped to GLOBAL reps. Returns
    * (globalGroups, remap, bucket entries, postings-with-gsz) — shared by
    * [[pairs]] and [[freshPairs]]. */
  private def components(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val g0 = spark.read.parquet(s"$dir/groups")
    // cross-segment collapse: identical text in different batches merges
    // here, on the doc-scale groups table — never on text
    val g = g0.groupBy("tkey").agg(
        min("rep").as("rep"),
        array_sort(flatten(collect_list(col("members")))).as("members"),
        max("has_sh").as("has_sh"))
      .localCheckpoint()
    val remap = g0.select(col("rep").as("seg_rep"), col("tkey")).distinct()
      .join(g.select(col("tkey"), col("rep").as("grep")), "tkey")
      .select(col("seg_rep"), col("grep"))
    val bk = spark.read.parquet(s"$dir/buckets")
      .join(remap, col("rep") === col("seg_rep"))
      .select(col("grep").as("doc_id"), col("band"), col("bh"))
      .distinct() // identical texts across segments collapse to one entry
    val gsz = g.select(col("rep").as("doc_id"), size(col("members")).as("gsz"))
    val posts = spark.read.parquet(s"$dir/postings")
      .join(remap, col("rep") === col("seg_rep"))
      .select(col("sh"), col("grep").as("doc_id"))
      .distinct()
      .join(gsz, "doc_id")
    (g, remap, bk, posts)
  }

  /** ALL near-dup pairs of the indexed corpus, from stored components only
    * — no shingling, no text. Byte-identical to
    * `Dedup.minhashNearDupPairs(union of every appended batch)`
    * (spec-asserted): candidates from stored buckets, exact capped-set
    * Jaccard from stored postings with the member-weighted df cap applied
    * against CURRENT global group sizes, byte-identity pairs from the
    * merged groups. */
  def pairs(spark: SparkSession, dir: String, threshold: Double = 0.8,
      maxDf: Int = Dedup.DefaultMaxDf): DataFrame = {
    val (g, _, bk, posts) = components(spark, dir)
    Dedup.verifiedExpandedPairs(
      Dedup.pairsFromBuckets(bk, maxDf),
      cappedGlobalPostings(posts, maxDf),
      g.select(col("rep"), col("members")),
      g.filter(size(col("members")) >= 2 && col("has_sh")).select(col("members")),
      threshold)
  }

  private def cappedGlobalPostings(posts: DataFrame, maxDf: Int): DataFrame =
    posts.groupBy("sh")
      .agg(collect_list(col("doc_id")).as("docs"), sum(col("gsz")).as("wdf"))
      .filter(col("wdf") <= maxDf)
      .select(col("sh"), col("docs"))
      .localCheckpoint()

  /** Compact every segment into ONE (seg=0): the read-side collapse —
    * cross-segment group merge, rep remap, bucket/posting dedup — runs once
    * and lands as the new physical layout, so subsequent reads skip the
    * remap join and the file count drops from O(segments × pb) to O(pb).
    * Each component directory is replaced via [[graft.AtomicSwap]]
    * (checked renames: a crash leaves that component's old snapshot live or
    * fully intact at `.old`, never half-rewritten). The swap order is
    * groups → buckets → postings, and a crash BETWEEN component swaps still
    * reads exactly the same pairs: compaction changes representation, not
    * content — a segmented component and its compacted form remap to the
    * identical distinct row set, because every per-segment rep of a text
    * wrote the same bucket keys and shingles as the surviving global rep
    * (identical text ⇒ identical signature). Compaction resets the segment
    * clock: live data sits entirely in seg=0, so appends after compact use
    * fresh seg ≥ 1 and `freshPairs(sinceSeg = 0)` sees exactly the
    * post-compact arrivals. Single-maintainer contract, like
    * `InvertedIndex.compact`. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val p = readMeta(dir)
    val (g, _, bk, posts) = components(spark, dir)
    // materialize ALL THREE rewrites before any swap — the lazy reads
    // behind bk/posts still point at the live directories
    val tmpRoot = dir + ".compacting"
    writeSeg(g.select("tkey", "rep", "members", "has_sh"),
      s"$tmpRoot/groups", 0L, Seq("seg"))
    writeSeg(
      bk.select(col("doc_id").as("rep"), col("band"), col("bh"))
        .withColumn("pb", pmod(xxhash64(col("band"), col("bh")), lit(p.buckets))),
      s"$tmpRoot/buckets", 0L, Seq("pb", "seg"))
    writeSeg(
      posts.select(col("doc_id").as("rep"), col("sh"))
        .withColumn("pb", pmod(xxhash64(col("sh")), lit(p.buckets))),
      s"$tmpRoot/postings", 0L, Seq("pb", "seg"))
    val conf = spark.sparkContext.hadoopConfiguration
    for (c <- Seq("groups", "buckets", "postings"))
      graft.AtomicSwap.replace(conf, s"$dir/$c", s"$tmpRoot/$c", "minhash-compact")
    val (fs, _) = hadoopFs(dir)
    fs.delete(new org.apache.hadoop.fs.Path(tmpRoot), true)
  }

  /** The steady-state incremental question: pairs INVOLVING docs that
    * arrived after `sinceSeg` — candidate generation probes only buckets
    * containing a batch-touched group (the "new batch probes existing
    * buckets" shape), verification reuses the same stored postings, and
    * the result equals `pairs(...)` filtered to fresh-doc membership
    * (spec-asserted). */
  def freshPairs(spark: SparkSession, dir: String, sinceSeg: Long,
      threshold: Double = 0.8, maxDf: Int = Dedup.DefaultMaxDf): DataFrame = {
    val g0 = spark.read.parquet(s"$dir/groups")
    val (g, remap, _, posts) = components(spark, dir)
    // groups the fresh segments touched (new texts AND new members of old
    // texts), as global reps
    val freshTkeys = g0.filter(col("seg") > sinceSeg).select("tkey").distinct()
    val freshDocs = g0.filter(col("seg") > sinceSeg)
      .select(explode(col("members")).as("d")).distinct()
      .localCheckpoint()
    // The fresh segments' OWN bucket partitions (seg > sinceSeg — pruned at
    // the directory level) contain every batch-touched bucket key: a new
    // text writes its keys under its seg-rep, and an identical re-arrival
    // rewrites the SAME keys (identical text => identical signature). So
    // the candidate read narrows physically BEFORE any join: first to the
    // fresh keys' pb partitions (partition IN-filter), then to the keys
    // themselves — the index grows, the probe reads only the batch's
    // neighborhoods.
    val freshKeys = spark.read.parquet(s"$dir/buckets")
      .filter(col("seg") > sinceSeg)
      .select("band", "bh", "pb").distinct()
      .localCheckpoint() // tiny: the batch's bucket keys
    val freshPbs = freshKeys.select("pb").distinct().collect()
      .map(_.getAs[Number](0).longValue)
    val bkPruned = spark.read.parquet(s"$dir/buckets")
      .filter(col("pb").isin(freshPbs.map(Long.box).toIndexedSeq: _*))
      .join(freshKeys.select("band", "bh"), Seq("band", "bh"), "left_semi")
      .join(remap, col("rep") === col("seg_rep"))
      .select(col("grep").as("doc_id"), col("band"), col("bh"))
      .distinct()
    val cand = Dedup.pairsFromBuckets(bkPruned, maxDf)
    val all = Dedup.verifiedExpandedPairs(
      cand,
      cappedGlobalPostings(posts, maxDf),
      g.select(col("rep"), col("members")),
      g.filter(size(col("members")) >= 2 && col("has_sh"))
        .join(freshTkeys, Seq("tkey"), "left_semi").select(col("members")),
      threshold)
    // a fresh bucket can still pair two OLD docs — keep fresh-involving only
    all.join(freshDocs.select(col("d").as("da")), Seq("da"), "left_semi")
      .unionByName(
        all.join(freshDocs.select(col("d").as("db")), Seq("db"), "left_semi")
          .select("da", "db", "jaccard"))
      .distinct()
  }
}
