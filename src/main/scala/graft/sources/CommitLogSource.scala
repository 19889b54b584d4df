package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructType}

/** The connector surface for [[CommitLog]] tables (VERDICT r11 #1/#3) —
  * the same packaging the graft.index / graft.ivf sources already have, so
  * a commit-log table reads like any Spark table instead of through
  * library calls:
  *
  * {{{
  * spark.read.format("graft.commitlog")
  *   .option("root", "/tables/orders")      // or .load("/tables/orders")
  *   .load()                                 // newest committed snapshot
  *   .filter($"bucket" === 2)                // prunes dirs via commit stats
  *
  * spark.read.format("graft.commitlog").option("versionAsOf", "2")
  *   .load("/tables/orders")                 // time travel
  *
  * spark.read.format("graft.commitlog").option("changesSince", "1")
  *   .load("/tables/orders")                 // CDF: typed change rows
  *
  * spark.readStream.format("graft.commitlog")
  *   .option("maxCommitsPerTrigger", "1")    // admission control
  *   .load("/tables/orders")                 // micro-batch append tail
  * }}}
  *
  * Architecture (the published Delta pattern, not a new read engine):
  * snapshot and time-travel reads return a [[HadoopFsRelation]] whose
  * [[CommitLogFileIndex]] lists exactly the commit's immutable data
  * directories — Spark's OWN vectorized parquet reader, predicate
  * pushdown, and column pruning all apply unchanged, and the FileIndex
  * prunes whole DIRECTORIES at planning from the pushed data filters
  * through the SAME decisions the library route uses
  * ([[CommitLog.statsKeepDirs]] for recorded min/max ranges,
  * [[CommitLog.bloomKeepDirs]] for sidecar point probes) — the two routes
  * cannot prune differently. The change-feed read delegates to
  * [[CommitLog.changesSince]] (whose inner reads are the same vectorized
  * parquet scans) behind a [[TableScan]]; the one extra cost is the
  * row-conversion boundary, proportional to the DELTA's size — the feed is
  * delta-sized by construction, never table-sized.
  *
  * The streaming read is a V1 [[Source]] with admission control — the
  * FileStreamSource shape: offsets are COMMIT VERSIONS (the log's own
  * unit). A fresh stream BOOTSTRAPS from the head snapshot (first batch =
  * the table's state, whatever shapes built it), then delivers the rows
  * row-visible commits append, as ordinary schema-pinned parquet reads;
  * rowInvisible compactions ride through silently, and a rewrite/merge in
  * an incremental window fails loudly (a tail delivers appends;
  * retractions need a resync — the same contract as
  * [[CommitLog.appendedSince]]). `option("startingVersion", v)` opts into
  * append replay from a retained version instead of the bootstrap.
  * Exactly-once end-to-end comes from the engine's offset checkpoint plus
  * [[CommitLog.commitAppendOnce]] on the sink side.
  *
  * At 100 TB: planning cost is O(head's directory count) listing + the
  * pruned dirs' footers; a stats/bloom-pruned probe reads O(matching dirs);
  * a streaming micro-batch reads O(new commits' rows). Nothing here scans
  * history to answer a head read.
  */
final class CommitLogSource extends DataSourceRegister
    with RelationProvider with StreamSourceProvider {
  import CommitLogSource._

  override def shortName(): String = "graft.commitlog"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    val changesSince = parameters.get("changesSince").map(_.toLong)
    require(versionAsOf.isEmpty || changesSince.isEmpty,
      "graft.commitlog takes versionAsOf OR changesSince, not both")
    changesSince match {
      case Some(since) =>
        val head = CommitLog.latest(spark, root).getOrElse(
          throw new IllegalArgumentException(
            s"graft.commitlog: no commits at $root"))
        val df =
          if (head.version <= since)
            // already at (or past) the head: an EMPTY feed, so schedulable
            // consumers poll without special-casing the caught-up state
            CommitLog.readCommit(spark, root, head).limit(0)
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(head.version))
          else CommitLog.changesSince(spark, root, since, head).getOrElse(
            throw new IllegalArgumentException(
              s"graft.commitlog: changes since v$since at $root are not " +
                "incrementally readable (rewrite/purge intervened, or the " +
                "base version was vacuumed) — resync from a snapshot read"))
        new CommitLogChangesRelation(sqlContext, df)
      case None =>
        val commit = versionAsOf match {
          case Some(v) => CommitLog.commitAt(spark, root, v).getOrElse(
            throw new IllegalArgumentException(
              s"graft.commitlog: version $v at $root was vacuumed or never " +
                "committed"))
          case None => CommitLog.latest(spark, root).getOrElse(
            throw new IllegalArgumentException(
              s"graft.commitlog: no commits at $root"))
        }
        snapshotRelation(spark, root, commit, parameters)
    }
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val s = schema.orElse(
      CommitLog.readLatest(sqlContext.sparkSession, root).map(_.schema))
      .getOrElse(throw new IllegalArgumentException(
        s"graft.commitlog stream: $root has no commits yet and no schema " +
          "was given — pass .schema(...) to tail a not-yet-created table"))
    (s"graft.commitlog($root)", s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    // default (no startingVersion): BOOTSTRAP — first batch is the head
    // SNAPSHOT, then incremental appends (the runCommitLogTail contract;
    // code review r12: replaying history from v1 permanently fails on any
    // table whose retained history holds a merge/rewrite or whose early
    // versions were vacuumed — i.e. most real tables). An explicit
    // startingVersion opts into append REPLAY from that version, for
    // consumers that want the retained history as insert batches.
    val startingVersion = parameters.get("startingVersion").map(_.toLong)
    val maxCommits = parameters.get("maxCommitsPerTrigger").map(_.toInt)
    maxCommits.foreach(n => require(n >= 1,
      s"maxCommitsPerTrigger must be >= 1, got $n"))
    new CommitLogStreamSource(sqlContext.sparkSession, root,
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      startingVersion, maxCommits)
  }
}

object CommitLogSource {
  private def rootOf(parameters: Map[String, String]): String =
    parameters.get("root").orElse(parameters.get("path"))
      .orElse(parameters.get("location"))
      .getOrElse(throw new IllegalArgumentException(
        "graft.commitlog requires .option(\"root\", <table root>) or " +
          "load(<table root>)"))

  /** The snapshot read plan for one committed version: Spark's own parquet
    * relation over a [[CommitLogFileIndex]]. Shared by the options route
    * and [[GraftCatalog]]. */
  private[sources] def snapshotRelation(spark: SparkSession, root: String,
      commit: CommitLog.Commit,
      options: Map[String, String]): HadoopFsRelation = {
    val schema = CommitLog.readCommit(spark, root, commit).schema
    HadoopFsRelation(new CommitLogFileIndex(spark, root, commit),
      partitionSchema = StructType(Nil), dataSchema = schema,
      bucketSpec = None, fileFormat = new ParquetFileFormat,
      options = options)(spark)
  }
}

/** [[FileIndex]] over one committed version's immutable data directories.
  *
  * `listFiles` is where the commit log's metadata meets Catalyst: the
  * pushed data filters are inspected for simple shapes on the table's
  * RECORDED stats column (a conjunction of =, <, <=, >, >=, IN narrows to
  * one [lo, hi] range) and RECORDED bloom column (=/IN literal sets), and
  * whole directories are dropped through the library's own
  * [[CommitLog.statsKeepDirs]] / [[CommitLog.bloomKeepDirs]] planning —
  * `requireRecorded`/`requireMarker` = true, because here the constraint is
  * DERIVED rather than caller-asserted, so a commit that never recorded
  * evidence for the column is never pruned on it. Unrecognized filter
  * shapes contribute nothing (conservative: scan). Row-level correctness
  * never depends on any of this — Spark re-applies every filter after the
  * scan, the same two-layer contract as [[CommitLog.readLatestWhere]].
  *
  * Listing happens ONCE per relation (directories are immutable until
  * vacuum, and a vacuum old enough to race a running query would be a
  * retention misconfiguration by the same contract the library route
  * documents); `refresh()` is therefore a no-op — time travel and
  * snapshot isolation come from the pinned [[CommitLog.Commit]]. */
private[graft] final class CommitLogFileIndex(spark: SparkSession,
    root: String, commit: CommitLog.Commit) extends FileIndex {

  private val fsys =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // dir name -> its parquet files, listed once (immutable once committed).
  // A MISSING directory fails loudly (code review r12): the commit lists
  // it, so absence means a vacuum outran this query's snapshot (or
  // external damage) — the library route's spark.read.parquet throws for
  // the same state, and a silent empty would return partial rows (worst
  // of all in a streaming batch, which must be exact or absent).
  private lazy val byDir: Seq[(String, Array[FileStatus])] =
    commit.dataDirs.map { d =>
      val p = new HPath(root, d)
      if (!fsys.exists(p)) throw new IllegalStateException(
        s"graft.commitlog: data directory $p of version ${commit.version} " +
          "is missing — vacuumed past this read's snapshot (raise retention " +
          "or re-resolve the head) or externally damaged")
      d -> fsys.listStatus(p)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }

  override def rootPaths: Seq[HPath] =
    commit.dataDirs.map(d => new HPath(root, d))
  override def partitionSchema: StructType = StructType(Nil)
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = byDir.iterator.flatMap(_._2).map(_.getLen).sum
  override def inputFiles: Array[String] =
    byDir.flatMap(_._2).map(_.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep = prunedDirs(dataFilters).toSet
    Seq(PartitionDirectory(InternalRow.empty,
      byDir.filter(kv => keep(kv._1)).flatMap(_._2).toArray))
  }

  /** The directories a scan constrained by `dataFilters` must read —
    * exposed for the pruning spec (the connector twin of CommitLogSpec's
    * inputFiles proofs). */
  private[graft] def prunedDirs(dataFilters: Seq[Expression]): Seq[String] = {
    // ---- min/max stats: narrow a [lo, hi] range on the stats column ----
    val statsKept: Seq[String] = commit.statsColName match {
      case Some(sc) =>
        var lo = Long.MinValue
        var hi = Long.MaxValue
        var any = false
        def narrowLo(v: Long): Unit = { lo = math.max(lo, v); any = true }
        def narrowHi(v: Long): Unit = { hi = math.min(hi, v); any = true }
        dataFilters.foreach {
          case EqualTo(a: Attribute, l: Literal) if a.name == sc =>
            litLong(l).foreach { v => narrowLo(v); narrowHi(v) }
          case EqualTo(l: Literal, a: Attribute) if a.name == sc =>
            litLong(l).foreach { v => narrowLo(v); narrowHi(v) }
          // strict bounds kept LOOSE (>v treated as >=v): pruning may only
          // ever be conservative, and dir stats are inclusive ranges
          case GreaterThan(a: Attribute, l: Literal) if a.name == sc =>
            litLong(l).foreach(narrowLo)
          case GreaterThanOrEqual(a: Attribute, l: Literal) if a.name == sc =>
            litLong(l).foreach(narrowLo)
          case LessThan(a: Attribute, l: Literal) if a.name == sc =>
            litLong(l).foreach(narrowHi)
          case LessThanOrEqual(a: Attribute, l: Literal) if a.name == sc =>
            litLong(l).foreach(narrowHi)
          case GreaterThan(l: Literal, a: Attribute) if a.name == sc =>
            litLong(l).foreach(narrowHi) // lit > col  ==  col < lit
          case GreaterThanOrEqual(l: Literal, a: Attribute) if a.name == sc =>
            litLong(l).foreach(narrowHi)
          case LessThan(l: Literal, a: Attribute) if a.name == sc =>
            litLong(l).foreach(narrowLo) // lit < col  ==  col > lit
          case LessThanOrEqual(l: Literal, a: Attribute) if a.name == sc =>
            litLong(l).foreach(narrowLo)
          case In(a: Attribute, elems) if a.name == sc &&
              elems.forall(e => e.isInstanceOf[Literal] &&
                litLong(e.asInstanceOf[Literal]).isDefined) =>
            val vs = elems.map(e => litLong(e.asInstanceOf[Literal]).get)
            narrowLo(vs.min); narrowHi(vs.max)
          case _ => () // unrecognized shape: contributes no narrowing
        }
        if (any)
          CommitLog.statsKeepDirs(commit, sc, lo, hi, requireRecorded = true)
        else commit.dataDirs
      case None => commit.dataDirs
    }
    // ---- bloom sidecars: point-probe an equality/IN literal set ----
    // Per-conjunct soundness: a value set is used only when it is COMPLETE
    // for its conjunct (every row satisfying the conjunct has its column
    // value in the set), so a dir whose sidecar rejects every probed value
    // provably holds no qualifying row. The union across such conjuncts
    // only widens the probe — conservative.
    val bloomVals: Seq[Any] = CommitLog.bloomColumn(spark, root) match {
      case Some(bc) =>
        dataFilters.flatMap {
          case EqualTo(a: Attribute, Literal(v, dt)) if a.name == bc =>
            bloomValue(v, dt).toSeq
          case EqualTo(Literal(v, dt), a: Attribute) if a.name == bc =>
            bloomValue(v, dt).toSeq
          case In(a: Attribute, elems) if a.name == bc &&
              elems.forall(_.isInstanceOf[Literal]) =>
            val vs = elems.map { case Literal(v, dt) => bloomValue(v, dt) }
            if (vs.nonEmpty && vs.forall(_.isDefined)) vs.flatten
            else Nil // any unconvertible element: set incomplete, unusable
          case _ => Nil
        }
      case None => Nil
    }
    if (bloomVals.isEmpty) statsKept
    else {
      val bloomKept = CommitLog.bloomKeepDirs(spark, root, commit,
        CommitLog.bloomColumn(spark, root).get, bloomVals,
        requireMarker = true).toSet
      statsKept.filter(bloomKept)
    }
  }

  /** A literal's long value, when its type makes the cast exact and the
    * value is non-null — anything else disables stats narrowing for its
    * conjunct (conservative). */
  private def litLong(l: Literal): Option[Long] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType => Some(l.value.asInstanceOf[Byte].toLong)
      case ShortType => Some(l.value.asInstanceOf[Short].toLong)
      case IntegerType => Some(l.value.asInstanceOf[Int].toLong)
      case LongType => Some(l.value.asInstanceOf[Long])
      case _ => None
    }

  /** A literal rendered as the JVM value [[CommitLog.addBloom]]'s sidecars
    * were built from (integrals put as longs, strings as strings), or None
    * when the type has no sidecar representation — that conjunct then
    * cannot prune. */
  private def bloomValue(v: Any, dt: DataType): Option[Any] =
    if (v == null) None
    else dt match {
      case StringType => Some(v.toString) // UTF8String -> String
      case ByteType => Some(java.lang.Long.valueOf(v.asInstanceOf[Byte].toLong))
      case ShortType => Some(java.lang.Long.valueOf(v.asInstanceOf[Short].toLong))
      case IntegerType => Some(java.lang.Long.valueOf(v.asInstanceOf[Int].toLong))
      case LongType => Some(java.lang.Long.valueOf(v.asInstanceOf[Long]))
      case BinaryType => Some(v.asInstanceOf[Array[Byte]])
      case _ => None
    }
}

/** Catalog face of a commit-log table ([[GraftCatalog]] provider
  * `graft.commitlog`): `spark.table("graft.my_table")` plans a DSv2
  * parquet read (vectorized, filter/column pushdown) over the NEWEST
  * commit's immutable directory list, resolved per query — snapshot
  * isolation by construction. Read-only by design: the table advertises no
  * write capability, because a write that bypassed the commit protocol
  * would corrupt the log (writes go through [[CommitLog.commit]]/
  * [[CommitLog.commitAppend]]/[[CommitLog.merge]]). Time travel, the
  * change feed, dir-pruned range/point reads, and streaming tails use the
  * `graft.commitlog` format options route. */
private[sources] final class CommitLogCatalogTable(root: String)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.util.CaseInsensitiveStringMap

  private def spark = SparkSession.active
  private val commit = CommitLog.latest(spark, root).getOrElse(
    throw new IllegalArgumentException(
      s"graft.commitlog: no commits at $root"))
  private val inner =
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      s"graft.commitlog($root)", spark, CaseInsensitiveStringMap.empty(),
      commit.dataDirs.map(d => s"$root/$d"),
      commit.schemaDDL.map(StructType.fromDDL), classOf[ParquetFileFormat])

  override def name(): String = s"graft.commitlog($root)"
  override def schema(): StructType = inner.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    inner.newScanBuilder(options)
}

/** The change feed as a V1 [[TableScan]]: the rows come from
  * [[CommitLog.changesSince]]'s plan (vectorized parquet scans + literal
  * stamps under the hood); the relation boundary converts rows once, a
  * cost proportional to the DELTA being consumed — the feed is delta-sized
  * by construction, so the boundary never sees table-sized data. */
private[sources] final class CommitLogChangesRelation(
    override val sqlContext: SQLContext, df: DataFrame)
    extends BaseRelation with TableScan {
  override val schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}

/** Micro-batch tail of a commit-log table — the FileStreamSource shape
  * over the log's own ingest unit: offsets are COMMIT VERSIONS. Default
  * (BOOTSTRAP) mode delivers the head SNAPSHOT as the first batch and
  * appends incrementally after — the [[graft.streaming.StreamOps
  * .runCommitLogTail]] contract, and the only mode that works on tables
  * whose retained history holds merges/rewrites or vacuumed early
  * versions; `startingVersion` opts into append REPLAY, where each batch
  * is the schema-pinned parquet read of the directories row-visible
  * commits in `(start, end]` added. Admission control
  * (`maxCommitsPerTrigger`) bounds catch-up batches exactly like the file
  * source's `maxFilesPerTrigger` (the bootstrap snapshot is ONE
  * indivisible batch — it is a state, not a commit range);
  * Trigger.AvailableNow captures the head at query start and drains to
  * it. Compactions (rowInvisible) deliver nothing and advance silently;
  * a rewrite/merge in an INCREMENTAL window throws — a tail delivers
  * appends, retractions require a downstream resync, the
  * [[CommitLog.appendedSince]] contract. Delivery is exactly-once from
  * the engine's offset checkpoint: `getBatch` is a pure function of the
  * immutable log range. */
private[sources] final class CommitLogStreamSource(spark: SparkSession,
    root: String, tableSchema: StructType, startingVersion: Option[Long],
    maxCommitsPerTrigger: Option[Int]) extends Source
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // replay floor (explicit startingVersion) or the bootstrap sentinel 0 —
  // in bootstrap mode offset 0 always means "nothing delivered yet", and
  // the first real batch is the snapshot at its end offset's version
  private val floor: Long = startingVersion.getOrElse(0L)
  private val bootstrap: Boolean = startingVersion.isEmpty

  // newest version already offered as an end offset — latestOffset must be
  // monotone even if the head pointer briefly reads stale across calls
  @volatile private var lastOffered: Long = floor
  @volatile private var availableNowEnd: Option[Long] = None

  override def schema: StructType = tableSchema

  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead " +
        "(admission-control source)")

  override def initialOffset(): OffsetV2 = LongOffset(floor)
  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxCommitsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(CommitLog.latest(spark, root)
      .map(_.version).getOrElse(floor))

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = math.max(lastOffered,
      Option(startOffset).map(versionOf).getOrElse(floor))
    val head = CommitLog.latest(spark, root).map(_.version).getOrElse(start)
    val capped = availableNowEnd.fold(head)(math.min(head, _))
    val end = limit match {
      // version numbers are dense in retained history, so admitting n
      // commits is exactly advancing the offset by n. The bootstrap
      // snapshot ignores the cap: it is one indivisible state, not a
      // backlog of commits to drain.
      case m: ReadMaxFiles if !(bootstrap && start == 0L) =>
        math.min(capped, start + m.maxFiles())
      case _ => capped
    }
    lastOffered = math.max(lastOffered, end)
    LongOffset(math.max(start, end))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = start.map(versionOf).getOrElse(floor)
    val e = versionOf(end)
    val dirs =
      if (e <= s) Nil
      else if (bootstrap && s == 0L)
        // first delivery: the version-e SNAPSHOT (whatever shapes built
        // it — merges, rewrites, compactions all fine: a snapshot is read
        // as a state, not replayed as changes)
        CommitLog.commitAt(spark, root, e).getOrElse(
          throw new IllegalStateException(
            s"commit-log stream: bootstrap version $e at $root was " +
              "vacuumed between offset resolution and the batch read — " +
              "raise retention")).dataDirs
      else CommitLog.addedDirsBetween(spark, root, s, e)
    // the FileStreamSource shape: a parquet HadoopFsRelation over exactly
    // the batch's files, wrapped isStreaming=true (the engine asserts it).
    // Schema pinned at query start: an additive evolution mid-stream keeps
    // delivering (new columns are clipped until restart; missing columns
    // in pre-evolution dirs read as typed NULLs). Empty range (only
    // compactions landed): same relation over zero dirs — an empty batch.
    val batchCommit = CommitLog.Commit(e, dirs, "stream", "batch")
    val rel = HadoopFsRelation(
      new CommitLogFileIndex(spark, root, batchCommit),
      partitionSchema = StructType(Nil), dataSchema = tableSchema,
      bucketSpec = None, fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(spark)
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        rel, isStreaming = true))
  }

  private def versionOf(o: Any): Long = o match {
    case l: LongOffset => l.offset
    case other: OffsetV2 => other.json().trim.toLong
    case other: OffsetV1 => other.json().trim.toLong
  }

  override def commit(end: OffsetV1): Unit = () // progress is the checkpoint
  override def stop(): Unit = ()
}
