package graft.sources.v2

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.{IntBlockCodec, StringBlockCodec}
import graft.jobs.DecodeJob
import graft.sources.SnapshotStore

/**
 * DataSource V2 read provider for the snapshot store — the decoded page view as a
 * plain Spark table: `spark.read.format("graft").load(root)` (and therefore SQL
 * over a registered view) instead of the bespoke [[graft.jobs.DecodeJob]] API.
 * The reference's entire user surface is one CLI (util/golomb.cpp:253-255); this
 * engine's is one `SELECT`.
 *
 * What pushes down:
 *  - **Required columns** ([[SupportsPushDownRequiredColumns]]): only the
 *    requested page columns' blocks are read — the `column` In-filter reaches
 *    parquet row-group statistics, so text/html blocks are skipped before any IO
 *    when only `url, lang` are selected. An EMPTY projection (`count(*)`)
 *    reads only the `n` metadata field of one reference column — no `encoded`
 *    bytes at all.
 *  - **Filters** ([[SupportsPushDownFilters]]): EqualTo/In/StringStartsWith on
 *    string columns and =/</<=/>/>= on `warc_ts` map onto the block-metadata
 *    predicates of [[DecodeJob]] (block_str_min/max/dict, block_min/max), pruning
 *    whole 64Ki-row block groups BEFORE decompression — the north-star
 *    "predicate-push onto dictionary and FoR metadata". Pruning is block-level
 *    (inexact), so every filter is also returned as a residual for Spark to
 *    evaluate on the decoded rows: results are exact regardless of metadata.
 *
 * Planning runs on the driver (Iceberg-style): one manifest read pins the
 *  snapshot, a metadata-only Spark scan sizes the surviving group-key set, and
 *  the selectivity gate of [[DecodeJob.planPrunedKeys]] drops pruning entirely
 *  when the predicate is not selective — no unbounded driver collect. Each
 *  [[InputPartition]] is one block parquet file; groups never straddle files
 *  (each encode task writes its groups whole), so the reader assembles
 *  consecutive records with zero shuffle — the same layout invariant as
 *  [[DecodeJob.hybridReassemble]], with file granularity making split repair
 *  unnecessary by construction.
 */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // an existing store is self-describing via its SCHEMA sidecar; anything
    // else (new store about to be path-created) defaults to the webtext schema
    val root = options.get("path")
    if (root != null && root.nonEmpty) GraftDataSource.storeSchema(root)
    else GraftDataSource.PageSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val root = properties.get("path")
    require(root != null && root.nonEmpty,
      "graft table requires a store path: spark.read.format(\"graft\").load(root)")
    new GraftTable(root)
  }
}

object GraftDataSource {
  /** The decoded page view (input_hint schema: BASELINE.json:15) — the DEFAULT
    * store schema, used by every store without a persisted SCHEMA sidecar. */
  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  // -------- generalized store schemas (SCHEMA sidecar) --------
  // The codec family covers strings (dict/RLE/FSST), opaque binary, and the
  // full integer family (timestamps ride as epoch micros). A store created
  // through the catalog persists its schema as a sidecar; stores without one
  // (every pre-r6 store, and path-created webtext stores) read as PageSchema.

  /** Column types the encode kernel's per-column dispatch covers. */
  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | TimestampType |
         LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  def validateSchema(schema: StructType): Unit = {
    require(schema.nonEmpty, "graft table schema must have at least one column")
    val bad = schema.fields.filterNot(f => supportedType(f.dataType))
    require(bad.isEmpty,
      s"unsupported graft column types: ${bad.map(f => s"${f.name} ${f.dataType.simpleString}")
        .mkString(", ")} — supported: string, binary, timestamp, bigint, int, smallint, tinyint")
    val lower = schema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT))
    require(lower.distinct.length == schema.length,
      s"duplicate column names in ${schema.simpleString}")
    require(!lower.contains("_part_id"),
      "_part_id is the reserved group-identity metadata column")
  }

  /** The store's physical sort/range-layout key: the FIRST string column
    * (range bucketing + prefix pruning ride string bounds), else the first
    * column (ordered-distribution writes still give tight int bounds). */
  def sortKeyOf(schema: StructType): StructField =
    schema.fields.find(_.dataType == StringType).getOrElse(schema.fields.head)

  def persistedSchema(root: String): Option[StructType] = {
    val p = java.nio.file.Paths.get(root, "SCHEMA")
    if (!java.nio.file.Files.exists(p)) None
    else Some(DataType.fromJson(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType])
  }

  def writeSchemaSidecar(root: String, schema: StructType): Unit =
    SnapshotStore.writeSidecar(root, "SCHEMA", schema.json)

  /** The schema a store decodes as (sidecar, else the webtext default). */
  def storeSchema(root: String): StructType =
    persistedSchema(root).getOrElse(PageSchema)

  /** A pushed `ORDER BY url|warc_ts` top-n (see [[GraftScanBuilder.pushTopN]]). */
  final case class TopN(column: String, asc: Boolean, nullsFirst: Boolean, limit: Int) {
    override def toString: String =
      s"$column ${if (asc) "ASC" else "DESC"} ${if (nullsFirst) "NULLS FIRST" else "NULLS LAST"} LIMIT $limit"
  }

  /** Last scan's planning decisions (driver-side, for tests/ops visibility). */
  final case class PlanStats(partitions: Int, files: Int, predicates: Int,
      prunedGroupKeys: Option[Int], pushedLimit: Option[Int] = None,
      pushedTopN: Option[TopN] = None)

  /** Single-query convenience only — concurrent V2 scans clobber it (use
    * [[planStatsFor]] whenever more than one graft scan can be in flight). */
  @volatile var lastPlanStats: Option[PlanStats] = None

  /** Per-root plan stats, bounded LRU (mirrors `Dedup.capReports`): concurrent
    * scans over DIFFERENT stores no longer race each other's assertions; two
    * concurrent scans of the SAME root last-write-win, which is inherent to a
    * per-root key and fine for the gating/ops use. */
  private val planStatsByRoot =
    new java.util.LinkedHashMap[String, PlanStats](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, PlanStats]): Boolean = size > 64
    }

  private[v2] def recordPlanStats(root: String, s: PlanStats): Unit = {
    lastPlanStats = Some(s)
    planStatsByRoot.synchronized { planStatsByRoot.put(root, s); () }
  }

  /** Planning stats of the most recent scan over `root`. */
  def planStatsFor(root: String): Option[PlanStats] =
    planStatsByRoot.synchronized(Option(planStatsByRoot.get(root)))

  /** Store-identity token: the SNAPSHOT pointer file's (inode fileKey, mtime)
    * folded into one long. A store dropped and recreated at the same path
    * restarts snapshot ids at 1, so (root, id) alone could serve a PREVIOUS
    * store's cached plan — every commit rewrites the pointer via a fresh tmp
    * file + ATOMIC_MOVE, which allocates a NEW inode, so the fileKey changes
    * per commit even when the kernel's coarse mtime clock has not ticked
    * (mtime alone was review-flagged: ns UNITS are not ns RESOLUTION).
    * -1 = no pointer — callers must BYPASS their memo for it, never cache. */
  private[graft] def storeIdentityToken(root: String): Long =
    try {
      val p = graft.sources.SnapshotStore.snapshotPointer(root)
      val attrs = java.nio.file.Files.readAttributes(p,
        classOf[java.nio.file.attribute.BasicFileAttributes])
      val mtime = attrs.lastModifiedTime.to(java.util.concurrent.TimeUnit.NANOSECONDS)
      val fk = attrs.fileKey()
      val token = mtime * 1000003L ^ (if (fk == null) 0L else fk.hashCode().toLong << 21)
      if (token == -1L) -2L else token // keep -1 reserved for "no pointer"
    } catch { case _: java.io.IOException => -1L }

  /** Snapshot-immutable key-plan memo (r7): the pruned/top-n group-key
    * computation ([[DecodeJob.planPrunedKeys]] / [[DecodeJob.planTopNKeys]])
    * is a pure function of (store snapshot, predicates, top-n), yet each new
    * scan re-ran its metadata Spark job (a per-invocation planning cost on
    * every selective or top-n query). Keyed by (root, identity token,
    * snapshot/incremental scope, predicates, top-n); bounded LRU. The
    * per-scan broadcast lifecycle is unchanged — only the driver-side key
    * ARRAY is shared. */
  private val keyPlanMemo =
    new java.util.LinkedHashMap[AnyRef, Option[Array[(Int, Int)]]](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Option[Array[(Int, Int)]]]): Boolean = size > 256
    }

  private[v2] def memoizedKeyPlan(key: AnyRef)(
      compute: => Option[Array[(Int, Int)]]): Option[Array[(Int, Int)]] = {
    keyPlanMemo.synchronized { if (keyPlanMemo.containsKey(key)) return keyPlanMemo.get(key) }
    val computed = compute // outside the lock: the metadata scan is a Spark job
    keyPlanMemo.synchronized { keyPlanMemo.put(key, computed); () }
    computed
  }

  /** Per-task parquet In-filter value budget: row-group stats evaluation of an
    * In probes the value set per row group, so a huge set costs more than the
    * IO it saves; past the budget only the part_id component is pushed (still
    * row-group pruning on dead parts) and the reader's exact `liveGroup` check
    * keeps results identical. `private[v2]` var so tests can force the
    * over-budget branch without a 65k-group fixture. */
  private[v2] var InFilterMaxKeys = 65536

  /**
   * Bin-pack the data files of `entries` into [[GraftInputPartition]]s using
   * Spark's own file-partition formula (maxSplitBytes/openCost/minPartitionNum
   * — one task per file measured 3× slower on many-file stores). Bins stay
   * within one dir, whose sorted live part ids gate the reader exactly.
   * Shared by the batch [[GraftScan]] and the [[GraftMicroBatchStream]] (which
   * passes only the parts NEW in its offset range). Returns (partitions,
   * total file count).
   */
  private[v2] def packPartitions(spark: SparkSession, root: String,
      entries: Seq[SnapshotStore.PartEntry], readSchema: StructType,
      refColumn: String,
      keyParts: Option[Set[Int]],
      keysBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
      columnar: Boolean, limit: Int): (Array[InputPartition], Int) = {
    val liveByDir: Map[String, Array[Int]] = entries.groupBy(_.dataDir)
      .map { case (d, es) => d -> es.map(_.partId).sorted.toArray }
    // manifest-level file pruning: skip whole data dirs owning no surviving part
    val dirs = entries.map(_.dataDir).distinct
      .filter(d => keyParts.forall(kp => liveByDir(d).exists(kp)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val sqlConf = spark.sessionState.conf
    val maxBytes = sqlConf.filesMaxPartitionBytes
    val openCost = sqlConf.filesOpenCostInBytes
    // PARALLEL dir listing: a long-streamed store holds one data dir per
    // epoch; serial listStatus (one RPC per dir) would put minutes of
    // driver-side planning in front of a scan over thousands of epochs on
    // object storage. Bounded pool; listing order is restored by the map.
    val allFiles: Seq[(String, Array[(String, Long)])] = {
      def list(d: String): Array[(String, Long)] = {
        val dirPath = new Path(new Path(root), d)
        val fs = dirPath.getFileSystem(conf.value)
        fs.listStatus(dirPath)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
          .map(st => (st.getPath.toString, st.getLen))
      }
      if (dirs.size <= 1) dirs.map(d => d -> list(d))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(dirs.size, 16))
        try {
          val futs = dirs.map(d => d -> pool.submit(
            new java.util.concurrent.Callable[Array[(String, Long)]] {
              def call(): Array[(String, Long)] = list(d)
            }))
          futs.map { case (d, f) => d -> f.get() }
        } finally pool.shutdown()
      }
    }
    val totalBytes = allFiles.iterator.flatMap(_._2).map(_._2 + openCost).sum
    val minPartitionNum = sqlConf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val bytesPerCore = totalBytes / math.max(minPartitionNum, 1)
    val target = math.min(maxBytes, math.max(openCost, bytesPerCore))
    val partitions = allFiles.flatMap { case (d, files) =>
      val bins = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[String]]()
      var bin = scala.collection.mutable.ArrayBuffer[String]()
      var binBytes = 0L
      files.sortBy(-_._2).foreach { case (path, len) =>
        if (binBytes > 0 && binBytes + len + openCost > target) {
          bins += bin; bin = scala.collection.mutable.ArrayBuffer[String](); binBytes = 0L
        }
        bin += path; binBytes += len + openCost
      }
      if (bin.nonEmpty) bins += bin
      bins.map(b => GraftInputPartition(b.toArray, readSchema, refColumn,
        liveByDir(d), keysBc, conf, columnar, limit): InputPartition)
    }.toArray
    (partitions, allFiles.iterator.map(_._2.length).sum)
  }

  /** Aggregates answerable from store metadata alone (see [[GraftAggScan]]). */
  /** See [[GraftTable.metadataColumns]]. */
  object PartIdMetadataColumn extends org.apache.spark.sql.connector.catalog.MetadataColumn {
    override def name(): String = "_part_id"
    override def dataType(): org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.IntegerType
    override def isNullable: Boolean = false
    override def comment(): String =
      "id of the store part (work unit) holding the row; constant per block group"
  }

  /** The one bare column a connector expression references, or None. Shared
    * by pushTopN / convertAgg / convertGroupedAgg so the reference-shape rule
    * cannot diverge between the pushdown surfaces. */
  private[v2] def singleColumnOf(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
    case n: org.apache.spark.sql.connector.expressions.NamedReference
        if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
    case _ => None
  }

  /** Does the column's block metadata carry exact value bounds? Strings via
    * full-value `block_str_min/max`, the int family (timestamps as micros)
    * via `block_min/max`; opaque binary has neither. ONE definition shared by
    * top-n and aggregate pushdown — a new bounded type must light up both. */
  private[v2] def metadataBounded(schema: StructType, c: String): Boolean =
    schema.fields.find(_.name == c).exists(f =>
      f.dataType == StringType || f.dataType == TimestampType ||
      f.dataType == LongType || f.dataType == IntegerType ||
      f.dataType == ShortType || f.dataType == ByteType)

  sealed trait MetaAgg
  case object AggCountStar extends MetaAgg
  /** `count(col)` — exact from per-block `n`/`n_nulls`, any column. */
  final case class AggCountCol(column: String) extends MetaAgg
  /** `min(col)`/`max(col)` — exact from per-block bounds: `block_min/max`
    * for the int family (timestamps as epoch micros), `block_str_min/max`
    * (full-value unsigned-byte order = Spark's UTF8String order) for
    * strings; opaque binary has neither and declines at the shape gate. */
  final case class AggMin(column: String) extends MetaAgg
  final case class AggMax(column: String) extends MetaAgg
  /** `sum(col)` — exact from per-block `block_sum` (int family; declines on
    * any overflowing or sum-less block, Spark then computes with its own
    * overflow semantics). */
  final case class AggSum(column: String) extends MetaAgg
}

final class GraftTable(root: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft.`$root`"
  /** Store root for plan-level rules ([[graft.plans.GroupedAggMetadataRule]]). */
  private[graft] def storeRoot: String = root
  // cached per table instance (instances are per-query); the sidecar is one
  // tiny read and schemas are immutable for the life of a store
  private lazy val tableSchema: StructType = GraftDataSource.storeSchema(root)
  override def schema(): StructType = tableSchema
  private def isWebtext: Boolean = tableSchema == GraftDataSource.PageSchema

  /** `_part_id`: the work-unit (part) a row belongs to — constant per block
    * group, served from the group key with zero decode cost. Queryable like
    * Iceberg's `_file` (`SELECT _part_id, ...`), and the group identity that
    * row-level operations (UPDATE/MERGE/DELETE rewrites) scan, runtime-filter
    * on, and replace. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftDataSource.PartIdMetadataColumn)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(root, info)

  // ---- SQL UPDATE / MERGE INTO / inexpressible DELETE: group-based
  // copy-on-write ReplaceData (see GraftRowLevelOps.scala). Exact DELETEs are
  // converted BACK to the metadata-only deleteWhere path below by Spark's
  // OptimizeMetadataOnlyDeleteFromTable rule ----
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // the COW rewrite path rides the webtext decode/encode jobs; a silent
    // attempt on a generalized store would corrupt — refuse loudly
    if (!isWebtext) throw new UnsupportedOperationException(
      s"row-level ${info.command()} currently supports webtext-schema stores only; " +
      s"table at $root has schema ${tableSchema.simpleString} — rewrite via " +
      "CTAS/INSERT OVERWRITE instead")
    () => new GraftRowLevelOperation(root, info.command())
  }

  // ---- metadata-only DELETE (SupportsDelete): see graft.jobs.DeleteJob ----

  /** Accept only conditions expressible EXACTLY over the decoded view — an
    * inexact condition would delete wrong rows (pruning, by contrast, is free
    * to be a superset because residual filters restore exactness on reads). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    isWebtext && // the metadata-only DELETE rides the webtext decode job
      filters.forall(f => FilterConversion.toExactColumn(f, tableSchema).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cols = filters.map(f => FilterConversion.toExactColumn(f, tableSchema).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE condition not expressible exactly on the graft table: $f")))
    // AND of all top-level filters; DELETE with no condition = truncate
    val cond = cols.reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val prune = filters.toSeq.flatMap(f => FilterConversion.toBlockPredicates(f, tableSchema))
    graft.jobs.DeleteJob.deleteWhere(SparkSession.active, root, cond, prune)
    ()
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def longOpt(key: String): Option[Long] = Option(options.get(key)).map { v =>
      try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"invalid $key option '$v': expected a numeric committed snapshot id")
      }
    }
    // time travel: .option("snapshotId", id) reads a historical committed
    // snapshot (manifests are immutable per id — same mechanism as decodeAt)
    val snapshotId = longOpt("snapshotId")
    // incremental read: .option("fromSnapshot", a)[.option("toSnapshot", b)]
    // reads the rows ADDED in (a, b] (b defaults to the current snapshot) —
    // batch consumption of a snapshot-range changelog without a stream
    val from = longOpt("fromSnapshot")
    val toOpt = longOpt("toSnapshot")
    require(snapshotId.isEmpty || from.isEmpty,
      "snapshotId (time travel) and fromSnapshot (incremental read) are " +
      "mutually exclusive: one reads a state, the other a range of changes")
    require(from.isDefined || toOpt.isEmpty,
      "toSnapshot requires fromSnapshot (the incremental range is (from, to])")
    val incremental = from.map { f =>
      val cur = SnapshotStore.currentSnapshotId(root).getOrElse(
        throw new IllegalArgumentException(s"no committed snapshot under $root"))
      val t = toOpt.getOrElse(cur)
      require(f >= 0 && t >= f,
        s"invalid incremental range (fromSnapshot=$f, toSnapshot=$t]: " +
        "need 0 <= from <= to")
      // an explicit bound past the head would otherwise surface as a
      // misleading retention ("expired") failure for a snapshot that never
      // existed
      require(t <= cur,
        s"toSnapshot=$t is beyond the current snapshot $cur of $root — " +
        "the range end must be a committed snapshot id")
      (f, t)
    }
    new GraftScanBuilder(root, snapshotId, tableSchema, incremental)
  }
}

/** Filter conversions shared by the scan builder (pruning predicates) and the
  * DELETE path (pruning + EXACT row conditions). */
private[graft] object FilterConversion {

  /** Epoch micros of a pushed-down timestamp literal (either external form). */
  private def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(Math.floorDiv(i.getEpochSecond, 1L) * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  private def satMinus(us: Long): Long = if (us == Long.MinValue) us else us - 1
  private def satPlus(us: Long): Long = if (us == Long.MaxValue) us else us + 1

  /** The raw long of an integral pushed-down literal. */
  private def intVal(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l)
    case i: java.lang.Integer => Some(i.toLong)
    case s: java.lang.Short => Some(s.toLong)
    case b: java.lang.Byte => Some(b.toLong)
    case _ => None
  }

  /** Block predicates a filter implies over a store of the given SCHEMA
    * (conjuncts; empty = not convertible). String columns prune via string
    * bounds/dicts; timestamp columns via epoch-micros block min/max; the
    * integer family via raw block min/max. Soundness: each returned predicate
    * is a SUPERSET condition of the filter, and the filter itself always runs
    * as a residual on decoded rows. */
  def toBlockPredicates(f: Filter,
      schema: StructType = GraftDataSource.PageSchema): Seq[DecodeJob.BlockPredicate] = {
    val strCols = schema.fields.iterator
      .filter(_.dataType == StringType).map(_.name).toSet
    def boundsOf(c: String, v: Any): Option[Long] =
      schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(TimestampType) => tsMicros(v)
        case Some(LongType | IntegerType | ShortType | ByteType) => intVal(v)
        case _ => None
      }
    f match {
      case sources.And(l, r) => toBlockPredicates(l, schema) ++ toBlockPredicates(r, schema)
      case sources.EqualTo(c, v: String) if strCols(c) => Seq(DecodeJob.StrEq(c, v))
      case sources.In(c, vs) if strCols(c) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Seq(DecodeJob.StrIn(c, vs.toSeq.map(_.asInstanceOf[String])))
      case sources.StringStartsWith(c, p) if strCols(c) => Seq(DecodeJob.StrPrefix(c, p))
      // open-ended ranges (a finite stand-in top bound would prune unsoundly —
      // strings sort above any finite string); strict </> push the closed
      // superset range, the residual filter restores strictness
      case sources.GreaterThanOrEqual(c, v: String) if strCols(c) =>
        Seq(DecodeJob.StrRange(c, Some(v), None))
      case sources.GreaterThan(c, v: String) if strCols(c) =>
        Seq(DecodeJob.StrRange(c, Some(v), None))
      case sources.LessThanOrEqual(c, v: String) if strCols(c) =>
        Seq(DecodeJob.StrRange(c, None, Some(v)))
      case sources.LessThan(c, v: String) if strCols(c) =>
        Seq(DecodeJob.StrRange(c, None, Some(v)))
      case sources.EqualTo(c, v) =>
        boundsOf(c, v).map(x => DecodeJob.IntRange(c, x, x)).toSeq
      case sources.GreaterThan(c, v) =>
        boundsOf(c, v).map(x => DecodeJob.IntRange(c, satPlus(x), Long.MaxValue)).toSeq
      case sources.GreaterThanOrEqual(c, v) =>
        boundsOf(c, v).map(x => DecodeJob.IntRange(c, x, Long.MaxValue)).toSeq
      case sources.LessThan(c, v) =>
        boundsOf(c, v).map(x => DecodeJob.IntRange(c, Long.MinValue, satMinus(x))).toSeq
      case sources.LessThanOrEqual(c, v) =>
        boundsOf(c, v).map(x => DecodeJob.IntRange(c, Long.MinValue, x)).toSeq
      case _ => Seq.empty
    }
  }

  /** EXACT Column form of a filter over the decoded view, or None when
    * not expressible (the DELETE path then refuses the whole statement —
    * unlike pruning, an inexact condition here would delete wrong rows). */
  def toExactColumn(f: Filter,
      schema: StructType = GraftDataSource.PageSchema): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    val names = schema.fieldNames.toSet
    def ref(c: String): Option[org.apache.spark.sql.Column] =
      if (names(c)) Some(col(c)) else None
    f match {
      case sources.And(l, r) =>
        for { a <- toExactColumn(l, schema); b <- toExactColumn(r, schema) } yield a && b
      case sources.Or(l, r) =>
        for { a <- toExactColumn(l, schema); b <- toExactColumn(r, schema) } yield a || b
      case sources.Not(c) => toExactColumn(c, schema).map(!_)
      case sources.EqualTo(c, v) => ref(c).map(_ === lit(v))
      case sources.EqualNullSafe(c, v) => ref(c).map(_ <=> lit(v))
      case sources.In(c, vs) => ref(c).map(_.isin(vs.toIndexedSeq: _*))
      case sources.GreaterThan(c, v) => ref(c).map(_ > lit(v))
      case sources.GreaterThanOrEqual(c, v) => ref(c).map(_ >= lit(v))
      case sources.LessThan(c, v) => ref(c).map(_ < lit(v))
      case sources.LessThanOrEqual(c, v) => ref(c).map(_ <= lit(v))
      case sources.IsNull(c) => ref(c).map(_.isNull)
      case sources.IsNotNull(c) => ref(c).map(_.isNotNull)
      case sources.StringStartsWith(c, p) => ref(c).map(_.startsWith(p))
      case sources.StringEndsWith(c, p) => ref(c).map(_.endsWith(p))
      case sources.StringContains(c, p) => ref(c).map(_.contains(p))
      case sources.AlwaysTrue() => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}

final class GraftScanBuilder(root: String, snapshotId: Option[Long],
    tableSchema: StructType = GraftDataSource.PageSchema,
    incremental: Option[(Long, Long)] = None)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  private var requiredSchema: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var predicates: Seq[DecodeJob.BlockPredicate] = Seq.empty
  private var sawFilters = false
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[GraftDataSource.TopN] = None

  /** PARTIAL limit pushdown (isPartiallyPushed stays true): each task stops
    * pulling and decoding block groups once it has produced `limit` rows —
    * `SELECT * FROM graft LIMIT n` stops after ~one group per launched task
    * instead of decoding the store — and Spark's own GlobalLimit still trims
    * the cross-task union exactly. */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    true
  }

  /** PARTIAL top-n pushdown for `ORDER BY url|warc_ts [ASC|DESC] LIMIT n`:
    * planning keeps only an ordered PREFIX of block groups whose guaranteed
    * row count covers n ([[DecodeJob.planTopNKeys]] — block_str_min/max for
    * url, the exact int block_min/max for warc_ts, plus exact per-block null
    * counts), so the scan reads ~n rows instead of the store; Spark's retained
    * Sort+Limit (isPartiallyPushed) trims exactly. Only the filterless
    * single-key shape on a metadata-bounded column is accepted: with residual
    * filters the per-group row counts no longer bound the MATCHING rows, so a
    * count-based prefix could cut off true top-n rows. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    if (sawFilters || orders.length != 1 || limit <= 0) return false
    val o = orders(0)
    val column = GraftDataSource.singleColumnOf(o.expression()).getOrElse(return false)
    if (!GraftDataSource.metadataBounded(tableSchema, column)) return false
    pushedTopN = Some(GraftDataSource.TopN(
      column = column,
      asc = o.direction() == SortDirection.ASCENDING,
      nullsFirst = o.nullOrdering() == NullOrdering.NULLS_FIRST,
      limit = limit))
    true
  }

  /** Both limit and top-n pushdown are prefixes, never exact. */
  override def isPartiallyPushed: Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val converted = filters.map(f => f -> FilterConversion.toBlockPredicates(f, tableSchema))
    pushed = converted.collect { case (f, ps) if ps.nonEmpty => f }
    predicates = converted.flatMap(_._2).toSeq
    sawFilters = filters.nonEmpty
    // block pruning is inexact (a surviving block still holds non-matching
    // rows) — return EVERY filter as a residual so Spark evaluates it exactly
    // on the decoded rows; the pruning benefit is unchanged
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = requiredSchema = required

  // -------- aggregate pushdown: count(*)/count(col)/min/max from metadata --------

  /** Convertible iff NOTHING was filtered (metadata reflects the unfiltered
    * table — a pushed predicate would make manifest counts wrong), there is
    * no grouping, and every aggregate is count(*) / non-distinct count(col) /
    * min(col) / max(col) of a metadata-bounded column: the int family
    * (incl. timestamps) carries exact `block_min/max`, strings carry exact
    * full-value `block_str_min/max`; opaque binary has neither. Whether the
    * STORE can answer (n_nulls/bounds coverage) is the data-dependent check
    * in [[supportCompletePushDown]]. */
  private def convertAgg(agg: aggregate.Aggregation): Option[Seq[GraftDataSource.MetaAgg]] = {
    // incremental (fromSnapshot) scans answer over a snapshot-RANGE delta; the
    // metadata aggregate paths read one snapshot's state — decline, the
    // ordinary scan + Spark's aggregate stay exact over the delta rows
    if (incremental.isDefined) return None
    if (pushed.nonEmpty || predicates.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      GraftDataSource.singleColumnOf(e)
    def bounded(c: String): Boolean = GraftDataSource.metadataBounded(tableSchema, c)
    def summable(c: String): Boolean = tableSchema.fields.find(_.name == c).exists(f =>
      f.dataType == LongType || f.dataType == IntegerType ||
      f.dataType == ShortType || f.dataType == ByteType)
    val fns = agg.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar => Some(GraftDataSource.AggCountStar)
      case ct: aggregate.Count if !ct.isDistinct =>
        colOf(ct.column).filter(tableSchema.fieldNames.contains)
          .map(GraftDataSource.AggCountCol)
      case m: aggregate.Min => colOf(m.column).filter(bounded).map(GraftDataSource.AggMin)
      case m: aggregate.Max => colOf(m.column).filter(bounded).map(GraftDataSource.AggMax)
      case s: aggregate.Sum if !s.isDistinct =>
        colOf(s.column).filter(summable).map(GraftDataSource.AggSum)
      case _ => None
    }
    if (fns.nonEmpty && fns.forall(_.isDefined)) Some(fns.flatten) else None
  }

  // -------- GROUPED aggregate pushdown from dict metadata (GraftGroupedAgg) --------

  /** The grouped shape this source can answer from metadata: one bare textual
    * group column with only count(*) / count(<group column>) aggregates (an
    * EMPTY aggregate list = SELECT DISTINCT, also served). Whether the STORE
    * can answer it exactly is a separate data-dependent check (dict+counts
    * coverage) performed in [[supportCompletePushDown]]. */
  private def convertGroupedAgg(agg: aggregate.Aggregation)
      : Option[(String, Seq[GroupedAggKind])] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (incremental.isDefined) return None // see convertAgg: delta != state
    if (pushed.nonEmpty || predicates.nonEmpty) return None
    if (agg.groupByExpressions.length != 1) return None
    val gcol = GraftDataSource.singleColumnOf(agg.groupByExpressions()(0))
      .getOrElse(return None)
    // textual dict-capable columns = the schema's string fields
    if (!tableSchema.fields.exists(f => f.name == gcol && f.dataType == StringType))
      return None
    def isGroupCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case n: NamedReference => n.fieldNames.toSeq == Seq(gcol)
        case _ => false
      }
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar => Some(GroupedCountStar)
      case c: aggregate.Count if !c.isDistinct && isGroupCol(c.column) =>
        Some(GroupedCountCol)
      case _ => None
    }
    if (kinds.forall(_.isDefined)) Some((gcol, kinds.flatten)) else None
  }

  private var pushedGrouped: Option[(String, Seq[GroupedAggKind],
    Seq[GraftGroupedAgg.GroupRow])] = None
  private var pushedUngrouped: Option[(Seq[GraftDataSource.MetaAgg], Array[Any])] = None
  // build() serves a metadata scan ONLY after Spark ACCEPTED it through
  // pushAggregation — a supportCompletePushDown probe alone must not flip the
  // scan's output schema (Spark would still expect full-width rows)
  private var groupedAccepted = false
  private var ungroupedAccepted = false

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    (convertAgg(agg) match {
      case Some(as) =>
        // data-dependent gate, mirrored from the grouped path: every block of
        // a min/max column must carry bounds (or be all-null with exact
        // n_nulls), every count(col) column exact n_nulls — the store answers
        // from metadata or not at all (a partial/approximate answer is never
        // served; see pushAggregation)
        GraftUngroupedAgg.compute(SparkSession.active, root, snapshotId, as,
            tableSchema) match {
          case Some(vals) => pushedUngrouped = Some((as, vals)); true
          case None => false
        }
      case None => false
    }) || (convertGroupedAgg(agg) match {
      case Some((c, kinds)) =>
        // data-dependent gate: every live block of c must carry dict+counts
        // (or be all-null) — the store answers from metadata or not at all
        GraftGroupedAgg.compute(SparkSession.active, root, snapshotId, c) match {
          case Some(rows) => pushedGrouped = Some((c, kinds, rows)); true
          case None => false
        }
      case None => false
    })

  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    // both forms are accepted only as the COMPLETE pushdown prepared above,
    // for the SAME aggregate shape — Spark also probes pushAggregation on its
    // PARTIAL pushdown path (supportCompletePushDown false), and per-block
    // metadata cannot serve Spark's partial agg row shape
    val ungroupedMatches = pushedUngrouped.exists(p => convertAgg(agg).contains(p._1))
    if (ungroupedMatches) { ungroupedAccepted = true; true }
    else {
      val matches = pushedGrouped.exists(p =>
        convertGroupedAgg(agg).contains((p._1, p._2)))
      if (matches) groupedAccepted = true
      matches
    }
  }

  override def build(): Scan = pushedUngrouped.filter(_ => ungroupedAccepted) match {
    // a pushed aggregate yields one metadata row — a limit on top is moot
    case Some((aggs, vals)) => new GraftAggScan(root, snapshotId, aggs, vals, tableSchema)
    case None => pushedGrouped.filter(_ => groupedAccepted) match {
      case Some((c, kinds, rows)) => new GraftGroupedAggScan(root, c, kinds, rows)
      case None =>
        // Spark pushes EITHER a bare limit or a top-n, never both; the per-task
        // early-stop row cap is sound only for the order-free bare limit (a task
        // truncating its url-ordered duty under top-n could drop true top-n rows)
        new GraftScan(root, snapshotId, requiredSchema, predicates,
          if (pushedTopN.isDefined) None else pushedLimit, pushedTopN, tableSchema,
          incremental)
    }
  }
}

/**
 * Complete aggregate pushdown: `SELECT count(*), count(col), min(col),
 * max(col)` over the graft table is answered WITHOUT decoding anything —
 * count(*) from the manifest's per-part row counts (driver arithmetic, zero
 * file IO), count(col) from exact per-block `n_nulls`, and min/max from the
 * exact per-block bounds (int family via `block_min/max`, strings via the
 * full-value `block_str_min/max`) — one column-pruned metadata scan that
 * never touches `encoded`. The values were computed (and coverage-gated) at
 * PUSHDOWN time ([[GraftUngroupedAgg]]); execution serves the one metadata
 * row. Exact: bounds/null counts are exact, and nulls don't participate in
 * SQL min/max.
 */
final class GraftAggScan(root: String, snapshotId: Option[Long],
                         aggs: Seq[GraftDataSource.MetaAgg],
                         values: Array[Any],
                         tableSchema: StructType = GraftDataSource.PageSchema)
    extends Scan with Batch {

  private def colType(c: String) = tableSchema(c).dataType

  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (GraftDataSource.AggCountStar, i) =>
      StructField(s"count_star_$i", LongType, nullable = false)
    case (GraftDataSource.AggCountCol(c), i) =>
      StructField(s"count_${c}_$i", LongType, nullable = false)
    case (GraftDataSource.AggMin(c), i) =>
      StructField(s"min_${c}_$i", colType(c), nullable = true)
    case (GraftDataSource.AggMax(c), i) =>
      StructField(s"max_${c}_$i", colType(c), nullable = true)
    case (GraftDataSource.AggSum(c), i) =>
      // Spark's final type for integral sums is LongType regardless of width
      StructField(s"sum_${c}_$i", LongType, nullable = true)
  })

  override def description(): String = {
    val snap = snapshotId.map(id => s" snapshotId=$id").getOrElse("")
    s"GraftStore root=$root$snap PushedAggregates: [${aggs.mkString(", ")}] (metadata-only)"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // record THIS scan's stats: a gate reading planStatsFor after an
    // agg-pushed query must not validate the PREVIOUS scan's plan (the
    // stale-gate-result class); one metadata partition, zero data files
    GraftDataSource.recordPlanStats(root, GraftDataSource.PlanStats(
      partitions = 1, files = 0, predicates = 0, prunedGroupKeys = None))
    Array(GraftAggPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftAggReaderFactory
}

/** `values` are INTERNAL representations (Long/Int/Short/Byte, epoch-micros
  * Long for timestamps, UTF8String for strings, null for empty columns). */
final case class GraftAggPartition(values: Array[Any]) extends InputPartition

object GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vs = partition.asInstanceOf[GraftAggPartition].values
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(vs.length)
        var i = 0
        while (i < vs.length) { row.update(i, vs(i)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
}

final class GraftScan(root: String, snapshotId: Option[Long],
                      requiredSchema: StructType,
                      initialPredicates: Seq[DecodeJob.BlockPredicate],
                      pushedLimit: Option[Int] = None,
                      pushedTopN: Option[GraftDataSource.TopN] = None,
                      tableSchema: StructType = GraftDataSource.PageSchema,
                      incremental: Option[(Long, Long)] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Metadata-answer scope for plan-level rules
    * ([[graft.plans.GroupedAggMetadataRule]]): (root, snapshotId) when this
    * scan reads ONE snapshot's full state — the state block metadata
    * describes; None for incremental scans (a range delta is not that). */
  private[graft] def metadataScope: Option[(String, Option[Long])] =
    if (incremental.isDefined) None else Some((root, snapshotId))

  /** Compile-time predicates + any runtime (DPP-style) In-filters Spark
    * delivers just before execution. */
  @volatile private var predicates: Seq[DecodeJob.BlockPredicate] = initialPredicates

  /** Runtime-filter value-list ceiling: a broadcast join key set larger than
    * this prunes little per value while bloating the metadata scan's In-list —
    * ignore it (a no-op runtime filter is always sound; the join still
    * evaluates exactly). */
  private val MaxRuntimeInValues = 10000

  // ---- SupportsRuntimeFiltering: a broadcast-join build side over the
  // store's sort/partition key prunes block groups AT EXECUTION — the V2
  // analog of dynamic partition pruning, riding the same block metadata ----
  private val sortKeyName: String = GraftDataSource.sortKeyOf(tableSchema).name
  private val sortKeyIsString: Boolean =
    GraftDataSource.sortKeyOf(tableSchema).dataType == StringType

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (sortKeyIsString)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column(sortKeyName))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    val extra = filters.toSeq.flatMap {
      case sources.In(c, vs)
          if c == sortKeyName && vs.nonEmpty && vs.length <= MaxRuntimeInValues &&
            vs.forall(_.isInstanceOf[String]) =>
        Seq(DecodeJob.StrIn(c, vs.toSeq.map(_.asInstanceOf[String])))
      case sources.EqualTo(c, v: String) if c == sortKeyName =>
        Seq(DecodeJob.StrEq(c, v))
      case _ => Seq.empty // unconvertible runtime filter: scan stays a superset
    }
    if (extra.nonEmpty) predicates = predicates ++ extra
  }

  /** ONE manifest read per scan, pinned: estimateStatistics (optimization) and
    * planInputPartitions (execution, possibly twice around runtime filters)
    * must all describe the SAME snapshot — re-reading let a commit landing
    * between them skew the optimizer's stats against the scanned data, and
    * re-parsed a 100k-part manifest per call. */
  private lazy val pinnedEntriesAndToken: (Seq[SnapshotStore.PartEntry], Long) = {
    // the identity token is read BEFORE and AFTER the manifest walk: a commit
    // landing between them means the entries may not belong to the token, so
    // the scan marks itself non-memoizable (-1) rather than cache a plan
    // computed from one snapshot's entries under another snapshot's key
    // (review finding: pin-time vs plan-time token race -> silent stale keys)
    val t0 = GraftDataSource.storeIdentityToken(root)
    val entries: Seq[SnapshotStore.PartEntry] = incremental match {
      // incremental read: the parts ADDED in (from, to] — the same additions-
      // changelog walk as the streaming reader, planned once per scan; every
      // downstream stage (pruning, projection, limit/top-n, runtime filtering)
      // rides these entries unchanged
      case Some((f, t)) => SnapshotStore.deltaEntries(root, f, t, freshFrom = false)(
        (sid, e) => throw new IllegalStateException(
          s"incremental read of $root needs the manifest of snapshot $sid to " +
          s"reconstruct range ($f, $t], but it is gone — expired. Widen " +
          "SnapshotStore.expireSnapshots(keepLast) to cover your consumption lag, " +
          "or read the full table and re-baseline.", e))
      case None => snapshotId match {
        case Some(id) => SnapshotStore.entriesAt(root, id)
        case None => SnapshotStore.currentEntries(root)
      }
    }
    val t1 = GraftDataSource.storeIdentityToken(root)
    (entries, if (t0 == t1) t0 else -1L)
  }

  private lazy val pinnedEntries: Seq[SnapshotStore.PartEntry] = pinnedEntriesAndToken._1

  private def snapshotEntries(): Seq[SnapshotStore.PartEntry] = pinnedEntries

  // ---- pruned-key plan, memoized per predicate set: runtime-filtered scans
  // plan TWICE (pre- and post-filter()), and without this each planning pass
  // left one more driver-held broadcast to the ContextCleaner (slow
  // accumulation in a long-lived driver running many selective scans). Same
  // predicates -> the whole metadata-scan plan is reused; changed predicates
  // (a runtime In landed) -> the superseded broadcast is destroyed before the
  // new one is built (its partitions never execute: Spark re-plans from this
  // same Batch and only the final partitions run). ----
  private val planLock = new Object
  private var cachedPreds: Seq[DecodeJob.BlockPredicate] = null
  private var cachedKeys: Option[Array[(Int, Int)]] = None
  private var cachedKeysBc: org.apache.spark.broadcast.Broadcast[Array[Long]] = null

  private def plannedKeys(spark: SparkSession, preds: Seq[DecodeJob.BlockPredicate],
      entries: Seq[SnapshotStore.PartEntry])
      : (Option[Array[(Int, Int)]], org.apache.spark.broadcast.Broadcast[Array[Long]]) =
    planLock.synchronized {
      if (cachedPreds != null && cachedPreds == preds) return (cachedKeys, cachedKeysBc)
      // r7: the key plan is a pure function of the (immutable) snapshot +
      // predicates + top-n — memoized across SCANS, not just within one, so a
      // re-planned or re-run query skips the metadata Spark job entirely.
      // The token is the one captured WITH the pinned entries (a commit racing
      // the pin marks it -1 = compute without caching); the two planning gates
      // are test-mutable vars, included so a key computed under altered gates
      // can never serve a default-gate scan.
      val pinnedToken = pinnedEntriesAndToken._2
      def compute(): Option[Array[(Int, Int)]] =
        if (preds.nonEmpty)
          DecodeJob.planPrunedKeys(DecodeJob.fromEntries(spark, root, entries), preds,
            DecodeJob.estimatedGroups(entries), Some(tableSchema.fieldNames.toSet))
        // top-n prefix pruning only when NO predicate of any kind arrived (a
        // runtime filter landing via filter() makes per-group row counts stop
        // bounding the MATCHING rows — same reason pushTopN refuses filters)
        else pushedTopN.flatMap { t =>
          val intBounds = tableSchema.fields.find(_.name == t.column)
            .map(_.dataType != StringType)
          DecodeJob.planTopNKeys(DecodeJob.fromEntries(spark, root, entries),
            t.column, t.asc, t.nullsFirst, t.limit, DecodeJob.estimatedGroups(entries),
            intBounds)
        }
      val keysOpt: Option[Array[(Int, Int)]] =
        if (pinnedToken == -1L) compute()
        else GraftDataSource.memoizedKeyPlan((root, pinnedToken, snapshotId,
          incremental, preds, if (preds.nonEmpty) None else pushedTopN,
          DecodeJob.MaxPrunedKeyCollect, DecodeJob.PruneFractionCutoff))(compute())
      if (cachedKeysBc != null) cachedKeysBc.destroy()
      cachedPreds = preds
      cachedKeys = keysOpt
      cachedKeysBc = keysOpt.map(ks => spark.sparkContext.broadcast(
        ks.map(k => DecodeJob.packKey(k._1, k._2)).sorted)).orNull
      (cachedKeys, cachedKeysBc)
    }

  override def readSchema(): StructType = requiredSchema

  override def description(): String = {
    val cols = requiredSchema.fieldNames.mkString(",")
    val preds = predicates.mkString(", ")
    val snap = snapshotId.map(id => s" snapshotId=$id").getOrElse("")
    val inc = incremental.map { case (f, t) => s" incremental=($f,$t]" }.getOrElse("")
    val lim = pushedLimit.map(n => s" PushedLimit: $n").getOrElse("")
    val topn = pushedTopN.map(t => s" PushedTopN: [$t] (partial)").getOrElse("")
    s"GraftStore root=$root$snap$inc columns=[$cols] PushedBlockPredicates: [$preds]$lim$topn"
  }

  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = {
    // manifest rollup: decoded (original) byte size + exact row count; both are
    // metadata-only. Filter selectivity is left to Spark's own estimation on
    // the residual filters.
    val entries = snapshotEntries()
    val rows = entries.map(_.nRows).sum
    val bytes = entries.map(_.origBytes).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val entries = snapshotEntries()
    if (entries.isEmpty) {
      // an empty-ENTRIES snapshot (created-but-unloaded table, truncate,
      // all-matched DELETE) reads as zero rows; a root with no snapshot at all
      // is not a store and fails loudly (entriesAt already threw for an
      // explicit time-travel id with no manifest)
      require(snapshotId.isDefined || SnapshotStore.currentSnapshotId(root).isDefined,
        s"no committed snapshot under $root")
      return Array.empty
    }

    // gated Iceberg-style planning: a metadata-only scan yields the surviving
    // group keys, or None when the predicate is not selective (past the
    // MaxPrunedKeyCollect / half-the-groups gate — the residuals still make
    // results exact). The key set ships as a BROADCAST and each task slices
    // out its own dir's contiguous runs, so the per-task payload no longer
    // bounds pruning depth: the SQL surface now prunes as deep as the
    // decodeWhere API (10^6 keys), where r4 silently dropped ALL pruning past
    // 4096 surviving groups because the whole array rode every InputPartition.
    // Memoized per predicate set (see plannedKeys): the double planning around
    // runtime filters neither re-runs the metadata scan nor leaks broadcasts.
    val (keysOpt, keysBc) = plannedKeys(spark, predicates, entries)
    val keyParts: Option[Set[Int]] = keysOpt.map(_.map(_._1).toSet)
    val columnar = spark.conf.getOption("spark.graft.v2.columnar") match {
      case None => false
      case Some(v) if v.equalsIgnoreCase("true") => true
      case Some(v) if v.equalsIgnoreCase("false") => false
      case Some(v) => throw new IllegalArgumentException(
        s"spark.graft.v2.columnar must be true or false, got '$v'")
    }
    val (partitions, fileCount) = GraftDataSource.packPartitions(spark, root, entries,
      requiredSchema, tableSchema.fields.head.name, keyParts, keysBc, columnar,
      pushedLimit.getOrElse(-1))
    GraftDataSource.recordPlanStats(root, GraftDataSource.PlanStats(
      partitions.length, fileCount,
      predicates.size, keysOpt.map(_.length), pushedLimit, pushedTopN))
    partitions
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftReaderFactory

  /** Micro-batch streaming read over the snapshot-id sequence (see
    * [[GraftMicroBatchStream]]); pushed predicates prune each batch's delta
    * groups exactly like the batch scan (and still run as Spark-side
    * residuals for exactness), column pruning applies too. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(snapshotId.isEmpty,
      "snapshotId (time travel) and readStream are mutually exclusive: a stream " +
      "already replays the snapshot sequence from its checkpointed offset")
    require(incremental.isEmpty,
      "fromSnapshot (incremental batch read) and readStream are mutually " +
      "exclusive: a stream IS the incremental consumption of the store")
    new GraftMicroBatchStream(root, requiredSchema, tableSchema.fields.head.name,
      initialPredicates)
  }
}

/** A bin of whole block parquet files from ONE data dir; groups are whole
  * within each file by construction. */
final case class GraftInputPartition(
    files: Array[String],
    readSchema: StructType,          // required output columns + types, in order
    refColumn: String,               // store's first column: the count-only reference
    liveParts: Array[Int],           // sorted live part ids of the files' dir
    // broadcast of ALL surviving sorted (part_id<<32|seq) keys, or null = no
    // pruning; each task slices its dir's runs out (bounded per-task payload)
    keysBc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    conf: org.apache.spark.util.SerializableConfiguration,
    columnar: Boolean,
    limit: Int = -1) extends InputPartition { // pushed per-task row cap; -1 = none
  def columns: Array[String] = readSchema.fieldNames
}

/** GroupReadSupport whose requested schema is a named-field projection of the
  * file's own schema nodes (exact repetition/type match by construction). */
private final class ProjectingGroupReadSupport(cols: Seq[String]) extends GroupReadSupport {
  override def init(conf: Configuration,
      keyValueMetaData: java.util.Map[String, String],
      fileSchema: MessageType): org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
    val fields: Array[org.apache.parquet.schema.Type] =
      cols.map(n => fileSchema.getType(Array(n): _*)).toArray
    new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
      new MessageType(fileSchema.getName, fields: _*))
  }
}

object GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition])

  // columnar is a per-scan choice (spark.graft.v2.columnar): copying multi-KB
  // text/html blobs into ColumnVectors measurably LOSES to the row path's
  // zero-copy UTF8String wrapping on this workload, while narrow projections
  // are comparable — see BASELINE.md round-4 notes
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val p = partition.asInstanceOf[GraftInputPartition]
    // the metadata column rides the row path (constant-per-group; not worth a
    // dedicated vector fill in the opt-in columnar reader)
    p.columnar && !p.columns.contains("_part_id")
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarReader(partition.asInstanceOf[GraftInputPartition])
}

/**
 * Streams a bin of whole block files as LIVE complete (part_id, block_seq)
 * groups: parquet-level filters (column ∈ wanted, part/seq ∈ pruned keys) skip
 * row groups by statistics, consecutive records assemble in place, the group
 * buffer flushes at file boundaries (groups are whole per file). Bounded
 * memory: one 64Ki-row group in flight.
 */
private final class BlockGroupStream(p: GraftInputPartition, readCols: Array[String],
                                     countOnly: Boolean) {
  /** One live, complete block group (encoded bytes per requested column). */
  final case class GroupData(cols: Map[String, Array[Byte]], n: Int, pid: Int)

  private val expected: Set[String] = readCols.toSet

  // projection built inside ReadSupport.init from the file schema the reader
  // already parsed (`encoded` skipped entirely in count-only mode — parquet
  // never touches those pages); a separate footer pre-read just for the
  // schema would double the per-file open round-trips on object storage
  private val projNames = Seq("part_id", "block_seq", "column", "n") ++
    (if (countOnly) Seq.empty else Seq("encoded"))

  /** First index in sorted `a` with value >= target. */
  private def lowerBound(a: Array[Long], target: Long): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** This bin's slice of the globally pruned key set: keys are sorted by
    * packed (part_id<<32|seq), so each part's keys form one contiguous run —
    * one lower-bound search per live part of the bin's dir extracts the dir's
    * share. Per-task work is O(dir keys), independent of the global survivor
    * count, which is what lifts the r4 per-task 4096-key ceiling. */
  private val slicedKeys: Array[Long] =
    if (p.keysBc == null) null
    else {
      val all = p.keysBc.value
      val ranges = new Array[Int](p.liveParts.length * 2)
      var total = 0
      var i = 0
      while (i < p.liveParts.length) {
        val pid = p.liveParts(i)
        val lo = lowerBound(all, pid.toLong << 32)
        val hi = lowerBound(all, (pid.toLong + 1) << 32)
        ranges(2 * i) = lo; ranges(2 * i + 1) = hi
        total += hi - lo
        i += 1
      }
      val out = new Array[Long](total)
      var o = 0
      i = 0
      while (i < p.liveParts.length) {
        val lo = ranges(2 * i); val n = ranges(2 * i + 1) - lo
        System.arraycopy(all, lo, out, o, n)
        o += n
        i += 1
      }
      out
    }

  private def inFilterMaxKeys: Int = GraftDataSource.InFilterMaxKeys

  private val filter: FilterCompat.Filter = {
    var pred: FilterPredicate =
      FilterApi.in(FilterApi.binaryColumn("column"),
        readCols.map(Binary.fromString).toSet.asJava)
    if (slicedKeys != null && slicedKeys.length > 0 && slicedKeys.length <= inFilterMaxKeys) {
      val pids = slicedKeys.map(k => Int.box((k >>> 32).toInt)).toSet.asJava
      val seqs = slicedKeys.map(k => Int.box(k.toInt)).toSet.asJava
      pred = FilterApi.and(pred,
        FilterApi.and(FilterApi.in(FilterApi.intColumn("part_id"), pids),
          FilterApi.in(FilterApi.intColumn("block_seq"), seqs)))
    } else if (slicedKeys != null && slicedKeys.length > 0) {
      val pids = slicedKeys.map(k => Int.box((k >>> 32).toInt)).toSet.asJava
      pred = FilterApi.and(pred, FilterApi.in(FilterApi.intColumn("part_id"), pids))
    } else if (slicedKeys == null && p.liveParts.length <= inFilterMaxKeys) {
      // NO key pruning (plain scan): still push the LIVE part ids — a
      // metadata-only DELETE/rewrite leaves the replaced parts' files inside
      // dirs the surviving parts keep referenced, and without this filter a
      // plain SELECT reads and decompresses ALL of that dead data on every
      // scan (until compaction) only for liveGroup to drop it. Row-group
      // statistics skip the dead parts' groups at near-zero cost; exactness
      // is unchanged (liveGroup already requires part ∈ liveParts).
      val pids = p.liveParts.map(Int.box).toSet.asJava
      pred = FilterApi.and(pred, FilterApi.in(FilterApi.intColumn("part_id"), pids))
    }
    FilterCompat.get(pred)
  }

  private val fileQueue = p.files.iterator
  private var curFile: String = _
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!fileQueue.hasNext) false
    else {
      curFile = fileQueue.next()
      reader = ParquetReader.builder(new ProjectingGroupReadSupport(projNames),
          new Path(curFile))
        .withConf(p.conf.value)
        .withFilter(filter)
        .build()
      true
    }
  }

  // one-group lookahead buffer. Emptiness is an EXPLICIT flag, not a sentinel
  // key: compacted parts live in a negative id namespace, so packed keys can
  // be any Long (a `bufKey < 0` empty-check silently dropped every compacted
  // group — all rows of a compacted store lost on the V2 surface)
  private var bufKey: Long = 0L
  private var bufHas = false
  private var bufCols: Map[String, Array[Byte]] = Map.empty
  private var bufN: Int = 0
  // a dir with zero surviving keys never plans (defensive: empty In-sets are
  // rejected by parquet's FilterApi, so don't build a filter from nothing)
  private var eof = slicedKeys != null && slicedKeys.length == 0

  @inline private def liveGroup(packed: Long): Boolean = {
    val pid = (packed >>> 32).toInt
    java.util.Arrays.binarySearch(p.liveParts, pid) >= 0 &&
      (slicedKeys == null || java.util.Arrays.binarySearch(slicedKeys, packed) >= 0)
  }

  private def takeBuffered(): GroupData = {
    val out =
      if (!bufHas || !liveGroup(bufKey)) null
      else if (!countOnly && bufCols.keySet != expected)
        throw new java.io.IOException(
          s"block group part_id=${(bufKey >>> 32).toInt} block_seq=${bufKey.toInt} in " +
          s"$curFile has columns ${bufCols.keySet.toSeq.sorted.mkString(",")}, expected " +
          s"${expected.toSeq.sorted.mkString(",")}: corrupt or foreign store layout")
      else GroupData(bufCols, bufN, (bufKey >>> 32).toInt)
    bufHas = false; bufCols = Map.empty; bufN = 0
    out
  }

  /** The next LIVE complete group, or null at end of the bin. */
  def nextGroup(): GroupData = {
    while (!eof) {
      if (reader == null) {
        if (!openNext()) {
          eof = true
          val out = takeBuffered()
          if (out != null) return out
          return null
        }
      }
      val g = reader.read()
      if (g == null) {
        // file boundary: groups are whole per file, so the buffer must flush
        // before the next file (the same key cannot legally continue there)
        reader.close(); reader = null
        val out = takeBuffered()
        if (out != null) return out
      } else {
        val packed = DecodeJob.packKey(g.getInteger("part_id", 0),
          g.getInteger("block_seq", 0))
        val colName = g.getBinary("column", 0).toStringUsingUTF8
        val n = g.getInteger("n", 0)
        val enc = if (countOnly) null else g.getBinary("encoded", 0).getBytes
        if (!bufHas || packed != bufKey) {
          val out = takeBuffered()
          bufKey = packed
          bufHas = true
          bufCols = if (countOnly) Map.empty else Map(colName -> enc)
          bufN = n
          if (out != null) return out
        } else if (!countOnly) {
          bufCols = bufCols.updated(colName, enc)
        }
      }
    }
    null
  }

  def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

/** Row-based reader over [[BlockGroupStream]] — the DEFAULT path (measured
  * 2× faster than columnar on blob-heavy scans via zero-copy UTF8String;
  * [[GraftColumnarReader]] is the opt-in alternative). */
final class GraftPartitionReader(p: GraftInputPartition)
    extends PartitionReader[InternalRow] {

  // `_part_id` is a METADATA column (constant per block group, known from the
  // group key): it has no stored blocks, so it never reaches the parquet read
  private val dataCols: Array[String] = p.columns.filter(_ != "_part_id")
  // empty DATA projection (count(*), or a metadata-only one like
  // `SELECT _part_id`): only (group key, row count) is needed, and the stream's
  // count-only mode reads exactly that — the `encoded` pages of the reference
  // column (the store's first column, present in every group) never leave disk
  private val metaOnly = dataCols.isEmpty
  private val readCols: Array[String] = if (metaOnly) Array(p.refColumn) else dataCols
  private val stream = new BlockGroupStream(p, readCols, countOnly = metaOnly)

  private var current: InternalRow = _
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var done = false
  private var produced = 0L

  private def decodeGroup(gd: BlockGroupStream#GroupData): Iterator[InternalRow] = {
    if (p.columns.isEmpty) { // count(*): zero-width rows
      val empty: InternalRow = new GenericInternalRow(0)
      return Iterator.fill(gd.n)(empty)
    }
    // per-column decode dispatch is TYPE-driven off the read schema (the
    // store's persisted schema pruned to this scan): timestamps and the int
    // family ride IntBlockCodec as longs, binary stays raw bytes, strings wrap
    // zero-copy as UTF8String
    val decoded: Array[Int => Any] = p.readSchema.fields.map { f =>
      if (f.name == "_part_id") {
        val v = java.lang.Integer.valueOf(gd.pid)
        (_: Int) => v: Any
      } else f.dataType match {
        case TimestampType | LongType =>
          val (us, ok) = IntBlockCodec.decodeNullable(gd.cols(f.name))
          (i: Int) => if (ok(i)) java.lang.Long.valueOf(us(i)) else null
        case IntegerType =>
          val (vs, ok) = IntBlockCodec.decodeNullable(gd.cols(f.name))
          (i: Int) => if (ok(i)) java.lang.Integer.valueOf(vs(i).toInt) else null
        case ShortType =>
          val (vs, ok) = IntBlockCodec.decodeNullable(gd.cols(f.name))
          (i: Int) => if (ok(i)) java.lang.Short.valueOf(vs(i).toShort) else null
        case ByteType =>
          val (vs, ok) = IntBlockCodec.decodeNullable(gd.cols(f.name))
          (i: Int) => if (ok(i)) java.lang.Byte.valueOf(vs(i).toByte) else null
        case BinaryType =>
          val vs = StringBlockCodec.decode(gd.cols(f.name))
          (i: Int) => vs(i)
        case _ =>
          val vs = StringBlockCodec.decode(gd.cols(f.name))
          (i: Int) => if (vs(i) == null) null else UTF8String.fromBytes(vs(i))
      }
    }
    (0 until gd.n).iterator.map { i =>
      val row = new GenericInternalRow(decoded.length)
      var j = 0
      while (j < decoded.length) { row.update(j, decoded(j)(i)); j += 1 }
      row
    }
  }

  override def next(): Boolean = {
    // pushed limit: stop pulling (and decoding) further groups once this task
    // has produced enough rows — Spark's GlobalLimit still trims exactly
    if (p.limit >= 0 && produced >= p.limit) return false
    while (!pending.hasNext) {
      if (done) return false
      val gd = stream.nextGroup()
      if (gd == null) { done = true; return false }
      pending = decodeGroup(gd)
    }
    current = pending.next()
    produced += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}

/**
 * Columnar reader: each 64Ki-row block group becomes ONE ColumnarBatch —
 * decoded column arrays fill OnHeapColumnVectors directly (no per-row
 * InternalRow/boxing), and Spark's ColumnarToRow/WholeStageCodegen consumes
 * the batch with vectorized access.
 */
object GraftColumnarReader {
  /** Per-batch byte ceiling per column — `private[v2]` var so tests can force
    * the group-splitting path without a multi-GB fixture. */
  private[v2] var MaxBatchColumnBytes: Long = 256L << 20
}

final class GraftColumnarReader(p: GraftInputPartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val countOnly = p.columns.isEmpty
  private val readCols: Array[String] = if (countOnly) Array(p.refColumn) else p.columns
  private val stream = new BlockGroupStream(p, readCols, countOnly)
  // single source of truth for field types: the scan's read schema (pruned
  // from the store's persisted schema)
  private val schema: StructType = p.readSchema

  /** Per-batch byte ceiling per column: OnHeapColumnVector backs variable-width
    * values with ONE contiguous byte array (hard ~2GB JVM limit), so a 64Ki-row
    * group of huge blobs must split across batches. */
  private def maxBatchColumnBytes: Long = GraftColumnarReader.MaxBatchColumnBytes

  private var current: ColumnarBatch = _
  private var pendingBatches: Iterator[ColumnarBatch] = Iterator.empty
  private var done = false
  private var produced = 0L

  /** Decode a group into one or more batches (split when any column's decoded
    * bytes would exceed [[MaxBatchColumnBytes]] in one contiguous child). */
  private def toBatches(gd: BlockGroupStream#GroupData): Iterator[ColumnarBatch] = {
    if (countOnly)
      return Iterator.single(new ColumnarBatch(Array.empty[ColumnVector], gd.n))
    @inline def isIntFamily(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case TimestampType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val decodedStr: Map[String, Array[Array[Byte]]] =
      schema.fields.iterator.filterNot(f => isIntFamily(f.dataType))
        .map(f => f.name -> StringBlockCodec.decode(gd.cols(f.name))).toMap
    val decodedInt: Map[String, (Array[Long], Array[Boolean])] =
      schema.fields.iterator.filter(f => isIntFamily(f.dataType))
        .map(f => f.name -> IntBlockCodec.decodeNullable(gd.cols(f.name))).toMap
    // worst per-row byte estimate over string/binary columns drives the split
    val colBytes: Map[String, Long] =
      decodedStr.map { case (c, vs) =>
        var t = 0L; var i = 0
        while (i < vs.length) { if (vs(i) != null) t += vs(i).length; i += 1 }
        c -> t
      }
    val maxCol = if (colBytes.isEmpty) 0L else colBytes.values.max
    val slices: Seq[(Int, Int)] =
      if (maxCol <= maxBatchColumnBytes) Seq((0, gd.n))
      else {
        // slice on ACTUAL per-row bytes, not the mean: a skewed group (one run
        // of giant blobs among small rows) sliced by maxCol/n can still pack
        // >2GiB into one slice — total.toInt then goes negative, the reserve is
        // skipped, and putByteArray growth dies at the 2GiB child-array limit
        val cols = decodedStr.values.toArray
        val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        val run = new Array[Long](cols.length)
        var start = 0
        var i = 0
        while (i < gd.n) {
          var overflow = false
          var c = 0
          while (c < cols.length && !overflow) {
            val v = cols(c)(i)
            if (run(c) + (if (v == null) 0L else v.length.toLong) > maxBatchColumnBytes)
              overflow = true
            c += 1
          }
          if (overflow && i > start) { // a single over-ceiling row still gets its own slice
            out += ((start, i)); start = i; java.util.Arrays.fill(run, 0L)
          }
          c = 0
          while (c < cols.length) {
            val v = cols(c)(i); run(c) += (if (v == null) 0L else v.length.toLong); c += 1
          }
          i += 1
        }
        out += ((start, gd.n))
        out.toSeq
      }
    slices.iterator.map { case (from, until) =>
      val n = until - from
      val vectors = OnHeapColumnVector.allocateColumns(n, schema)
      var j = 0
      while (j < p.columns.length) {
        val vec = vectors(j)
        val f = schema.fields(j)
        f.dataType match {
          case TimestampType | LongType | IntegerType | ShortType | ByteType =>
            val (vals, ok) = decodedInt(f.name)
            val put: (Int, Long) => Unit = f.dataType match {
              case IntegerType => (i, v) => vec.putInt(i, v.toInt)
              case ShortType => (i, v) => vec.putShort(i, v.toShort)
              case ByteType => (i, v) => vec.putByte(i, v.toByte)
              case _ => (i, v) => vec.putLong(i, v)
            }
            var i = 0
            while (i < n) {
              if (ok(from + i)) put(i, vals(from + i)) else vec.putNull(i)
              i += 1
            }
          case _ =>
            val c = f.name
            val vs = decodedStr(c)
            // one upfront child reserve: per-value growth doubles-and-copies
            // the contiguous array ~a dozen times per multi-MB column otherwise
            var total = 0L; var i = 0
            while (i < n) { if (vs(from + i) != null) total += vs(from + i).length; i += 1 }
            // slicing bounds total at max(maxBatchColumnBytes, one row); only a
            // misconfigured >2GiB MaxBatchColumnBytes can breach — fail loudly,
            // a negative toInt here would skip the reserve and corrupt later
            require(total <= Int.MaxValue, s"columnar batch column '$c' needs " +
              s"$total contiguous bytes (> 2GiB JVM array limit); lower " +
              "GraftColumnarReader.MaxBatchColumnBytes or use the row path")
            vec.arrayData().reserve(total.toInt)
            i = 0
            while (i < n) {
              val b = vs(from + i)
              if (b == null) vec.putNull(i) else vec.putByteArray(i, b)
              i += 1
            }
        }
        j += 1
      }
      new ColumnarBatch(vectors.map(v => v: ColumnVector), n)
    }
  }

  override def next(): Boolean = {
    if (current != null) { current.close(); current = null }
    // pushed limit: whole batches only (the limit is partial — Spark trims)
    if (p.limit >= 0 && produced >= p.limit) return false
    while (!pendingBatches.hasNext) {
      if (done) return false
      val gd = stream.nextGroup()
      if (gd == null) { done = true; return false }
      pendingBatches = toBatches(gd)
    }
    current = pendingBatches.next()
    produced += current.numRows()
    true
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = {
    if (current != null) { current.close(); current = null }
    stream.close()
  }
}
