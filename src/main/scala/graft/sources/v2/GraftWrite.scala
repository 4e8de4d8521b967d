package graft.sources.v2

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.jobs.{BlockRow, EncodeJob}
import graft.sources.SnapshotStore

/**
 * DataSource V2 WRITE path: `df.write.format("graft").mode("append").save(root)`
 * and SQL `INSERT INTO` (over a `USING graft` relation) run the SAME staged
 * encode-and-commit pipeline as [[graft.jobs.EncodeJob]] — fully distributed,
 * with no inner Spark job:
 *
 *  - **Distribution/ordering** ([[RequiresDistributionAndOrdering]]): Spark is
 *    asked for a RANGE distribution on `url` with url-ascending order inside
 *    each partition — the V2 equivalent of the batch job's explicit sampled
 *    boundaries + sortWithinPartitions. Blocks therefore carry tight
 *    url min/max metadata, so the prefix/range pruning the read paths rely on
 *    works identically on SQL-written data.
 *  - **Each task IS an encode kernel**: the partition's rows stream through the
 *    same per-block buffering and [[EncodeJob.flushBlock]] codec auto-selection,
 *    and the task writes its own block parquet file (same schema as the batch
 *    writer's, one file per task) straight into a staged data dir. Commit
 *    messages carry the per-part lineage rollup (rows, orig/enc bytes, per-
 *    column codecs) computed in-task — no post-write metrics job.
 *  - **Exactly-once commit**: tasks stage attempt-unique files under a
 *    dot-prefixed in-progress name (invisible to all readers) and atomically
 *    rename at task commit — a zombie attempt flushing bytes after the fact
 *    can never surface in a live dir. The driver's [[GraftBatchWrite.commit]]
 *    additionally deletes any staged file NOT named in a commit message, then
 *    atomically commits the manifest (append, or replace-all for
 *    `mode("overwrite")` via [[SupportsTruncate]]). A crash before commit
 *    leaves only an orphaned staging dir for the expiry sweep — the store
 *    never sees partial writes.
 *
 * Part-id namespace: each SQL write allocates fresh part ids above every
 * committed (and tombstoned) id — appends never collide with prior work
 * units. Writer-mixing rules, enforced: a streaming-encoded store REFUSES SQL
 * appends (they would occupy future batches' ids — see the require in
 * [[GraftBatchWrite]]), and streaming refuses non-fresh stores
 * (StreamingEncode.checkStreamParts). `EncodeJob.run` on a SQL-grown store is
 * safe but inert for ids it considers committed (resume-by-part-id semantics).
 */
final class GraftWriteBuilder(root: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var replaceAll = false

  override def truncate(): WriteBuilder = { replaceAll = true; this }

  override def build(): Write = {
    val s = info.schema()
    // the store's persisted schema (SCHEMA sidecar, written by the catalog's
    // CREATE TABLE / the first commit), else the webtext default
    val expected = GraftDataSource.storeSchema(root)
    require(s.fields.map(f => (f.name, f.dataType)).toSeq ==
        expected.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft table schema is ${expected.simpleString}; cannot write ${s.simpleString}")
    // pre-arranged by GraftWriteArrangeRule: the query already carries the
    // bucket exchange + sort-key sort, so requiring a distribution here would
    // stack a second (range, full-double-compute) exchange on top
    new GraftWrite(root, replaceAll,
      arranged = info.options.getBoolean(graft.plans.GraftWriteArrangeRule.ArrangedKey, false),
      schema = expected)
  }
}

/** Layout/sizing pieces shared by every write path into a store — the batch
  * append ([[GraftWrite]]) and the copy-on-write rewrite
  * ([[GraftCowWrite]]). One definition: a fix to the distribution contract or
  * the partitions-conf validation must not have to land twice. */
private[graft] object GraftWriteLayout {
  /** Range-partition + sort on url: the WEBTEXT store's physical layout
    * invariant (kept for the webtext-only row-level rewrite path). */
  val UrlOrdered: Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("url"), SortDirection.ASCENDING))

  def urlDistribution: Distribution = Distributions.ordered(UrlOrdered)

  /** Generalized layout: range-partition + sort on the schema's sort key (the
    * first string column, else the first column — GraftDataSource.sortKeyOf). */
  def sortOrderFor(schema: org.apache.spark.sql.types.StructType): Array[SortOrder] =
    Array(Expressions.sort(
      Expressions.column(GraftDataSource.sortKeyOf(schema).name), SortDirection.ASCENDING))

  def distributionFor(schema: org.apache.spark.sql.types.StructType): Distribution =
    Distributions.ordered(sortOrderFor(schema))

  /** `spark.graft.write.partitions`, validated; 0 = unset (Spark/AQE sizes the
    * exchange). See [[GraftWrite.requiredNumPartitions]] for why big writes
    * need the explicit count. */
  def confWritePartitions(): Int =
    org.apache.spark.sql.SparkSession.active.conf
      .getOption("spark.graft.write.partitions").map { s =>
        val n = try s.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.write.partitions must be a positive int, got '$s'")
        }
        require(n > 0, s"spark.graft.write.partitions must be positive, got $n")
        n
      }.getOrElse(0)

  /** Exactly-once commit sweep: delete any staged file no commit message
    * names (crashed/zombie attempts), then — if the whole staging is unused —
    * the empty dir itself when `dropDirIfEmpty`. */
  def sweepStrays(absDir: String, committedNames: Set[String],
                  dropDirIfEmpty: Boolean = false): Unit = {
    val dir = Paths.get(absDir)
    if (Files.exists(dir)) {
      SnapshotStore.listFileNames(dir).filterNot(committedNames)
        .foreach(f => Files.deleteIfExists(dir.resolve(f)))
      if (dropDirIfEmpty && SnapshotStore.listFileNames(dir).isEmpty)
        Files.deleteIfExists(dir)
    }
  }

  /** Abort cleanup: drop the whole staging dir and its contents. */
  def dropStaging(absDir: String): Unit = {
    val dir = Paths.get(absDir)
    if (Files.exists(dir)) {
      SnapshotStore.listFileNames(dir).foreach(f => Files.deleteIfExists(dir.resolve(f)))
      Files.deleteIfExists(dir)
    }
  }

  /** Manifest entries from the tasks' commit messages (empty tasks dropped). */
  def entriesFrom(msgs: Array[GraftWriterCommitMessage],
                  relDir: String): Seq[SnapshotStore.PartEntry] =
    msgs.iterator.filter(_.nRows > 0).map { m =>
      SnapshotStore.PartEntry(m.partId, relDir, m.nRows, m.origBytes, m.encBytes,
        m.codecsJson)
    }.toSeq
}

final class GraftWrite(root: String, replaceAll: Boolean, arranged: Boolean = false,
    schema: StructType = GraftDataSource.PageSchema)
    extends Write with RequiresDistributionAndOrdering {

  // range-partition + sort on the schema's sort key: the store's physical
  // layout invariant. `arranged` = GraftWriteArrangeRule already injected the
  // (cheaper, sample-free) bucket exchange + sort into the query — ask for
  // nothing, or Spark stacks a second exchange with a full-double-compute
  // sample pass
  override def requiredDistribution(): Distribution =
    if (arranged) Distributions.unspecified() else GraftWriteLayout.distributionFor(schema)

  override def requiredOrdering(): Array[SortOrder] =
    if (arranged) Array.empty else GraftWriteLayout.sortOrderFor(schema)

  /** Writer task count. Default 0 lets Spark size the range exchange
    * (shuffle partitions / AQE) — right for everyday appends. For BIG writes
    * set `spark.graft.write.partitions` so each task lands ~16-64MB of rows:
    * AQE can only COALESCE a range exchange, never split it, so a 100GB write
    * over the default 32 shuffle partitions would stack GBs of sorted rows
    * per task on top of the kernel's 64MB block buffer and parquet's
    * row-group buffer and OOM a lean executor (measured at the 5M-page
    * checkpoint: 32 × 360MB on an 8g heap died; 512-way, the batch job's own
    * sizing, encodes comfortably). This mirrors EncodeJob.run's explicit
    * `parts` — partition count is the one knob an engine cannot infer at
    * write-plan time because the input's size is unknown there. */
  override def requiredNumPartitions(): Int = {
    if (arranged) return 0 // count lives in the injected exchange
    // a store ever written by a STREAM has its width pinned in STREAM_PARTS —
    // a restarted stream must always ask Spark for exactly that width, never
    // the session conf (setting spark.graft.write.partitions for an unrelated
    // big batch write would otherwise change info.numPartitions() at the next
    // epoch replan and checkStreamParts would kill the stream; same if the
    // conf was set at first start and later unset)
    graft.streaming.StreamingEncode.pinnedStreamParts(root)
      .getOrElse(GraftWriteLayout.confWritePartitions())
  }

  /** When Spark sizes the exchange itself (partitions conf unset), ask AQE to
    * coalesce toward one block bound per task — small appends then produce few
    * well-sized files instead of shuffle-partition-many tiny ones. Spark
    * rejects a write that pins BOTH a partition count and an advisory size,
    * so this yields 0 (unset) whenever the count conf is in force. */
  override def advisoryPartitionSizeInBytes(): Long =
    if (arranged || requiredNumPartitions() > 0) 0L else 64L << 20

  override def toBatch: BatchWrite = {
    // fired-evidence hook: count arranged writes at EXECUTION — toBatch is
    // invoked by the write exec's run(), never by planning, so an
    // `EXPLAIN INSERT` (which analyzes the command and fires the arrange
    // rule) does not pollute the counter with writes that never ran
    if (arranged) graft.plans.GraftWriteArrangeRule.arranged.incrementAndGet()
    new GraftBatchWrite(root, replaceAll, schema)
  }

  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(!arranged,
      s"${graft.plans.GraftWriteArrangeRule.ArrangedKey} is an internal batch-write " +
      "marker; a streaming write must keep its distribution requirement (the " +
      "STREAM_PARTS width pin rides on it) — drop the option")
    require(!replaceAll,
      "graft streaming write supports APPEND output mode only (complete/update " +
      "would truncate the store every epoch)")
    new GraftStreamingWrite(root, schema)
  }

  override def description(): String =
    s"GraftStore root=$root mode=${if (replaceAll) "truncate" else "append"}"
}

final case class GraftWriterCommitMessage(
    partId: Int,
    fileName: String, // null when the task saw no rows (no file written)
    nRows: Long,
    origBytes: Long,
    encBytes: Long,
    codecsJson: String) extends WriterCommitMessage

final class GraftBatchWrite(root: String, replaceAll: Boolean,
    schema: StructType = GraftDataSource.PageSchema) extends BatchWrite {

  // a streaming-encoded store reserves the WHOLE upward id space as its
  // batchId*parts namespace: a SQL append at max+1 would occupy a future
  // batch's ids and that batch would be silently dropped by the resume
  // anti-join — refuse loudly instead (the reverse direction is guarded in
  // StreamingEncode.checkStreamParts)
  require(!java.nio.file.Files.exists(Paths.get(root, "STREAM_PARTS")),
    s"store at $root is written by a streaming encode (STREAM_PARTS pins its " +
    "batchId*parts id namespace); a SQL append would poison future batches' " +
    "part ids and their rows would be silently dropped — keep streaming into " +
    "it, or write to a separate store")

  // staged on the DRIVER at factory creation: one data dir per write, fresh
  // part-id namespace above everything committed or tombstoned
  private val (relDir, absDir) = SnapshotStore.newDataDir(root)
  private val partOffset: Int = {
    val used = SnapshotStore.committedPartIds(root)
    if (used.isEmpty) 0 else used.max + 1
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftDataWriterFactory(absDir, partOffset,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()), schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the store is self-describing from its first commit on: later reads,
    // writes, and the arrange rule all key off the persisted schema (absent =
    // the webtext default, so persisting it for webtext too is just explicit)
    if (GraftDataSource.persistedSchema(root).isEmpty)
      GraftDataSource.writeSchemaSidecar(root, schema)
    val msgs = messages.map(_.asInstanceOf[GraftWriterCommitMessage])
    // exactly-once: a crashed/zombie attempt may have left a file no commit
    // message names — it must not be readable through the manifest's dir scan
    GraftWriteLayout.sweepStrays(absDir,
      msgs.iterator.filter(_.fileName != null).map(_.fileName).toSet)
    val entries = GraftWriteLayout.entriesFrom(msgs, relDir)
    if (entries.isEmpty && !replaceAll) {
      // empty append: nothing to commit, drop the unused staging dir
      GraftWriteLayout.sweepStrays(absDir, Set.empty, dropDirIfEmpty = true)
      return
    }
    val replaced: Set[Int] =
      if (replaceAll) SnapshotStore.currentEntries(root).map(_.partId).toSet
      else Set.empty
    SnapshotStore.commitReplacing(root, entries, replaced)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftWriteLayout.dropStaging(absDir)
}

final case class GraftDataWriterFactory(absDir: String, partOffset: Int,
    conf: org.apache.spark.util.SerializableConfiguration,
    schema: StructType = GraftDataSource.PageSchema)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(absDir, partOffset + partitionId, partitionId, taskId, conf, schema)
}

/**
 * Native Structured Streaming sink: `df.writeStream.format("graft")
 * .start(root)` — each epoch (micro-batch) runs the same per-task encode
 * kernels and ends in one atomic manifest commit, exactly-once:
 *
 *  - The part-id namespace is `epochId * parts + partitionId` with `parts`
 *    PINNED in the STREAM_PARTS sidecar (the same contract as
 *    [[graft.streaming.StreamingEncode.encodeStream]], and the writer count is
 *    enforced via [[RequiresDistributionAndOrdering.requiredNumPartitions]]).
 *  - A REPLAYED epoch (engine restart after a commit) re-stages into a fresh
 *    dir, and [[GraftStreamingWrite.commit]] detects its part ids already in
 *    the manifest — the duplicate staging is dropped, nothing double-commits.
 *  - Task attempts stage dot-named `.inprogress` files renamed at task commit
 *    (the batch writer's zombie discipline), and the epoch commit sweeps
 *    unnamed strays before the manifest swap.
 */
/** Per-epoch original row totals, persisted at commit (`EPOCH_ROWS` sidecar:
  * one `"<epochId> <rows>"` line per committed epoch). This is what keeps
  * replay verification EXACT for the life of the store: the manifest-based
  * fallback loses the original totals once a compaction + expiry rewrites
  * history, and an unverifiable replay would force a choice between silently
  * dropping possibly-new rows and falsely killing genuine replays. ~16 bytes
  * per epoch — a year of minutely epochs is ~8 MB. Driver-only, single writer
  * per store (the same discipline as every sidecar), tmp + ATOMIC_MOVE. */
private[graft] object EpochRows {
  import java.nio.charset.StandardCharsets.UTF_8

  private def path(root: String) = Paths.get(root, "EPOCH_ROWS")

  def lookup(root: String, epochId: Long): Option[Long] = {
    val p = path(root)
    if (!Files.exists(p)) None
    else Files.readAllLines(p, UTF_8).asScala.iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf(' ')
        (l.substring(0, i).toLong, l.substring(i + 1).toLong)
      }
      .collectFirst { case (e, n) if e == epochId => n }
  }

  def record(root: String, epochId: Long, rows: Long): Unit = {
    val p = path(root)
    if (lookup(root, epochId).isDefined) return // replays never re-commit
    val prev = if (Files.exists(p)) new String(Files.readAllBytes(p), UTF_8) else ""
    SnapshotStore.writeSidecar(root, "EPOCH_ROWS", prev + s"$epochId $rows\n")
  }

  /** The epoch's committed ORIGINAL row total for namespace [lo, hi): the
    * sidecar when present, else the oldest retained manifest still listing the
    * epoch's ids un-tombstoned (a manifest that already tombstoned part of the
    * epoch lists only a PARTIAL total — unusable). Shared by BOTH streaming
    * sinks' replay verification; callers should [[record]] a recovered total
    * back (a crash between manifest commit and record() otherwise leaves the
    * verification window open until compaction+expiry erase the evidence). */
  def originalTotal(root: String, epochId: Long, lo: Long, hi: Long): Option[Long] =
    lookup(root, epochId).orElse {
      SnapshotStore.snapshotIds(root).iterator
        .map { sid =>
          val inRange = SnapshotStore.entriesAt(root, sid)
            .filter(e => e.partId >= lo && e.partId < hi)
          val partial = SnapshotStore.tombstonesAt(root, sid)
            .exists(id => id >= lo && id < hi)
          (inRange, partial)
        }
        .find(_._1.nonEmpty)
        .collect { case (orig, false) => orig.iterator.map(_.nRows).sum }
    }
}

final class GraftStreamingWrite(root: String,
    schema: StructType = GraftDataSource.PageSchema)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  // one uuid per query RUN: replayed epochs in a new run stage into new dirs
  // (the old run's dir is either committed — replay skipped — or orphaned for
  // the expiry sweep)
  private val runUuid = java.util.UUID.randomUUID().toString

  private def relDir(epochId: Long): String = s"data/stream-$runUuid-e$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val parts = info.numPartitions()
    // pin (or validate) the epoch namespace width — also refuses stores
    // already grown by batch/SQL appends (ids 0..parts-1 look committed and
    // epoch 0 would silently vanish)
    graft.streaming.StreamingEncode.checkStreamParts(root, parts)
    if (GraftDataSource.persistedSchema(root).isEmpty)
      GraftDataSource.writeSchemaSidecar(root, schema) // self-describing store
    GraftStreamingDataWriterFactory(root, runUuid, parts,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()), schema)
  }

  private def absDir(epochId: Long): String = Paths.get(root, relDir(epochId)).toString

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[GraftWriterCommitMessage])
    GraftWriteLayout.sweepStrays(absDir(epochId),
      msgs.iterator.filter(_.fileName != null).map(_.fileName).toSet)
    val entries = GraftWriteLayout.entriesFrom(msgs, relDir(epochId))
    if (entries.isEmpty) { // empty epoch: nothing to commit
      GraftWriteLayout.sweepStrays(absDir(epochId), Set.empty, dropDirIfEmpty = true)
      return
    }
    // replayed epoch: its deterministic ids are already in the manifest — the
    // rows are committed, so the duplicate staging is dropped. But an id
    // overlap alone does NOT prove a replay: a FRESH checkpoint over a grown
    // source re-delivers committed data MIXED WITH NEW ROWS inside the same
    // epoch namespace, and dropping that would silently lose the new rows.
    // Verify by row count: each epoch is one atomic commit, so equal totals =
    // replay (the range exchange may re-split the same rows differently, so
    // ids/per-part counts can drift; the SUM cannot). The original total comes
    // from the EPOCH_ROWS sidecar (exact for the life of the store); stores
    // streamed before the sidecar existed fall back to the oldest surviving
    // manifest holding the epoch's ids — entries are immutable until
    // tombstoned, so that manifest lists the original total unless a
    // compaction already rewrote it.
    val committed = SnapshotStore.committedPartIds(root)
    if (entries.exists(e => committed(e.partId))) {
      val parts = graft.streaming.StreamingEncode.pinnedStreamParts(root)
        .getOrElse(throw new IllegalStateException(
          s"store at $root has committed stream epochs but no STREAM_PARTS sidecar"))
      val lo = epochId * parts
      val hi = lo + parts
      val stagedRows = entries.iterator.map(_.nRows).sum
      EpochRows.originalTotal(root, epochId, lo, hi) match {
        case Some(origRows) =>
          if (origRows != stagedRows) throw new IllegalStateException(
            s"stream epoch $epochId stages $stagedRows rows but its committed " +
            s"namespace [$lo, $hi) holds $origRows — this checkpoint does not " +
            "match the store (a fresh checkpoint over a grown source packs new " +
            "rows into already-committed epochs, and committing OR dropping " +
            "them would corrupt the store). Restart from the original " +
            "checkpoint, or stream into a fresh store")
          // verified replay recovered via the manifest fallback: backfill the
          // sidecar so a later compaction+expiry cannot reopen the window (a
          // crash between the original commit and record() lands here)
          EpochRows.record(root, epochId, origRows)
        case None =>
          // pre-sidecar store whose epoch entries were compacted away before
          // this replay arrived — the original total is gone, so the replay
          // cannot be verified; dropping is the only lossless-for-replays
          // choice, flag it for the operator (new stores never get here:
          // EPOCH_ROWS outlives compaction and expiry)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"stream epoch $epochId replays ids in [$lo, $hi) whose committed " +
            "entries were compacted/expired and which predates the EPOCH_ROWS " +
            "sidecar; dropping the staging UNVERIFIED " +
            s"($stagedRows staged rows assumed already committed)")
      }
      GraftWriteLayout.dropStaging(absDir(epochId))
      return
    }
    SnapshotStore.commit(root, entries)
    EpochRows.record(root, epochId, entries.iterator.map(_.nRows).sum)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftWriteLayout.dropStaging(absDir(epochId))
}

final case class GraftStreamingDataWriterFactory(root: String, runUuid: String,
    parts: Int, conf: org.apache.spark.util.SerializableConfiguration,
    schema: StructType = GraftDataSource.PageSchema)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    // deterministic epoch namespace (the replay-idempotence key); guard the
    // Int range like EncodeJob.run — a wrapped id would collide silently
    val offset = epochId * parts
    require(offset >= 0 && offset + parts <= Int.MaxValue.toLong,
      s"stream epoch namespace [$offset, ${offset + parts}) exceeds the Int range")
    // a partition index at/above the pinned width would collide with the NEXT
    // epoch's ids (possible only if shuffle.partitions changed mid-run)
    require(partitionId < parts,
      s"writer partition $partitionId exceeds the pinned stream width $parts")
    val absDir = Paths.get(root, s"data/stream-$runUuid-e$epochId").toString
    new GraftDataWriter(absDir, offset.toInt + partitionId, partitionId, taskId, conf,
      schema)
  }
}

object GraftDataWriter {
  /** Test hook (single-JVM/local only): when set, exactly ONE writer task
    * throws mid-write after staging a partial file — drives the task-retry
    * abort/cleanup path deterministically. */
  private[v2] val failNextWriteOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The block-file schema, byte-compatible with what Spark writes for
    * `Dataset[BlockRow]` in [[EncodeJob.stageEncode]] (standard 3-level lists,
    * UTF8-annotated strings) — verified against a staged file's footer. */
  private[v2] val BlockFileSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  required int32 part_id;
      |  required int32 block_seq;
      |  optional binary column (UTF8);
      |  optional binary typ (UTF8);
      |  optional binary codec (UTF8);
      |  required int32 n;
      |  required int32 n_nulls;
      |  optional int64 block_min;
      |  optional int64 block_max;
      |  optional int64 block_sum;
      |  optional group block_dict (LIST) {
      |    repeated group list {
      |      required int64 element;
      |    }
      |  }
      |  optional binary block_str_min (UTF8);
      |  optional binary block_str_max (UTF8);
      |  optional group block_str_dict (LIST) {
      |    repeated group list {
      |      optional binary element (UTF8);
      |    }
      |  }
      |  optional group block_str_dict_counts (LIST) {
      |    repeated group list {
      |      required int64 element;
      |    }
      |  }
      |  required int64 orig_bytes;
      |  required int64 enc_bytes;
      |  optional binary encoded;
      |}""".stripMargin)
}

/**
 * One task's encode kernel: buffers the (sort-key-ordered) partition rows into
 * bounded blocks — the same 64Ki-row / [[EncodeJob.MaxBlockBytes]] flush rule
 * as [[EncodeJob.encodePartition]], push-style — and appends each flushed
 * block's column rows to this task's own parquet file. Memory is one block
 * in flight; the file is attempt-unique so speculative twins cannot collide.
 * Columns are SCHEMA-DRIVEN: strings get textual bounds/dict metadata, binary
 * is opaque, timestamps ride as epoch micros, and the integer family encodes
 * through the width-matched physical codec (i64/i32/i16/i8).
 */
final class GraftDataWriter(absDir: String, partId: Int, partitionId: Int, taskId: Long,
    conf: org.apache.spark.util.SerializableConfiguration =
      new org.apache.spark.util.SerializableConfiguration(
        new org.apache.hadoop.conf.Configuration()),
    schema: StructType = GraftDataSource.PageSchema)
    extends DataWriter[InternalRow] {
  import graft.jobs.EncodeJob.{BlockSize, MaxBlockBytes}

  // attempt-unique name: partitionId for human mapping, taskId disambiguates
  // retries/speculation (the driver keeps only files named in commit messages)
  private val fileName = s"part-$partitionId-task-$taskId.parquet"
  // staged under a dot-prefixed in-progress name, renamed at task commit: a
  // ZOMBIE attempt (stalled task whose executor dies without abort) can flush
  // parquet bytes AFTER the driver's stray-file sweep — under the final name
  // that file would sit in a now-live dir and decode as duplicate groups; a
  // dot-file is invisible to every reader (packPartitions and spark.read both
  // skip "."-prefixed files), and only a coordinator-approved task commit ever
  // renames (the same _temporary-then-rename discipline as Spark's committers)
  private val inProgressName = s".$fileName.inprogress"

  private var writer: ParquetWriter[Group] = _
  private val factory = new SimpleGroupFactory(GraftDataWriter.BlockFileSchema)

  // ---- schema-driven block buffers (mirrors EncodeJob.encodePartition) ----
  private val fields = schema.fields
  // per field: a byte-array buffer (string/binary) OR a long+valid buffer (ints)
  private val strBufs = new Array[java.util.ArrayList[Array[Byte]]](fields.length)
  private val textual = new Array[Boolean](fields.length)
  private val longBufs = new Array[Array[Long]](fields.length)
  private val validBufs = new Array[Array[Boolean]](fields.length)
  private val intKind = new Array[graft.core.PhysicalIntType](fields.length)
  fields.zipWithIndex.foreach { case (f, i) =>
    f.dataType match {
      case org.apache.spark.sql.types.StringType =>
        strBufs(i) = new java.util.ArrayList[Array[Byte]](BlockSize); textual(i) = true
      case org.apache.spark.sql.types.BinaryType =>
        strBufs(i) = new java.util.ArrayList[Array[Byte]](BlockSize)
      case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.LongType =>
        longBufs(i) = new Array[Long](BlockSize); validBufs(i) = new Array[Boolean](BlockSize)
        intKind(i) = graft.core.PhysicalIntType.I64
      case org.apache.spark.sql.types.IntegerType =>
        longBufs(i) = new Array[Long](BlockSize); validBufs(i) = new Array[Boolean](BlockSize)
        intKind(i) = graft.core.PhysicalIntType.I32
      case org.apache.spark.sql.types.ShortType =>
        longBufs(i) = new Array[Long](BlockSize); validBufs(i) = new Array[Boolean](BlockSize)
        intKind(i) = graft.core.PhysicalIntType.I16
      case org.apache.spark.sql.types.ByteType =>
        longBufs(i) = new Array[Long](BlockSize); validBufs(i) = new Array[Boolean](BlockSize)
        intKind(i) = graft.core.PhysicalIntType.I8
      case other => throw new IllegalArgumentException(
        s"unsupported graft column type ${f.name} ${other.simpleString}")
    }
  }
  private var blockSeq = 0
  private var n = 0
  private var bufBytes = 0L

  // ---- per-part lineage rollup (computed in-task; no metrics job) ----
  private var rows = 0L
  private var origBytes = 0L
  private var encBytes = 0L
  private val codecsByColumn = scala.collection.mutable.Map.empty[String,
    scala.collection.mutable.TreeSet[String]]

  @inline private def lenOf(b: Array[Byte]): Int = if (b == null) 0 else b.length

  private def openWriter(): Unit = {
    val path = new Path(new Path(absDir), inProgressName)
    writer = ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(path, conf.value))
      .withType(GraftDataWriter.BlockFileSchema)
      // `encoded` dominates and is already codec-compressed high-entropy bytes;
      // snappy over it costs CPU for ~0 size win (same choice as stageEncode)
      .withCompressionCodec(CompressionCodecName.UNCOMPRESSED)
      // bound per-task memory: parquet buffers a whole row group in heap
      // (uncompressed), and this writer already holds a MaxBlockBytes block
      // buffer — the 128MB default × many concurrent tasks OOMs a default
      // executor at web-page row sizes (measured at the 5M-page checkpoint).
      // Smaller row groups also TIGHTEN read-side pruning: the part/seq
      // In-filters skip at row-group granularity
      .withRowGroupSize(32L << 20)
      .build()
  }

  private def toGroup(b: BlockRow): Group = {
    val g = factory.newGroup()
    g.add("part_id", b.part_id)
    g.add("block_seq", b.block_seq)
    g.add("column", b.column)
    g.add("typ", b.typ)
    g.add("codec", b.codec)
    g.add("n", b.n)
    g.add("n_nulls", b.n_nulls)
    b.block_min.foreach(v => g.add("block_min", v))
    b.block_max.foreach(v => g.add("block_max", v))
    b.block_sum.foreach(v => g.add("block_sum", v))
    b.block_dict.foreach { vs =>
      val lg = g.addGroup("block_dict")
      vs.foreach(v => lg.addGroup("list").add("element", v))
    }
    b.block_str_min.foreach(v => g.add("block_str_min", v))
    b.block_str_max.foreach(v => g.add("block_str_max", v))
    b.block_str_dict.foreach { vs =>
      val lg = g.addGroup("block_str_dict")
      vs.foreach(v => lg.addGroup("list").add("element", v))
    }
    b.block_str_dict_counts.foreach { vs =>
      val lg = g.addGroup("block_str_dict_counts")
      vs.foreach(v => lg.addGroup("list").add("element", v))
    }
    g.add("orig_bytes", b.orig_bytes)
    g.add("enc_bytes", b.enc_bytes)
    g.add("encoded", org.apache.parquet.io.api.Binary.fromConstantByteArray(b.encoded))
    g
  }

  private def flush(): Unit = {
    if (n == 0) return
    if (writer == null) openWriter()
    var i = 0
    while (i < fields.length) {
      val b =
        if (strBufs(i) != null)
          EncodeJob.strBlockRow(partId, blockSeq, fields(i).name, strBufs(i), textual(i))
        else
          EncodeJob.intBlockRow(partId, blockSeq, fields(i).name,
            longBufs(i), validBufs(i), n, intKind(i))
      writer.write(toGroup(b))
      origBytes += b.orig_bytes
      encBytes += b.enc_bytes
      codecsByColumn.getOrElseUpdate(b.column,
        scala.collection.mutable.TreeSet.empty[String]) ++= b.codec.split('+')
      if (strBufs(i) != null) strBufs(i).clear()
      i += 1
    }
    rows += n
    n = 0; bufBytes = 0L; blockSeq += 1
  }

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < fields.length) {
      if (strBufs(i) != null) {
        val v =
          if (row.isNullAt(i)) null
          else if (textual(i)) row.getUTF8String(i).getBytes
          else row.getBinary(i)
        strBufs(i).add(v)
        bufBytes += lenOf(v)
      } else {
        if (row.isNullAt(i)) { longBufs(i)(n) = 0L; validBufs(i)(n) = false }
        else {
          longBufs(i)(n) = fields(i).dataType match {
            case org.apache.spark.sql.types.IntegerType => row.getInt(i).toLong
            case org.apache.spark.sql.types.ShortType => row.getShort(i).toLong
            case org.apache.spark.sql.types.ByteType => row.getByte(i).toLong
            case _ => row.getLong(i) // timestamp micros / bigint
          }
          validBufs(i)(n) = true
        }
        bufBytes += 8L
      }
      i += 1
    }
    n += 1
    bufBytes += 8L
    if (n == 50 && GraftDataWriter.failNextWriteOnce.compareAndSet(true, false)) {
      flush() // leave a partial staged file so abort/cleanup is actually exercised
      throw new RuntimeException("graft test hook: injected write failure")
    }
    if (n == BlockSize || bufBytes >= MaxBlockBytes) flush()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    if (writer != null) { writer.close(); writer = null }
    if (rows > 0) // task commit = atomic promote to the readable name
      Files.move(Paths.get(absDir, inProgressName), Paths.get(absDir, fileName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val codecsJson = codecsByColumn.toSeq.sortBy(_._1)
      .map { case (c, s) => s""""$c":"${s.mkString("+")}"""" }
      .mkString("{", ",", "}")
    GraftWriterCommitMessage(partId, if (rows > 0) fileName else null,
      rows, origBytes, encBytes, codecsJson)
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    Files.deleteIfExists(Paths.get(absDir, inProgressName))
    Files.deleteIfExists(Paths.get(absDir, fileName))
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
