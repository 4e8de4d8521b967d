package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}

import graft.sources.SnapshotStore

/** Stream offset = committed snapshot id (0 = before the first commit). The
  * snapshot-id sequence is already a total order of atomic commits — exactly
  * an offset log. */
final case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}

object GraftOffset {
  private val P = """\{\s*"snapshotId"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(json: String): GraftOffset = json.trim match {
    case P(id) => GraftOffset(id.toLong)
    case other => throw new IllegalArgumentException(
      s"not a graft stream offset: '$other'")
  }
}

/**
 * Incremental (micro-batch) read of the snapshot store:
 * `spark.readStream.format("graft").load(root)` — the normal downstream shape
 * of a training-data pipeline, where each new crawl commit feeds dedup/stats
 * consumers without re-scanning the table.
 *
 * One batch = the parts NEWLY COMMITTED in an offset range `(start, end]` of
 * snapshot ids. Per snapshot the delta is computed against its immediate
 * predecessor's manifest (ids are consecutive by construction,
 * [[SnapshotStore.commitReplacing]]), so a replayed batch — same checkpointed
 * offsets — plans the identical part set from the identical immutable
 * manifests: end-to-end exactly-once with a downstream idempotent sink.
 *
 * Compaction awareness: a commit that GROWS the tombstone set is a compaction
 * — its "new" parts hold only re-homed rows that earlier batches already
 * emitted, so it contributes NOTHING (the same
 * [[SnapshotStore.committedPartIds]] lineage that keeps batch resume
 * exactly-once). Writers never mix appends and replacements in one commit
 * (EncodeJob/StreamingEncode append; CompactJob replaces), which this rule
 * relies on.
 *
 * Retention: planning a range needs the manifests of every snapshot in it (a
 * part is read from the dir of the snapshot that BORN it, so a later
 * compaction cannot re-home rows out from under a lagging stream). If expiry
 * dropped one, planning fails with the remediation in the message — size
 * `expireSnapshots(keepLast)` to cover the maximum stream lag.
 */
final class GraftMicroBatchStream(root: String, columns: Array[String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // pinned at prepareForTriggerAvailableNow: the AvailableNow run drains up to
  // HERE and stops, even if more commits land while it runs
  @volatile private var availableNowTarget: Option[Long] = None

  private def currentId: Long = SnapshotStore.currentSnapshotId(root).getOrElse(0L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentId)

  override def initialOffset(): Offset = GraftOffset(0L)

  // SupportsAdmissionControl route (SupportsTriggerAvailableNow extends it):
  // no rate limiting — a batch is whatever snapshot range has committed, capped
  // at the pinned AvailableNow target
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    GraftOffset(availableNowTarget.getOrElse(currentId))

  override def reportLatestOffset(): Offset = GraftOffset(currentId)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def deserializeOffset(json: String): Offset = GraftOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in Spark's checkpoint

  override def stop(): Unit = ()

  /** (entry, bornSnapshotId) for every part to EMIT in `(start, end]`. */
  private def emitEntries(start: Long, end: Long): Seq[SnapshotStore.PartEntry] = {
    val out = Seq.newBuilder[SnapshotStore.PartEntry]
    var prevParts: Set[Int] = null // lazy: only needed once per walked snapshot
    var prevTombs: Set[Int] = null
    var sid = start + 1
    while (sid <= end) {
      val (entries, tombs) =
        try (SnapshotStore.entriesAt(root, sid), SnapshotStore.tombstonesAt(root, sid))
        catch {
          case e: IllegalArgumentException => throw new IllegalStateException(
            s"streaming read of $root needs snapshot $sid of range ($start, $end], " +
            "but its manifest is gone — expired under a lagging stream. Size " +
            "SnapshotStore.expireSnapshots(keepLast) to cover the stream lag, or " +
            "restart the stream from a fresh checkpoint (full re-read).", e)
        }
      if (prevParts == null) {
        prevParts =
          if (sid == 1) Set.empty
          else SnapshotStore.entriesAt(root, sid - 1).map(_.partId).toSet
        prevTombs = if (sid == 1) Set.empty else SnapshotStore.tombstonesAt(root, sid - 1)
      }
      val newEntries = entries.filterNot(e => prevParts(e.partId))
      // tombstones grew => compaction commit: its parts are re-homed rows,
      // already emitted from the snapshots that born them — skip
      if ((tombs -- prevTombs).isEmpty) out ++= newEntries
      prevParts = entries.map(_.partId).toSet
      prevTombs = tombs
      sid += 1
    }
    out.result()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    val e = end.asInstanceOf[GraftOffset].snapshotId
    if (e <= s) return Array.empty
    val entries = emitEntries(s, e)
    if (entries.isEmpty) return Array.empty
    val spark = SparkSession.active
    // row path only (batch-sized ColumnarBatches buy nothing on micro-batches);
    // no block-key pruning — streaming filters run as Spark-side residuals
    GraftDataSource.packPartitions(spark, root, entries, columns,
      keyParts = None, keysBc = null, columnar = false, limit = -1)._1
  }

  override def createReaderFactory(): PartitionReaderFactory = GraftReaderFactory
}
