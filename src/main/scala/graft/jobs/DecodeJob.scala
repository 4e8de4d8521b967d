package graft.jobs

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{IntBlockCodec, StringBlockCodec}
import graft.sources.{SnapshotStore, WebPage}

/**
 * Decode job: read the committed snapshot's block files, reassemble pages, and verify
 * the per-url byte-identical `text` invariant (BASELINE.json input_hint).
 *
 * Reassembly is SHUFFLE-FREE on the primary path: a group's 5 column blocks are
 * co-written consecutively by one encode task, so a mapPartitions kernel groups
 * consecutive rows in place ([[hybridReassemble]]); only groups that straddle a
 * file-split boundary (detected by a column-pruned key pre-scan) are repaired via
 * a groupByKey shuffle. Each group is one bounded block (≤64Ki rows × 5 columns),
 * so executor memory stays flat at any table size.
 */
object DecodeJob {

  /** Restrict a blocks scan to the given part ids. Small sets become an `isin`
    * (pushed to parquet as an In filter); large ones a broadcast semi-join —
    * both are shuffle-free and preserve per-partition row order. */
  private def partsOnly(df: org.apache.spark.sql.DataFrame,
                        partIds: Seq[Int]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val spark = df.sparkSession
    import spark.implicits._
    if (partIds.size <= 256) df.where(col("part_id").isin(partIds.map(Int.box): _*))
    else df.join(broadcast(partIds.toDF("part_id")), Seq("part_id"), "left_semi")
  }

  /** Dirs and live part ids must come from ONE manifest read — re-reading the
    * pointer could mix snapshot N's parts with snapshot N+1's dirs when a
    * concurrent compaction commits between the reads. */
  private[graft] def fromEntries(spark: SparkSession, root: String,
                          entries: Seq[SnapshotStore.PartEntry]) = {
    if (entries.isEmpty) {
      // legal empty-ENTRIES snapshot (created-but-unloaded table, truncate,
      // all-matched DELETE): a correctly-typed empty blocks scan lets every
      // downstream path (reassembly, metadata scans, stats) yield its natural
      // zero-row/zero-count result (spark.read.parquet cannot take zero paths)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.Encoders.product[BlockRow].schema)
    } else {
      val dirs = entries.map(_.dataDir).distinct
        .map(d => java.nio.file.Paths.get(root, d).toString)
      partsOnly(spark.read.parquet(dirs: _*), entries.map(_.partId))
    }
  }

  /**
   * Read the current snapshot's blocks as a DataFrame, restricted to the
   * manifest's LIVE part ids. The restriction is load-bearing, not belt-and-
   * braces: a partial compaction replaces only some parts of a shared data dir,
   * so the dir stays referenced via the kept parts — reading it whole would
   * return the replaced parts' blocks from the old dir AND from the compacted
   * copy (every such row decoded twice).
   */
  def blocks(spark: SparkSession, root: String) = {
    requireStore(root)
    fromEntries(spark, root, SnapshotStore.currentEntries(root))
  }

  /** A root with no SNAPSHOT pointer is not a store (typo'd path, never-
    * committed dir) — fail loudly. An initialized store whose CURRENT snapshot
    * has zero entries (created-but-unloaded table, truncate, all-matched
    * DELETE) is legal and reads as empty everywhere. */
  private def requireStore(root: String): Unit =
    require(SnapshotStore.currentSnapshotId(root).isDefined,
      s"no committed snapshot under $root")

  /** The typed decode API reassembles WebPage rows — a generalized-schema
    * store (SCHEMA sidecar, r6) would fail deep inside reassembly with a
    * confusing column-set error; name the problem at the entry point. The V2
    * SQL surface reads every schema. */
  private[graft] def requireWebtext(root: String): Unit = {
    val s = graft.sources.v2.GraftDataSource.storeSchema(root)
    require(s == graft.sources.v2.GraftDataSource.PageSchema,
      s"this decode API reads webtext-schema stores; $root has schema " +
      s"${s.simpleString} — read it via spark.read.format(\"graft\").load(...)")
  }

  /** Time travel: read the blocks visible at a specific committed snapshot
    * (entriesAt fails loudly when no such manifest exists; an empty manifest
    * reads as empty). */
  def blocksAt(spark: SparkSession, root: String, snapshotId: Long) =
    fromEntries(spark, root, SnapshotStore.entriesAt(root, snapshotId))

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Decode the full snapshot back into pages. */
  def decode(spark: SparkSession, root: String): Dataset[WebPage] = {
    requireWebtext(root)
    val t0 = graft.sources.v2.GraftDataSource.storeIdentityToken(root)
    val df = blocks(spark, root)
    reassemble(spark, df, preScanKey(spark, root, None, PageColumns, t0))
  }

  // ---------------- predicate-pushed decode (decoded-view API) ----------------

  /** A pushable predicate over a decoded page column, evaluated twice: against
    * block METADATA to prune whole groups before any decompression, and exactly
    * against the decoded rows. Absent metadata always passes (soundness). */
  sealed trait BlockPredicate { def column: String }
  /** Equality on a UTF-8 string column with bounds/dict metadata (url/text/lang). */
  final case class StrEq(column: String, value: String) extends BlockPredicate
  /** Membership on a string column. */
  final case class StrIn(column: String, values: Seq[String]) extends BlockPredicate
  /** Prefix match on a string column — the most common web-archive access
    * pattern (`url LIKE 'https://host/%'`). Prunes via block_str_min/max
    * overlap with [prefix, successor(prefix)). */
  final case class StrPrefix(column: String, prefix: String) extends BlockPredicate
  /** Inclusive lexicographic range on a string column; None = open-ended on
    * that side. A finite stand-in bound (e.g. a run of U+FFFF) would be
    * UNSOUND: strings can sort above any finite string, and a pruned block is
    * never decoded, so the residual filter could not resurrect its rows. */
  final case class StrRange(column: String, lo: Option[String], hi: Option[String])
      extends BlockPredicate
  object StrRange {
    /** Closed-range convenience (both bounds finite). */
    def apply(column: String, lo: String, hi: String): StrRange =
      StrRange(column, Some(lo), Some(hi))
  }
  /** Inclusive epoch-micros range on `warc_ts`. */
  final case class TsRange(loMicros: Long, hiMicros: Long) extends BlockPredicate {
    def column: String = "warc_ts"
  }
  /** Inclusive raw-value range on ANY integer-family column (generalized
    * schemas: bigint/int/smallint/tinyint, and timestamps as epoch micros) —
    * prunes via the same exact block_min/max as [[TsRange]]. */
  final case class IntRange(column: String, lo: Long, hi: Long) extends BlockPredicate

  /**
   * Smallest string greater than EVERY string with the given prefix, under
   * Spark's UTF8 binary ordering: the prefix with its last rankable char
   * incremented. A char is dropped first only when its increment is not a
   * valid non-surrogate scalar: U+FFFF (no in-char successor) and
   * U+D7FF..U+DFFF (U+D7FF increments into the surrogate range; surrogates
   * themselves — possibly halves of a supplementary pair — cannot be
   * incremented byte-order-soundly). Everything else increments: UTF-8 is
   * monotone in scalar value and encodings are never byte-prefixes of each
   * other, so `prefix[0..i-1] + (c+1)` bounds every prefixed string. None =
   * no finite successor (pruning then uses only the lower bound, still sound).
   */
  private[jobs] def prefixSuccessor(prefix: String): Option[String] = {
    @inline def noSuccessor(c: Char): Boolean =
      c == 0xFFFF.toChar || (c >= 0xD7FF.toChar && c <= 0xDFFF.toChar)
    var i = prefix.length - 1
    while (i >= 0 && noSuccessor(prefix.charAt(i))) i -= 1
    if (i < 0) None
    else Some(prefix.substring(0, i) + (prefix.charAt(i) + 1).toChar)
  }

  /** Can a block with this metadata row contain a match? (null metadata => yes) */
  private def metaCond(p: BlockPredicate): org.apache.spark.sql.Column = p match {
    case StrEq(_, v) =>
      (col("block_str_min").isNull || col("block_str_min") <= v) &&
      (col("block_str_max").isNull || col("block_str_max") >= v) &&
      (col("block_str_dict").isNull || array_contains(col("block_str_dict"), v))
    case StrIn(_, vs) =>
      val arr = typedLit(vs)
      (col("block_str_min").isNull || col("block_str_min") <= array_max(arr)) &&
      (col("block_str_max").isNull || col("block_str_max") >= array_min(arr)) &&
      (col("block_str_dict").isNull || arrays_overlap(col("block_str_dict"), arr))
    case StrPrefix(_, p) =>
      // matches s satisfy p <= s < successor(p); a block overlaps that interval
      // iff max >= p and min < successor(p) (when the successor exists)
      (col("block_str_max").isNull || col("block_str_max") >= p) &&
      prefixSuccessor(p).map(succ =>
        col("block_str_min").isNull || col("block_str_min") < succ).getOrElse(lit(true)) &&
      (col("block_str_dict").isNull ||
        exists(col("block_str_dict"), v => v.startsWith(p)))
    case StrRange(_, lo, hi) =>
      hi.map(h => col("block_str_min").isNull || col("block_str_min") <= h)
        .getOrElse(lit(true)) &&
      lo.map(l => col("block_str_max").isNull || col("block_str_max") >= l)
        .getOrElse(lit(true)) &&
      (col("block_str_dict").isNull ||
        exists(col("block_str_dict"), v =>
          lo.map(v >= _).getOrElse(lit(true)) && hi.map(v <= _).getOrElse(lit(true))))
    case TsRange(lo, hi) =>
      (col("block_min").isNull || col("block_min") <= hi) &&
      (col("block_max").isNull || col("block_max") >= lo)
    case IntRange(_, lo, hi) =>
      (col("block_min").isNull || col("block_min") <= hi) &&
      (col("block_max").isNull || col("block_max") >= lo)
  }

  /** Exact row-level form of a predicate over decoded pages. */
  private def rowCond(p: BlockPredicate): org.apache.spark.sql.Column = p match {
    case StrEq(c, v) => col(c) === v
    case StrIn(c, vs) => col(c).isin(vs: _*)
    case StrPrefix(c, p) => col(c).startsWith(p)
    case StrRange(c, lo, hi) =>
      lo.map(col(c) >= _).getOrElse(lit(true)) && hi.map(col(c) <= _).getOrElse(lit(true))
    case TsRange(lo, hi) => unix_micros(col("warc_ts")).between(lo, hi)
    // raw stored value (timestamp columns of generalized stores decode as
    // epoch-micros longs on the V2 surface, where residuals are Spark-side
    // anyway; this row form serves the int-typed decode API columns)
    case IntRange(c, lo, hi) => col(c).between(lo, hi)
  }

  /**
   * Group keys whose metadata admits ALL predicates — the set of (part_id,
   * block_seq) that must be decoded. A column-pruned metadata-only scan
   * (parquet reads the small metadata columns, never `encoded`), one key
   * DataFrame per predicate, intersected. Manifest-scale output.
   */
  def matchingGroupKeys(spark: SparkSession, root: String,
                        predicates: Seq[BlockPredicate]): org.apache.spark.sql.DataFrame =
    matchingKeysOf(blocks(spark, root), predicates)

  /** [[matchingGroupKeys]] over a PINNED entry set — for callers that must
    * keep planning AND the later rewrite/commit on ONE manifest read: deriving
    * affected parts from a re-read manifest while holding an older entry list
    * lets a concurrent compaction slip between the two, and a commit that then
    * tombstones parts it never rewrote is silent row loss. */
  private[graft] def matchingGroupKeysOf(spark: SparkSession, root: String,
      entries: Seq[SnapshotStore.PartEntry],
      predicates: Seq[BlockPredicate]): org.apache.spark.sql.DataFrame =
    matchingKeysOf(fromEntries(spark, root, entries), predicates)

  private def matchingKeysOf(blocksDf: org.apache.spark.sql.DataFrame,
                             predicates: Seq[BlockPredicate],
                             allowed: Option[Set[String]] = None): org.apache.spark.sql.DataFrame = {
    require(predicates.nonEmpty, "no predicates")
    // a predicate naming a column the store does not have matches ZERO block
    // rows — the intersection would prune EVERYTHING and silently return
    // empty. The V2 surface passes its table schema's columns (`allowed`);
    // the webtext decode API keeps the fixed-page-column typo guard.
    allowed match {
      case Some(cols) =>
        require(predicates.forall(p => cols(p.column)),
          s"predicates must target store columns ${cols.toSeq.sorted.mkString(",")}; got " +
          predicates.map(_.column).distinct.mkString(","))
      case None =>
        require(predicates.forall {
          case _: IntRange => true // generalized-schema predicates: schema-validated upstream
          case p => PageColumns(p.column) && p.column != "html"
        }, "predicates must target url/warc_ts/text/lang (html is opaque binary: no metadata)")
        require(predicates.forall {
          case _: TsRange | _: IntRange => true
          case p => p.column != "warc_ts" // string bounds are meaningless on an i64 column
        }, "warc_ts predicates must be TsRange")
    }
    predicates.map { p =>
      blocksDf.where(col("column") === p.column && metaCond(p))
        .select(col("part_id"), col("block_seq"))
    }.reduce((a, c) => a.join(c, Seq("part_id", "block_seq")))
  }

  /** Restrict a blocks scan to collected group keys: few → pushed part/seq
    * In-filters + codegen'd packed-key isin (row groups of pruned blocks are
    * skipped by parquet statistics — no IO, and derived scans keep column
    * pruning); many → broadcast semi-join of the already-collected keys. */
  /** One packed block-group key: `(part_id << 32) | block_seq` — THE key
    * format shared by the decode API's pushed filters and the V2 scan's
    * broadcast key arrays ([[graft.sources.v2.GraftDataSource]]); a single
    * definition so sign/width handling (negative rehomed part ids!) cannot
    * silently diverge between the two surfaces. */
  private[graft] def packKey(pid: Int, seq: Int): Long =
    (pid.toLong << 32) | (seq.toLong & 0xffffffffL)

  /** In-literal planning cutoff for [[keysOnly]]: past this many keys the
    * pushed isin trees stop paying (driver expression-tree + codegen blowup)
    * and the broadcast semi-join takes over. Deliberately NOT
    * [[MaxFallbackGroups]] — that is a reassembly-fallback test lever, and
    * moving it must not flip pruning plans in an unrelated component. */
  private val MaxInListKeys = 4096

  private def keysOnly(blocksDf: org.apache.spark.sql.DataFrame,
                       keys: Array[(Int, Int)]): org.apache.spark.sql.DataFrame = {
    val spark = blocksDf.sparkSession
    import spark.implicits._
    if (keys.length <= MaxInListKeys) {
      val pids = keys.map(_._1).distinct.toSeq.map(Int.box)
      val seqs = keys.map(_._2).distinct.toSeq.map(Int.box)
      val packed = keys.map(k => Long.box(packKey(k._1, k._2))).toSeq
      val packedCol = shiftleft(col("part_id").cast("long"), 32)
        .bitwiseOR(col("block_seq").cast("long").bitwiseAND(lit(0xffffffffL)))
      blocksDf.where(col("part_id").isin(pids: _*) && col("block_seq").isin(seqs: _*) &&
        packedCol.isin(packed: _*))
    } else {
      blocksDf.join(broadcast(keys.toSeq.toDF("part_id", "block_seq")),
        Seq("part_id", "block_seq"), "left_semi")
    }
  }

  /**
   * Driver-side key-collect ceiling: above this many surviving groups the
   * predicate simply is not selective and Iceberg-style manifest planning stops
   * paying — the collect itself (and the broadcast built from it) becomes the
   * bottleneck. `private[jobs]` var so tests can force the ungated branch.
   */
  private[graft] var MaxPrunedKeyCollect = 1000000 // private[graft]: part of the V2 key-plan memo key

  /** Fraction of total groups above which pruning is skipped: past half the
    * groups the key filters buy little IO (survivors sit in ~every file) while
    * the metadata collect and the pushed In-lists still cost; below it pruning
    * at least halves the decode. The driver-memory guard is the ABSOLUTE
    * [[MaxPrunedKeyCollect]] cap — this fraction is purely a break-even
    * heuristic, so it must not gate small stores where a 50%-selective
    * predicate still meaningfully prunes. `private[graft] var` so tests can
    * widen it: [[estimatedGroups]] under-estimates byte-bound toy stores, and
    * exercising the many-thousand-key pruning path at test scale needs the
    * heuristic (not the mechanism) out of the way. */
  private[graft] var PruneFractionCutoff = 0.5

  /** Total block groups estimated from the manifest alone (per-part
    * ceil(nRows/BlockSize)) — zero file IO. UNDER-estimates stores whose
    * fat-row blocks flushed on the byte bound, which only tightens the gate's
    * fraction threshold (less pruning, never wrong results). */
  private[graft] def estimatedGroups(entries: Seq[SnapshotStore.PartEntry]): Long =
    entries.map(e => math.max(1L, (e.nRows + EncodeJob.BlockSize - 1) / EncodeJob.BlockSize)).sum

  /**
   * GATED planning of the pruned-group key set. The store is sized from the
   * MANIFEST (one estimate, no extra Spark job); surviving keys are then
   * fetched with `take(threshold + 1)`, so a NON-selective predicate never
   * materializes an unbounded key list on the driver: past
   * min([[MaxPrunedKeyCollect]], [[PruneFractionCutoff]]·total) the caller gets
   * None and falls back to decode-everything + exact filter — identical rows by
   * construction, no driver bottleneck at any table size. One metadata-only
   * Spark job total.
   */
  private[graft] def planPrunedKeys(blocksDf: org.apache.spark.sql.DataFrame,
                                    predicates: Seq[BlockPredicate],
                                    totalGroupsEstimate: Long,
                                    allowed: Option[Set[String]] = None): Option[Array[(Int, Int)]] =
    gatedKeyCollect(matchingKeysOf(blocksDf, predicates, allowed), totalGroupsEstimate)

  /** The ONE driver-collect gate for every group-key planner ([[planPrunedKeys]],
    * [[planTopNKeys]]): `take(threshold + 1)` so a non-selective plan never
    * materializes an unbounded key list, None past
    * min([[MaxPrunedKeyCollect]], [[PruneFractionCutoff]]·total). Shared so a
    * future tuning cannot give the planners different pruning ceilings. */
  private def gatedKeyCollect(survivors: org.apache.spark.sql.DataFrame,
                              totalGroupsEstimate: Long): Option[Array[(Int, Int)]] = {
    val spark = survivors.sparkSession
    import spark.implicits._
    val threshold = math.min(MaxPrunedKeyCollect.toLong,
      math.max(1L, (totalGroupsEstimate * PruneFractionCutoff).toLong)).toInt
    val keys = survivors.select($"part_id", $"block_seq").as[(Int, Int)]
      .take(threshold + 1)
    if (keys.length > threshold) None else Some(keys)
  }

  /** The webtext columns a pushed top-n can plan a prefix over: url via the
    * string bounds, warc_ts via the exact int block_min/max. Generalized
    * schemas derive the set from their column types instead
    * ([[graft.sources.v2.GraftScanBuilder.pushTopN]]). */
  private[graft] val TopNColumns = Set("url", "warc_ts")

  /**
   * ORDER BY <column> LIMIT n planning for a metadata-bounded column (`url`
   * via block_str_min/max, `warc_ts` via the exact int block_min/max): the
   * (part_id, block_seq) groups that can contain a row of the global
   * top-`limit` under the given ordering — an ordered PREFIX of the store's
   * groups, found from block metadata alone. Sound with nulls: groups that may
   * hold nulls (`n_nulls` > 0, or unknown on stores written before that column
   * existed) always survive when nulls sort first, and never count toward the
   * prefix quota when nulls sort last (their null rows cannot push a non-null
   * row out of the top-n).
   *
   * Mechanics: a DISTRIBUTED sort of the manifest-scale block metadata by
   * the prefix-establishing bound (far bound: max for ASC, min for DESC — a
   * group's rows are all within the prefix ending at its far bound);
   * the driver streams the sorted pairs partition-by-partition
   * (`toLocalIterator`, so only the needed prefix is ever fetched) until the
   * guaranteed-in-prefix row count reaches `limit`, yielding the threshold
   * value `u`; survivors are then collected through the same gate as
   * [[planPrunedKeys]]. None (caller scans everything — always sound) when the
   * quota is unreachable from bounded groups, the threshold search exceeds
   * [[MaxPrunedKeyCollect]] groups, or the survivor set does.
   */
  private[graft] def planTopNKeys(blocksDf: org.apache.spark.sql.DataFrame,
                                  column: String,
                                  asc: Boolean, nullsFirst: Boolean, limit: Int,
                                  totalGroupsEstimate: Long,
                                  intBounds: Option[Boolean] = None): Option[Array[(Int, Int)]] = {
    require(limit > 0, s"pushed top-n limit must be positive, got $limit")
    // webtext callers omit intBounds (derived from the fixed schema);
    // generalized-schema callers pass the column's kind explicitly
    val isTs = intBounds.getOrElse {
      require(TopNColumns(column),
        s"top-n planning needs a metadata-bounded column ($TopNColumns), got $column")
      column == "warc_ts"
    }
    val spark = blocksDf.sparkSession
    import spark.implicits._
    val nn = if (blocksDf.columns.contains("n_nulls")) col("n_nulls").cast("long")
             else lit(null).cast("long") // pre-n_nulls store: nulls unknown
    val (mnCol, mxCol) =
      if (isTs) (col("block_min"), col("block_max"))
      else (col("block_str_min"), col("block_str_max"))
    val meta = blocksDf.where(col("column") === column)
      .select(col("part_id"), col("block_seq"), col("n").cast("long").as("n"),
        mnCol.as("mn"), mxCol.as("mx"), nn.as("nn"))
    // rows of a group GUARANTEED to sort within the prefix ending at its own
    // far bound: all n when nulls sort first (any null precedes everything),
    // else only its known-non-null rows (unknown null count -> contributes 0)
    val countable =
      if (nullsFirst) col("n")
      else when(col("nn").isNotNull, col("n") - col("nn")).otherwise(lit(0L))
    val boundCol = if (asc) col("mx") else col("mn")
    val ordered = meta.where(boundCol.isNotNull)
      .select(boundCol.as("b"), countable.as("c"))
      .sort(if (asc) col("b").asc else col("b").desc)
    var u: Any = null
    var acc = 0L
    var pulled = 0L
    val it = ordered.toLocalIterator()
    while (u == null && it.hasNext && pulled < MaxPrunedKeyCollect) {
      val r = it.next(); pulled += 1
      acc += r.getLong(1)
      if (acc >= limit) u = r.get(0)
    }
    if (u == null) return None
    // a group survives when it may contain a non-null row within the prefix
    // (near bound unknown or within u) — or any null row, when nulls sort first
    val within =
      if (asc) col("mn").isNull || col("mn") <= lit(u)
      else col("mx").isNull || col("mx") >= lit(u)
    val survivor = if (nullsFirst) within || col("nn").isNull || col("nn") > 0 else within
    gatedKeyCollect(meta.where(survivor), totalGroupsEstimate)
  }

  /**
   * Decode ONLY the pages that can satisfy `predicates`: block groups whose
   * metadata (block_min/block_max for warc_ts, block_str_min/max/dict for string
   * columns) excludes every predicate value are pruned BEFORE decompression —
   * the north-star "predicate-push onto dictionary and FoR metadata" surfaced on
   * the decoded-view API users actually write. Exact row filters still apply
   * after decode, so results equal `decode(...).filter(...)`. Plan shape: see
   * [[keysOnly]]; reassembly stays on the shuffle-free fast path either way.
   */
  def decodeWhere(spark: SparkSession, root: String,
                  predicates: Seq[BlockPredicate]): Dataset[WebPage] = {
    if (predicates.isEmpty) return decode(spark, root) // no filter = plain decode
    requireWebtext(root)
    // ONE manifest read feeds both the metadata scan and the data scan: a
    // compaction (StoreMaintenance) committing between two reads would re-home
    // rows into part ids the collected keys no longer match — silent row loss
    requireStore(root)
    val entries = SnapshotStore.currentEntries(root)
    val blocksDf = fromEntries(spark, root, entries)
    val exact = predicates.map(rowCond).reduce(_ && _)
    planPrunedKeys(blocksDf, predicates, estimatedGroups(entries)) match {
      case Some(keys) => reassemble(spark, keysOnly(blocksDf, keys)).filter(exact)
      // non-selective predicate: pruning can't pay — decode everything and
      // filter exactly (identical rows; no driver-side key materialization)
      case None => reassemble(spark, blocksDf).filter(exact)
    }
  }

  /**
   * Projected AND predicate-pushed decode — the everyday read shape ("url, lang
   * where lang = 'en' and warc_ts in range"): block groups prune via metadata
   * ([[decodeWhere]]), the `column` In-filter prunes unwanted columns' blocks
   * ([[decodeColumns]]), predicate columns not in `wanted` are decoded for the
   * exact filter and then dropped. Output schema follows [[decodeColumns]]
   * (warc_ts as epoch-micros LongType, html as BinaryType).
   */
  def decodeColumnsWhere(spark: SparkSession, root: String, wanted: Seq[String],
                         predicates: Seq[BlockPredicate]): org.apache.spark.sql.DataFrame = {
    require(wanted.nonEmpty, "no columns requested")
    require(wanted.forall(PageColumns), // fail fast: a typo'd name would silently yield nulls
      s"unknown columns ${wanted.filterNot(PageColumns)}; available: $PageColumns")
    if (predicates.isEmpty) return decodeColumns(spark, root, wanted) // projection-only
    requireStore(root)
    requireWebtext(root)
    val entries = SnapshotStore.currentEntries(root) // ONE manifest read for both scans (see decodeWhere)
    val blocksDf = fromEntries(spark, root, entries)
    val effective = (wanted ++ predicates.map(_.column)).distinct
    val colFiltered = blocksDf.where(col("column").isin(effective: _*))
    val filtered = planPrunedKeys(blocksDf, predicates, estimatedGroups(entries)) match {
      case Some(keys) => keysOnly(colFiltered, keys)
      case None => colFiltered // non-selective: column pruning only (see decodeWhere)
    }
    val exact = predicates.map {
      // only the TsRange arm differs from rowCond: the projected form carries
      // warc_ts AS raw micros, so no unix_micros conversion applies
      case TsRange(lo, hi) => col("warc_ts").between(lo, hi)
      case p => rowCond(p)
    }.reduce(_ && _)
    projectedReassemble(spark, filtered, effective)
      .where(exact)
      .select(wanted.map(col): _*)
  }

  /**
   * Metadata-only aggregate fast path — the classic snapshot-store trick:
   * `count(*)` comes from the manifest's per-part `nRows` (pure driver
   * arithmetic, zero file IO) and `min/max(warc_ts)` from the block min/max
   * metadata columns (a column-pruned parquet scan that NEVER touches the
   * multi-MB `encoded` column — at 100 TB that is KBs of metadata instead of
   * decompressing every block). One row: (row_count, min_warc_ts_us,
   * max_warc_ts_us), micros so no timezone coupling. Exactness: every committed
   * block carries exact bounds over its non-null values, so min(block_min) /
   * max(block_max) equal the decoded min/max; nulls don't participate, matching
   * SQL aggregate semantics.
   */
  def statsFast(spark: SparkSession, root: String,
                snapshotId: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val entries = snapshotId match {
      case Some(id) => SnapshotStore.entriesAt(root, id)
      case None => requireStore(root); SnapshotStore.currentEntries(root)
    }
    val rowCount = entries.map(_.nRows).sum
    fromEntries(spark, root, entries) // same single manifest read as decode paths
      .where(col("column") === "warc_ts")
      .agg(min(col("block_min")).as("min_warc_ts_us"),
           max(col("block_max")).as("max_warc_ts_us"))
      .select(lit(rowCount).as("row_count"),
        col("min_warc_ts_us"), col("max_warc_ts_us"))
  }

  /** Time travel: decode the pages visible at a specific committed snapshot. */
  def decodeAt(spark: SparkSession, root: String, snapshotId: Long): Dataset[WebPage] = {
    requireWebtext(root)
    val t0 = graft.sources.v2.GraftDataSource.storeIdentityToken(root)
    val df = blocksAt(spark, root, snapshotId)
    reassemble(spark, df, preScanKey(spark, root, Some(snapshotId), PageColumns, t0))
  }

  /** Decode only the given parts (compaction input). Small lists become an `isin`
    * (pushed to parquet as an In filter); large ones — a year of streaming batches
    * can leave 100k+ small parts — use a broadcast semi-join instead of a
    * 100k-literal expression tree. */
  def decodeParts(spark: SparkSession, root: String, partIds: Seq[Int]): Dataset[WebPage] = {
    requireWebtext(root)
    reassemble(spark, partsOnly(blocks(spark, root), partIds))
  }

  /** [[decodeParts]] over a PINNED entry set (see [[matchingGroupKeysOf]]):
    * the rewrite jobs must decode through the SAME manifest read that chose
    * the parts, or a compaction between the reads re-homes the rows out from
    * under the chosen ids. */
  private[graft] def decodePartsOf(spark: SparkSession, root: String,
      entries: Seq[SnapshotStore.PartEntry], partIds: Seq[Int]): Dataset[WebPage] =
    reassemble(spark, partsOnly(fromEntries(spark, root, entries), partIds))

  // ---------------- reassembly (shuffle-free fast path + shuffle fallback) ----------------

  private type RawBlock = (Int, Int, String, Array[Byte])
  private val PageColumns = Set("url", "warc_ts", "html", "text", "lang")

  /**
   * When more than this many block groups need the shuffle fallback, the input is
   * not grouped on disk (foreign/unsorted store) — reassemble everything through
   * the shuffle instead of collecting an unbounded key list to the driver.
   * `private[jobs]` var so tests can force the full-fallback branch.
   */
  private[graft] var MaxFallbackGroups = 4096

  /** Iterate consecutive same-(part_id, block_seq) runs as (pid, seq, column -> bytes). */
  private def consecutiveRuns(it: Iterator[RawBlock])
      : Iterator[(Int, Int, Map[String, Array[Byte]])] =
    new Iterator[(Int, Int, Map[String, Array[Byte]])] {
      private val buf = it.buffered
      override def hasNext: Boolean = buf.hasNext
      override def next(): (Int, Int, Map[String, Array[Byte]]) = {
        val (pid, seq, _, _) = buf.head
        var m = Map.empty[String, Array[Byte]]
        while (buf.hasNext && buf.head._1 == pid && buf.head._2 == seq) {
          val r = buf.next()
          m = m.updated(r._3, r._4)
        }
        (pid, seq, m)
      }
    }

  /** Keys of consecutive runs whose column set is NOT exactly `expected`. */
  private def incompleteRunKeys(it: Iterator[(Int, Int, String)],
                                expected: Set[String]): Iterator[(Int, Int)] =
    new Iterator[(Int, Int)] {
      private val buf = it.buffered
      private var pending: (Int, Int) = _
      private def advance(): Unit =
        while (pending == null && buf.hasNext) {
          val (pid, seq, _) = buf.head
          var cols = Set.empty[String]
          while (buf.hasNext && buf.head._1 == pid && buf.head._2 == seq)
            cols += buf.next()._3
          if (cols != expected) pending = (pid, seq)
        }
      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): (Int, Int) = {
        advance()
        val r = pending; pending = null
        if (r == null) throw new NoSuchElementException
        r
      }
    }

  /**
   * Fast-path decision for one consecutive run. Correctness of the split repair
   * rests on the key pre-scan and the data scan planning IDENTICAL file-split
   * boundaries (both derive from one `blocksDf`, and split planning is a pure
   * function of file sizes + session confs). If that invariant ever breaks —
   * e.g. `spark.sql.files.maxPartitionBytes` changed between the eager pre-scan
   * and a later action, or dynamic parallelism shifted `bytesPerCore` — a group
   * can straddle a NEW boundary the pre-scan never saw. Silently returning empty
   * there would lose the whole group's rows; instead the misalignment fails
   * loudly with the remediation in the message.
   */
  private[jobs] def fastPathGroup[T](pid: Int, seq: Int, cols: Map[String, Array[Byte]],
      expected: Set[String], badSet: Set[(Int, Int)])(
      decodeGroup: Map[String, Array[Byte]] => Iterator[T]): Iterator[T] =
    if (badSet((pid, seq))) Iterator.empty // straddling group: the fallback owns it
    else if (cols.keySet == expected) decodeGroup(cols)
    else throw new IllegalStateException(
      s"block group (part_id=$pid, block_seq=$seq) is incomplete in the data scan " +
      s"(saw columns ${cols.keySet.toSeq.sorted.mkString(",")}, expected " +
      s"${expected.toSeq.sorted.mkString(",")}) but the key pre-scan did not flag it: " +
      "file-split boundaries drifted between the two plannings (split-relevant confs " +
      "or parallelism changed mid-query). Re-run the decode; set " +
      "GRAFT_DECODE_FORCE_SHUFFLE=1 to force the always-correct shuffle path.")

  /** The always-correct path: one wide exchange grouping every block by key. */
  private def shuffleReassemble[T](raw: Dataset[RawBlock],
      enc: org.apache.spark.sql.Encoder[T])(
      decodeGroup: Map[String, Array[Byte]] => Iterator[T]): Dataset[T] =
    raw.groupByKey { case (pid, seq, _, _) => (pid, seq) }(
        org.apache.spark.sql.Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt))
      .flatMapGroups { (_: (Int, Int), it: Iterator[RawBlock]) =>
        decodeGroup(it.map(r => r._3 -> r._4).toMap)
      }(enc)

  /**
   * Shuffle-free reassembly of co-written block groups. The encode kernel emits
   * one group's column blocks consecutively into one task's parquet file, so at
   * read time groups are already contiguous: a mapPartitions kernel groups
   * consecutive rows with ZERO exchange — at table scale that removes a
   * full-dataset shuffle (every encoded byte through disk+network) from the
   * primary read path.
   *
   * Robustness: a parquet file bigger than `spark.sql.files.maxPartitionBytes`
   * can be split mid-group. A column-pruned key-only pre-scan (parquet reads just
   * part_id/block_seq/column — the multi-MB `encoded` column is never touched)
   * finds groups that are not contiguous-and-complete within a partition; those
   * few are re-read via a pushed-filter scan and repaired through the shuffle
   * path. More than [[MaxFallbackGroups]] of them means the input simply is not
   * grouped (foreign store) — everything falls back to the shuffle. Both scans
   * derive from the same `blocksDf`, so Spark's deterministic size-based file
   * partitioning gives them identical partition boundaries.
   */
  /** Memoized straddling-group pre-scan results (r7): for an immutable
    * snapshot + column set + the split-relevant session confs, the pre-scan's
    * bad-key set is a constant, yet it ran a Spark job on EVERY decode call.
    * None = over [[MaxFallbackGroups]] (callers take the full shuffle path).
    * A stale hit cannot corrupt: a wrongly-EMPTY set trips fastPathGroup's
    * loud misalignment error, a wrongly-extra key just re-reads that group
    * through the always-correct shuffle repair. Bounded LRU. */
  private val badKeysMemo =
    new java.util.LinkedHashMap[AnyRef, Option[Array[(Int, Int)]]](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, Option[Array[(Int, Int)]]]): Boolean = size > 128
    }

  /** Pre-scan memo key for a whole-snapshot read of `root`: the store identity
    * token pins the snapshot bytes, the conf values pin Spark's deterministic
    * file-split planning (the invariant [[fastPathGroup]] documents).
    * `tokenBefore` is the token the CALLER read before walking the manifest;
    * None (= don't memoize) when the store has no pointer or a commit raced
    * the manifest read — the entries might not belong to the token. */
  private[jobs] def preScanKey(spark: SparkSession, root: String,
      snapshotId: Option[Long], expected: Set[String],
      tokenBefore: Long): Option[AnyRef] = {
    if (tokenBefore == -1L ||
        graft.sources.v2.GraftDataSource.storeIdentityToken(root) != tokenBefore)
      return None
    val c = spark.sessionState.conf
    Some((root, tokenBefore, snapshotId,
      expected.toSeq.sorted, c.filesMaxPartitionBytes, c.filesOpenCostInBytes,
      c.filesMinPartitionNum, spark.sparkContext.defaultParallelism,
      MaxFallbackGroups)) // test-mutable gate: never serve across altered gates
  }

  private def hybridReassemble[T](spark: SparkSession,
      blocksDf: org.apache.spark.sql.DataFrame, expected: Set[String],
      enc: org.apache.spark.sql.Encoder[T],
      memoKey: Option[AnyRef] = None)(
      decodeGroup: Map[String, Array[Byte]] => Iterator[T]): Dataset[T] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val raw = blocksDf.select(col("part_id"), col("block_seq"), col("column"), col("encoded"))
      .as[RawBlock]
    // operational escape hatch (and the bench's A/B lever): force the
    // always-correct shuffle path regardless of layout
    if (sys.env.get("GRAFT_DECODE_FORCE_SHUFFLE").contains("1"))
      return shuffleReassemble(raw, enc)(decodeGroup)
    val exp = expected
    def computeBadKeys(): Option[Array[(Int, Int)]] = {
      val badRaw = blocksDf.select(col("part_id"), col("block_seq"), col("column"))
        .as[(Int, Int, String)]
        .mapPartitions(it => incompleteRunKeys(it, exp))
        .take(MaxFallbackGroups + 1)
      // truncation check on the RAW row count: a fragmented key can surface from
      // two partitions, so deduping a truncated sample would undercount and let
      // the partial-fallback path run with an incomplete badSet (dropped groups)
      if (badRaw.length > MaxFallbackGroups) None else Some(badRaw.distinct)
    }
    val badKeysOpt = memoKey match {
      case Some(key) =>
        badKeysMemo.synchronized { if (badKeysMemo.containsKey(key)) badKeysMemo.get(key) else null } match {
          case null =>
            val computed = computeBadKeys() // outside the lock: it is a Spark job
            badKeysMemo.synchronized { badKeysMemo.put(key, computed); () }
            computed
          case hit => hit
        }
      case None => computeBadKeys()
    }
    if (badKeysOpt.isEmpty) return shuffleReassemble(raw, enc)(decodeGroup)
    val badKeys = badKeysOpt.get
    val badSet = badKeys.toSet
    val fast = raw.mapPartitions { it =>
      consecutiveRuns(it).flatMap { case (pid, seq, cols) =>
        fastPathGroup(pid, seq, cols, exp, badSet)(decodeGroup)
      }
    }(enc)
    if (badSet.isEmpty) fast
    else {
      // re-fetch just the straddling groups: part_id/block_seq In-filters reach
      // parquet (row-group pruning), the exact pair filter runs on what's left
      val pids = badSet.map(_._1).toSeq.map(Int.box)
      val seqs = badSet.map(_._2).toSeq.map(Int.box)
      val leftover = blocksDf
        .where(col("part_id").isin(pids: _*) && col("block_seq").isin(seqs: _*))
        .select(col("part_id"), col("block_seq"), col("column"), col("encoded"))
        .as[RawBlock]
        .filter(r => badSet((r._1, r._2)))
      fast.union(shuffleReassemble(leftover, enc)(decodeGroup))
    }
  }

  /** Decode one complete 5-column group into pages. */
  private def decodePageGroup(cols: Map[String, Array[Byte]]): Iterator[WebPage] = {
    def str(bs: Array[Byte]): String =
      if (bs == null) null else new String(bs, StandardCharsets.UTF_8)
    val urls = StringBlockCodec.decode(cols("url"))
    val (ts, tsValid) = IntBlockCodec.decodeNullable(cols("warc_ts"))
    val htmls = StringBlockCodec.decode(cols("html"))
    val texts = StringBlockCodec.decode(cols("text"))
    val langs = StringBlockCodec.decode(cols("lang"))
    urls.indices.iterator.map { i =>
      WebPage(
        str(urls(i)),
        if (tsValid(i)) tsFromMicros(ts(i)) else null,
        htmls(i),
        str(texts(i)),
        str(langs(i)))
    }
  }

  private[jobs] def reassemble(spark: SparkSession,
                               blocksDf: org.apache.spark.sql.DataFrame,
                               memoKey: Option[AnyRef] = None): Dataset[WebPage] =
    hybridReassemble(spark, blocksDf, PageColumns,
      Encoders.product[WebPage], memoKey)(decodePageGroup)

  /**
   * Projected decode: reassemble ONLY the requested columns. The blocks scan
   * filters on `column`, which reaches parquet as a pushed `In` filter — row
   * groups holding unwanted columns (e.g. multi-KB text/html blocks when only
   * url+lang are asked for) are skipped by statistics before any IO-decompression,
   * the columnar-store read-path benefit at 100-TB scale.
   *
   * Output schema: one field per requested column in request order — `warc_ts`
   * as nullable epoch-micros LongType, `html` as BinaryType (opaque bytes, no
   * UTF-8 re-interpretation), everything else StringType.
   */
  def decodeColumns(spark: SparkSession, root: String, wanted: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(wanted.nonEmpty, "no columns requested")
    require(wanted.forall(PageColumns),
      s"unknown columns ${wanted.filterNot(PageColumns)}; available: $PageColumns")
    requireWebtext(root)
    // memoizable: the pre-scan's input is fully determined by (snapshot,
    // wanted column set, split confs) — all in the key
    val t0 = graft.sources.v2.GraftDataSource.storeIdentityToken(root)
    val df = blocks(spark, root).where(col("column").isin(wanted: _*))
    projectedReassemble(spark, df, wanted,
      preScanKey(spark, root, None, wanted.toSet, t0))
  }

  /** Column-projected hybrid reassembly of a (possibly pre-pruned) blocks scan. */
  private def projectedReassemble(spark: SparkSession,
      filteredBlocks: org.apache.spark.sql.DataFrame,
      wanted: Seq[String],
      memoKey: Option[AnyRef] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(wanted.map {
      case "warc_ts" => StructField("warc_ts", LongType, nullable = true)
      case "html" => StructField("html", BinaryType, nullable = true)
      case c => StructField(c, StringType, nullable = true)
    })
    val rowEnc = Encoders.row(schema)
    val order = wanted.toArray
    def decodeGroup(cols: Map[String, Array[Byte]]): Iterator[Row] = {
      // resolve every column to a positional extractor ONCE per 64Ki-row
      // group — the per-row loop then only indexes arrays (the naive per-cell
      // form paid a Seq allocation plus ~order.length hash probes and string
      // name-matches PER ROW on the primary projected-read path)
      val ts: (Array[Long], Array[Boolean]) =
        if (cols.contains("warc_ts")) IntBlockCodec.decodeNullable(cols("warc_ts")) else null
      var n = if (ts != null) ts._1.length else 0
      val extractors: Array[Int => AnyRef] = order.map {
        case "warc_ts" =>
          if (ts == null) (_: Int) => null
          else (i: Int) => if (ts._2(i)) java.lang.Long.valueOf(ts._1(i)) else null
        case c =>
          if (!cols.contains(c)) (_: Int) => null
          else {
            val vs = StringBlockCodec.decode(cols(c))
            n = vs.length
            if (c == "html") (i: Int) => vs(i) // opaque binary: lossless
            else (i: Int) => {
              val b = vs(i)
              if (b == null) null else new String(b, StandardCharsets.UTF_8)
            }
          }
      }
      (0 until n).iterator.map { i =>
        val vals = new Array[Any](extractors.length)
        var j = 0
        while (j < extractors.length) { vals(j) = extractors(j)(i); j += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericRow(vals): Row
      }
    }
    hybridReassemble(spark, filteredBlocks, wanted.toSet, rowEnc, memoKey)(decodeGroup).toDF()
  }

  /**
   * Verify decoded pages against an original dataset: equi-join on url, compare every
   * column (text compared byte-exact). Returns mismatch count (0 == pass).
   */
  def verifyAgainst(original: Dataset[WebPage], decoded: Dataset[WebPage]): Long = {
    val o = original.toDF("url", "warc_ts", "html", "text", "lang")
    val d = decoded.toDF("url", "d_warc_ts", "d_html", "d_text", "d_lang")
    val oCnt = o.count()
    val dCnt = d.count()
    // PRECONDITION, enforced: url must be a unique non-null key of the
    // original (the synthetic corpus guarantees it). With duplicate urls the
    // equi-join cross-products same-url rows and reports mismatches on a
    // byte-perfect decode; with null urls rows silently never join.
    val oKeys = o.where(col("url").isNotNull).select(col("url")).distinct().count()
    require(oKeys == oCnt,
      s"verifyAgainst needs unique non-null urls in the original: " +
      s"$oCnt rows but $oKeys distinct non-null urls")
    // decoded-side DUPLICATES are invisible to the equi-join (every copy
    // matches) and can exactly offset a dropped row in the count delta —
    // count them directly (multiple decoded nulls land here too)
    val dupDelta = dCnt - d.select(col("url")).distinct().count()
    // null-SAFE comparisons: `=!=` yields null (filtered out) when either side
    // is null, so a decoder regression that NULLS a column would pass silently
    val columnMismatches = o.join(d, Seq("url"), "full_outer")
      .where(
        !(col("d_text") <=> col("text")) ||
        !(col("d_lang") <=> col("lang")) ||
        !(col("d_warc_ts") <=> col("warc_ts")) ||
        !(col("d_html") <=> col("html")))
      .count()
    // the count delta catches dropped/extra rows (the double-decode failure
    // mode the live-part filtering and the reassembly fallback exist to
    // prevent); dupDelta covers the drop+duplicate offset the delta misses
    columnMismatches + dupDelta + math.abs(oCnt - dCnt)
  }

  def main(args: Array[String]): Unit = {
    val root = if (args.length > 0) args(0) else "/tmp/graft-store"
    val n = if (args.length > 1) args(1).toLong else -1L
    val spark = LocalSession.create("graft-decode")
    val decoded = decode(spark, root)
    // rows from the manifest: an extra full decode just to print a count
    // would double the timed runs' wall-clock on a large store
    val manifestRows = SnapshotStore.currentEntries(root).map(_.nRows).sum
    if (n >= 0) {
      val mismatches = verifyAgainst(graft.sources.Webtext.generate(spark, n, 32), decoded)
      println(s"decoded rows=$manifestRows mismatches=$mismatches")
      require(mismatches == 0L, s"$mismatches mismatching rows")
    } else {
      // min-of-3 timed decodes (first pays JIT) — the read-path number
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        decoded.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"decoded rows=$manifestRows decode_secs_min=${times.min}%.3f")
    }
    spark.stop()
  }
}
