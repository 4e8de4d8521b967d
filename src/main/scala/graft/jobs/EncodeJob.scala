package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{IntBlockCodec, StringBlockCodec}
import graft.core.PhysicalIntType
import graft.sources.{SnapshotStore, WebPage, Webtext}

/**
 * One encoded block of one column of one work unit, with pruning metadata:
 *  - `block_min`/`block_max`: value bounds of integer blocks (None when the block
 *    holds no non-null value)
 *  - `block_dict`: all distinct values when cardinality <= 256 (dictionary metadata;
 *    None otherwise)
 *  - `block_str_min`/`block_str_max`: bounds for text-typed string blocks, emitted
 *    only when the bound string is <= 64 chars (None = no bound; truncating a max
 *    would be unsound)
 *  - `block_str_dict`: distinct strings when cardinality <= 64 (e.g. `lang`)
 *  - `n_nulls`: EXACT count of null values in the block — string bounds say
 *    nothing about nulls (they are computed over non-null values only), so
 *    order-sensitive planning (the V2 ORDER BY url LIMIT n group-prefix
 *    pruning) needs this to know whether a group can contribute null rows.
 *    Stores written before this column existed read it as null = unknown,
 *    which every consumer must treat as "may contain nulls" (sound).
 * [[graft.plans.BlockMinMaxPruneRule]] conjoins these onto decode filters so parquet
 * row-group stats skip blocks before any decompression.
 */
final case class BlockRow(
    part_id: Int,
    block_seq: Int,
    column: String,
    typ: String,
    codec: String,
    n: Int,
    n_nulls: Int,
    block_min: Option[Long],
    block_max: Option[Long],
    // exact sum of the block's non-null values (int family only): what makes
    // `SELECT sum(col)` answerable from metadata. None for string blocks, for
    // all-null blocks, and when the block's own sum overflows a signed 64-bit
    // (the pushdown then declines — sound; Spark computes with its own
    // overflow semantics). Stores written before this column read it as
    // null = sum unknown (decline)
    block_sum: Option[Long],
    block_dict: Option[Array[Long]],
    block_str_min: Option[String],
    block_str_max: Option[String],
    block_str_dict: Option[Array[String]],
    // per-dict-value occurrence counts, aligned with block_str_dict: what
    // makes grouped aggregates (`SELECT lang, count(*) GROUP BY lang`)
    // answerable from metadata alone. None whenever block_str_dict is None;
    // stores written before this column read it as null = counts unknown
    // (grouped pushdown then declines — sound)
    block_str_dict_counts: Option[Array[Long]],
    orig_bytes: Long,
    enc_bytes: Long,
    encoded: Array[Byte])

/**
 * Columnar encode job (SURVEY.md §3.4 lifecycle):
 *
 *  1. PLAN    — read input snapshot; left-anti join against committed part manifest
 *               (resume from last checkpoint, north_rule).
 *  2. PARTITION — explicit range partitioning on `url` via deterministic sampled
 *               boundaries persisted next to the store (same work units on re-run).
 *  3. ENCODE  — `Dataset.mapPartitions` kernel: per column slice, stats → codec
 *               auto-choice → self-describing block rows. Single pass, bounded
 *               memory (64Ki rows per block).
 *  4. COMMIT  — stage parquet to a fresh data dir, roll up per-part lineage +
 *               metrics, atomic manifest swap. Each commit is a checkpoint.
 *
 * Scale notes: the only wide exchange is the one repartition by part_id; encode and
 * metric rollup are map-side; the committed-parts side of the anti-join is broadcast
 * (manifest rows ≪ data). Work units are a pure function of (url, boundaries), so
 * skew in `lang`/`host` cannot skew tasks — urls are ~unique. Group-level skew is
 * handled where grouping happens (salted two-phase rollups in metrics queries).
 */
object EncodeJob {

  val BlockSize = 65536

  /**
   * Byte bound on one buffered block: 64Ki fat rows (multi-KB web pages) would
   * otherwise hold 100s of MB per in-flight task — 32 concurrent tasks × that is
   * an executor OOM at real page sizes. Blocks flush at whichever bound hits
   * first; the formats are self-describing, so variable block sizes cost nothing.
   */
  val MaxBlockBytes: Long = 64L << 20

  // ---------------- range boundaries (deterministic, persisted) ----------------

  /**
   * Deterministic sample of urls -> parts-1 sorted boundary strings.
   * The sampling rate adapts to the row count (parquet count() is metadata-only, so
   * this costs no data scan) and the sample is a pure hash filter — unbiased across
   * the whole input, unlike limit(), which would only see the first files read and
   * skew every boundary at scale.
   */
  def computeBoundaries(pages: Dataset[WebPage], parts: Int,
                        knownTotal: Option[Long] = None): Array[String] = {
    val spark = pages.sparkSession
    import spark.implicits._
    computeUrlBoundaries(pages.select($"url").as[String], parts, knownTotal)
  }

  /**
   * ONE-pass (row count, partition count, range boundaries) for the V2
   * write-arrange rule (r7, closing the r6 verdict item: the separate
   * `count()` job computed the write's child a second time — for a child
   * where column pruning cannot cheapen the url projection, a third full
   * compute on top of the sample and the write itself).
   *
   * Per partition: exact row count + a deterministic uniform reservoir of
   * SAMPLEABLE urls (exclusions identical to [[computeUrlBoundaries]]: null,
   * empty, and newline-holding urls can never become split points — they
   * still bucket fine as data). Driver side: the caller's sizing function
   * turns the exact total into the partition count, then boundaries are
   * weighted quantiles over the merged reservoirs (each sampled url stands
   * for eligible_i/|sample_i| rows — the public RangePartitioner scheme).
   * Deterministic for a given input partitioning: the reservoir PRNG is
   * seeded per partition index. Boundary QUALITY matches the hash-threshold
   * sampler (~200+ candidates per split point at the default sizes); the
   * exact split points differ, which only moves block-range edges — content,
   * ordering guarantees, and prefix pruning are unaffected.
   */
  def countAndUrlBoundaries(urls: Dataset[String],
                            partsFor: Long => Int): (Long, Int, Array[String]) = {
    val rdd = urls.rdd
    // driver-collect bound (review finding): a many-thousand-partition input
    // must not collect 4096 urls PER partition — scale the per-partition
    // reservoir so the total candidate collect stays ~2^18 strings at any
    // width (the old hash-threshold sampler's 200k bound, same order), with
    // a floor so every partition still contributes weighted candidates
    val ReservoirPerPartition =
      math.max(16, math.min(4096, (1 << 18) / math.max(1, rdd.getNumPartitions)))
    val partials = rdd.mapPartitionsWithIndex { (idx, it) =>
      val rng = new java.util.Random(scala.util.hashing.byteswap32(idx).toLong)
      val res = new Array[String](ReservoirPerPartition)
      var total = 0L
      var eligible = 0L
      while (it.hasNext) {
        val u = it.next()
        total += 1
        if (u != null && u.nonEmpty && u.indexOf('\n') < 0) {
          if (eligible < ReservoirPerPartition) res(eligible.toInt) = u
          else {
            val j = (rng.nextDouble() * (eligible + 1).toDouble).toLong
            if (j < ReservoirPerPartition) res(j.toInt) = u
          }
          eligible += 1
        }
      }
      Iterator.single((total, eligible,
        java.util.Arrays.copyOf(res, math.min(eligible, ReservoirPerPartition.toLong).toInt)))
    }.collect()
    val total = partials.iterator.map(_._1).sum
    val parts = partsFor(total)
    val eligibleTotal = partials.iterator.map(_._2).sum
    if (parts <= 1 || eligibleTotal == 0) return (total, parts, Array.empty)
    // weighted candidates, sorted by url (the same String ordering
    // computeUrlBoundaries' `.sorted` uses, which RangeBucketId mirrors)
    val candidates = new scala.collection.mutable.ArrayBuffer[(String, Double)](
      partials.iterator.map(_._3.length).sum)
    partials.foreach { case (_, elig, sample) =>
      if (sample.nonEmpty) {
        val w = elig.toDouble / sample.length
        sample.foreach(u => candidates += ((u, w)))
      }
    }
    val sorted = candidates.sortBy(_._1)
    val step = eligibleTotal.toDouble / parts
    val bounds = new scala.collection.mutable.ArrayBuffer[String](parts - 1)
    var cum = 0.0
    var target = step
    var last: String = null
    var i = 0
    while (i < sorted.length && bounds.length < parts - 1) {
      cum += sorted(i)._2
      if (cum >= target) {
        val u = sorted(i)._1
        if (last == null || u.compareTo(last) > 0) { bounds += u; last = u }
        target += step
      }
      i += 1
    }
    (total, parts, bounds.toArray)
  }

  /** Boundary computation over a bare url column — shared by the batch job
    * (above) and the V2 write-arrange rule ([[graft.plans.GraftWriteArrangeRule]]),
    * whose input is an arbitrary resolved query, not a WebPage dataset. */
  def computeUrlBoundaries(urlsCol: Dataset[String], parts: Int,
                           knownTotal: Option[Long] = None): Array[String] = {
    if (parts <= 1) return Array.empty
    val spark = urlsCol.sparkSession
    import spark.implicits._
    val targetSample = math.min(parts * 200L, 200000L)
    // knownTotal skips the count() pass — for PARQUET inputs count is
    // metadata-only, but compaction's input is a full decode, where an extra
    // count() decompresses every block again
    val total = math.max(knownTotal.getOrElse(urlsCol.count()), 1L)
    val rateDenom = 1000000L
    val threshold = math.min((targetSample * rateDenom) / total + 1, rateDenom)
    // null urls are excluded from the SAMPLE only: a null can never be a split
    // point (RangeBucketId buckets null as "", i.e. always part 0), and
    // xxhash64(null)'s sampling behavior would otherwise decide whether this
    // sort NPEs — stores with null urls were un-encodable depending on which
    // rows the hash picked
    // empty and newline-holding urls are excluded from the SAMPLE only (they
    // still bucket fine as data): a "" boundary vanishes in the persisted
    // file's split/filter round-trip and an embedded newline splits into two
    // bogus boundaries — a resumed run would re-bucket rows under a DIFFERENT
    // layout than the one committed, which the anti-join then turns into
    // silently dropped or duplicated rows. Any sampled url is just a split
    // point, so narrowing the sample never hurts correctness.
    val urls = urlsCol
      .where($"url".isNotNull && $"url" =!= "" && !$"url".contains("\n") &&
        pmod(xxhash64($"url"), lit(rateDenom)) < lit(threshold))
      .collect().sorted
    if (urls.isEmpty) Array.empty
    else Array.tabulate(parts - 1) { i =>
      urls(((i + 1).toLong * urls.length / parts).toInt.min(urls.length - 1))
    }.distinct
  }

  def loadOrCreateBoundaries(root: String, pages: Dataset[WebPage], parts: Int,
                             boundariesFile: String = "BOUNDARIES"): Array[String] = {
    val p = Paths.get(root, boundariesFile)
    if (Files.exists(p)) {
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    } else {
      // r7: ONE url-only pass (count folded into the reservoir sample) — the
      // previous computeBoundaries ran a count() job AND a sample job over the
      // input before the encode itself, a fixed per-run cost at every
      // parallelism level. Resume determinism is unchanged: boundaries are
      // persisted below and re-read, never recomputed.
      val spark = pages.sparkSession
      import spark.implicits._
      val (_, _, bs) = countAndUrlBoundaries(pages.select($"url").as[String], _ => parts)
      SnapshotStore.writeSidecar(root, boundariesFile, bs.mkString("\n"))
      // return what a RESUMED run will parse back, not the in-memory array:
      // create and resume must bucket identically or the resume anti-join
      // drops/duplicates rows (the sample filter above makes the round-trip
      // lossless; this is belt and braces against future boundary sources)
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    }
  }

  /** part_id = range bucket of url (pure function of url + persisted boundaries).
    * Single source of truth: [[graft.functions.RangeBucketId.bucket]] — the same
    * search the codegen'd expression runs, so the invariant cannot drift. */
  def partIdFor(url: String, boundaries: Array[String]): Int =
    graft.functions.RangeBucketId.bucket(boundaries, url)

  // ---------------- encode kernel ----------------

  /** Max distinct values stored as dictionary metadata per block. */
  val IntDictCap = 256
  val StrDictCap = 64
  /** Max chars for a stored string bound (a truncated max would be unsound). */
  val StrBoundMaxLen = 64

  /** One string/binary column's buffered values -> encoded BlockRow with
    * bounds/dict/count metadata. `textual` = UTF-8 string columns where that
    * metadata is meaningful; opaque binary gets none (converting it to String
    * would be unsound). Shared by the webtext kernel and the generalized
    * schema-driven V2 writer. */
  private[graft] def strBlockRow(partId: Int, seq: Int, name: String,
      vs: java.util.ArrayList[Array[Byte]], textual: Boolean): BlockRow = {
    val arr = vs.toArray(new Array[Array[Byte]](vs.size))
    val enc = StringBlockCodec.encode(arr)
    var orig = 0L
    var nulls = 0
    arr.foreach(v => if (v != null) orig += v.length else nulls += 1)

    var mn: Array[Byte] = null
    var mx: Array[Byte] = null
    // TreeMap value -> occurrence count: the counts are the dict metadata
    // that lets grouped aggregates answer from blocks without decoding
    var dict: java.util.TreeMap[String, Long] =
      if (textual) new java.util.TreeMap[String, Long]() else null
    if (textual) {
      var i = 0
      while (i < arr.length) {
        val v = arr(i)
        if (v != null) {
          if (mn == null || java.util.Arrays.compareUnsigned(v, mn) < 0) mn = v
          if (mx == null || java.util.Arrays.compareUnsigned(v, mx) > 0) mx = v
          // dict metadata is for short low-cardinality columns (lang); a long
          // value disqualifies the block and stops the per-value String copies
          if (dict != null) {
            if (v.length > 128 || dict.size > StrDictCap) dict = null
            else dict.merge(new String(v, StandardCharsets.UTF_8), 1L, (a, b) => a + b)
          }
        }
        i += 1
      }
    }
    def bound(v: Array[Byte]): Option[String] =
      if (v == null) None
      else {
        val s = new String(v, StandardCharsets.UTF_8)
        if (s.length <= StrBoundMaxLen) Some(s) else None
      }
    val (strDict, strDictCounts) =
      if (dict != null && dict.size <= StrDictCap && mn != null) {
        val ds = new Array[String](dict.size)
        val cs = new Array[Long](dict.size)
        val it = dict.entrySet().iterator()
        var j = 0
        while (it.hasNext) { val e = it.next(); ds(j) = e.getKey; cs(j) = e.getValue; j += 1 }
        (Some(ds), Some(cs))
      } else (None, None)

    BlockRow(partId, seq, name, "str", StringBlockCodec.codecName(enc), arr.length,
      nulls, None, None, None, None, bound(mn), bound(mx), strDict, strDictCounts,
      orig, enc.length.toLong, enc)
  }

  /** One integer-family column's buffered values (epoch-micros timestamps,
    * longs, ints, ...) -> encoded BlockRow with exact min/max + dict metadata.
    * Values ride as Long regardless of width; `t` picks the physical codec
    * family and the original-bytes accounting. */
  private[graft] def intBlockRow(partId: Int, seq: Int, name: String,
      vals: Array[Long], valid: Array[Boolean], n: Int,
      t: PhysicalIntType): BlockRow = {
    val slice = java.util.Arrays.copyOf(vals, n)
    val validSlice = java.util.Arrays.copyOf(valid, n)
    val enc = IntBlockCodec.encodeNullable(slice, validSlice, t)
    var mn = Long.MaxValue; var mx = Long.MinValue
    var any = false
    var validN = 0
    var sum = 0L
    var sumOk = true // a block whose own sum overflows i64 carries no sum
    val distinct = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      if (valid(i)) {
        val v = vals(i)
        if (v < mn) mn = v
        if (v > mx) mx = v
        if (sumOk) {
          try sum = Math.addExact(sum, v)
          catch { case _: ArithmeticException => sumOk = false }
        }
        any = true
        validN += 1
        if (distinct.size <= IntDictCap) distinct.add(v)
      }
      i += 1
    }
    val intDict =
      if (any && distinct.size <= IntDictCap) {
        val out = new Array[Long](distinct.size)
        val it = distinct.iterator()
        var j = 0
        while (it.hasNext) { out(j) = it.next(); j += 1 }
        Some(out)
      } else None
    BlockRow(partId, seq, name, t.name, IntBlockCodec.info(enc).codecName, n,
      n - validN,
      if (any) Some(mn) else None, if (any) Some(mx) else None,
      if (any && sumOk) Some(sum) else None, intDict,
      None, None, None, None, n.toLong * (t.width / 8), enc.length.toLong, enc)
  }

  /** Encode one buffered block (all 5 webtext columns) into BlockRows.
    * `private[graft]`: the V2 write path runs the same kernel push-style
    * inside each DataWriter task. */
  private[graft] def flushBlock(partId: Int, seq: Int,
      urls: java.util.ArrayList[Array[Byte]],
      ts: Array[Long], tsValid: Array[Boolean], tsN: Int,
      htmls: java.util.ArrayList[Array[Byte]],
      texts: java.util.ArrayList[Array[Byte]],
      langs: java.util.ArrayList[Array[Byte]]): Seq[BlockRow] =
    Seq(
      strBlockRow(partId, seq, "url", urls, textual = true),
      intBlockRow(partId, seq, "warc_ts", ts, tsValid, tsN, PhysicalIntType.I64),
      strBlockRow(partId, seq, "html", htmls, textual = false),
      strBlockRow(partId, seq, "text", texts, textual = true),
      strBlockRow(partId, seq, "lang", langs, textual = true))

  /** Kernel row: raw UTF-8 bytes and epoch micros (+ validity for null warc_ts) —
    * no Timestamp, no String re-materialization (UTF8String -> String -> getBytes
    * showed up hot). Null byte arrays stay null end-to-end (null != ""). */
  type EncRow = (Int, Array[Byte], Long, Boolean, Array[Byte], Array[Byte], Array[Byte])

  /** The mapPartitions kernel: rows arrive sorted by (part_id, url). */
  def encodePartition(rows: Iterator[EncRow],
                      maxBlockBytes: Long = MaxBlockBytes): Iterator[BlockRow] = new Iterator[BlockRow] {
    private var out: Iterator[BlockRow] = Iterator.empty
    private var curPart = -1
    private var blockSeq = 0
    private val urls = new java.util.ArrayList[Array[Byte]](BlockSize)
    private val htmls = new java.util.ArrayList[Array[Byte]](BlockSize)
    private val texts = new java.util.ArrayList[Array[Byte]](BlockSize)
    private val langs = new java.util.ArrayList[Array[Byte]](BlockSize)
    private val ts = new Array[Long](BlockSize)
    private val tsValid = new Array[Boolean](BlockSize)
    private var n = 0
    private var bufBytes = 0L

    @inline private def lenOf(bs: Array[Byte]): Int = if (bs == null) 0 else bs.length

    private def flush(): Seq[BlockRow] = {
      if (n == 0) Seq.empty
      else {
        val res = flushBlock(curPart, blockSeq, urls, ts, tsValid, n, htmls, texts, langs)
        urls.clear(); htmls.clear(); texts.clear(); langs.clear()
        n = 0; bufBytes = 0L; blockSeq += 1
        res
      }
    }

    override def hasNext: Boolean = {
      while (!out.hasNext && rows.hasNext) {
        val (pid, url, tsUs, tsOk, html, text, lang) = rows.next()
        var flushed: Seq[BlockRow] = Seq.empty
        if (pid != curPart) { flushed = flush(); curPart = pid; blockSeq = 0 }
        else if (n == BlockSize || bufBytes >= maxBlockBytes) flushed = flush()
        urls.add(url)
        htmls.add(html)
        texts.add(text)
        langs.add(lang)
        ts(n) = tsUs
        tsValid(n) = tsOk
        n += 1
        bufBytes += lenOf(url) + lenOf(html) + lenOf(text) + lenOf(lang) + 16L
        if (flushed.nonEmpty) out = flushed.iterator
      }
      if (!out.hasNext && !rows.hasNext && n > 0) out = flush().iterator
      out.hasNext
    }
    override def next(): BlockRow = { if (!hasNext) throw new NoSuchElementException; out.next() }
  }

  // ---------------- job ----------------

  final case class RunResult(snapshotId: Long, partsEncoded: Int, nRows: Long,
      origBytes: Long, encBytes: Long, jobSecs: Double)

  /** Narrow pre-shuffle projection with codegen'd range-bucket part ids: epoch
    * micros instead of Timestamp, no case-class re-materialization — less shuffle
    * IO and no per-row boxing (a Scala UDF here broke whole-stage codegen). */
  def withPartIds(pages: DataFrame, boundaries: Array[String], offset: Int): DataFrame = {
    val partIdCol = org.apache.spark.sql.graftshim.Shim.column(
      graft.functions.RangeBucketId(
        org.apache.spark.sql.graftshim.Shim.expression(col("url")), boundaries, offset))
    pages.select(partIdCol.as("part_id"), col("url"),
      coalesce(unix_micros(col("warc_ts").cast("timestamp")), lit(0L)).as("ts_us"),
      col("warc_ts").isNotNull.as("ts_valid"),
      col("html"), col("text"), col("lang"))
  }

  /**
   * Shuffle-once encode of a prepared narrow frame (part_id, url, ts_us, ts_valid,
   * html, text, lang) into a fresh STAGED data dir plus per-part lineage entries —
   * no commit; callers commit (append for waves, replace for compaction).
   * Returns (relative data dir, entries, seconds in the distributed write).
   */
  def stageEncode(spark: SparkSession, prepared: DataFrame, numParts: Int,
                  root: String,
                  maxBlockBytes: Long = MaxBlockBytes): (String, Seq[SnapshotStore.PartEntry], Double) = {
    import spark.implicits._
    // one exchange: co-locate each work unit, order inside for block locality
    val blocks = prepared
      .repartition(math.max(numParts, 1), $"part_id")
      .sortWithinPartitions($"part_id", $"url")
      .select(col("part_id"), col("url").cast("binary").as("url"), col("ts_us"),
        col("ts_valid"), col("html"), col("text").cast("binary").as("text"),
        col("lang").cast("binary").as("lang"))
      .as[EncRow]
      .mapPartitions(it => encodePartition(it, maxBlockBytes))

    val (relDir, absDir) = SnapshotStore.newDataDir(root)
    val jt0 = System.nanoTime()
    // the dominant column is `encoded` — already codec-compressed, high-entropy
    // bytes; running snappy over it again costs CPU in every task for ~0 size win
    blocks.write.mode(SaveMode.Overwrite)
      .option("compression", "uncompressed").parquet(absDir)
    val secs = (System.nanoTime() - jt0) / 1e9

    // lineage + metrics rollup from the staged files (no recompute, no driver
    // loops). Two-level: first per (part_id, column) — a multi-block part can
    // pick DIFFERENT codecs for the same column per block, so codecs must be
    // deduped per column BEFORE map_from_entries (a duplicate map key throws
    // DUPLICATED_MAP_KEY at runtime and would abort the wave after staging)
    val staged = spark.read.parquet(absDir)
    val perColumn = staged.groupBy($"part_id", $"column").agg(
      sum($"n").as("col_n"),
      sum($"orig_bytes").as("col_orig"),
      sum($"enc_bytes").as("col_enc"),
      array_join(array_sort(collect_set($"codec")), "+").as("codec"))
    val perPart = perColumn.groupBy($"part_id").agg(
      max(when($"column" === "url", $"col_n").otherwise(0L)).as("n_rows"),
      sum($"col_orig").as("orig_bytes"),
      sum($"col_enc").as("enc_bytes"),
      to_json(map_from_entries(collect_list(struct($"column", $"codec")))).as("codecs"))
      .collect()
    val entries = perPart.map { r =>
      SnapshotStore.PartEntry(r.getAs[Int]("part_id"), relDir, r.getAs[Long]("n_rows"),
        r.getAs[Long]("orig_bytes"), r.getAs[Long]("enc_bytes"), r.getAs[String]("codecs"))
    }.toSeq
    (relDir, entries, secs)
  }

  /**
   * Encode all pending work units. `waves` splits the part range into that many
   * commit groups — each wave is one Spark job ending in an atomic manifest commit,
   * so a killed run loses at most one wave and the next run resumes behind the last
   * committed checkpoint. `maxWaves` exists for kill/resume tests.
   */
  def run(spark: SparkSession, pages: Dataset[WebPage], root: String, parts: Int,
          waves: Int = 1, maxWaves: Int = Int.MaxValue, partOffset: Long = 0L,
          maxBlockBytes: Long = MaxBlockBytes,
          boundariesFile: String = "BOUNDARIES"): RunResult = {
    // part ids are Int: a streaming batchId*parts namespace past Int.MaxValue
    // would wrap NEGATIVE (colliding with the compaction namespace and earlier
    // batches) and silently drop work in the resume anti-join — fail fast
    require(partOffset >= 0 && partOffset + parts <= Int.MaxValue.toLong,
      s"part-id namespace [$partOffset, ${partOffset + parts}) exceeds the Int range")
    import spark.implicits._
    Files.createDirectories(Paths.get(root))
    val boundaries = loadOrCreateBoundaries(root, pages, parts, boundariesFile)
    // a smaller `parts` than the persisted range layout would leave buckets
    // >= partOffset+parts outside every wave's pending set: rows bucketed there
    // would be SILENTLY skipped (never encoded, never an error). Boundaries
    // define bucket count for the life of the store — fail fast instead.
    require(parts >= boundaries.length + 1,
      s"store at $root is range-partitioned into ${boundaries.length + 1} buckets " +
      s"($boundariesFile); parts=$parts would silently skip buckets " +
      s"${partOffset + parts}..${partOffset + boundaries.length} — " +
      s"pass parts >= ${boundaries.length + 1}")

    val withPart = withPartIds(pages.toDF(), boundaries, partOffset.toInt)

    // RESUME: drop work units already committed (anti-join against the manifest —
    // broadcast; manifest rows ≪ data at any scale). Only REACHABLE ids can
    // pend: the bucket function yields 0..boundaries.length, so when a skewed
    // sample left fewer distinct boundaries than parts-1, ids past the bucket
    // count can never produce a row — treating them as pending would re-scan
    // the whole input on every call to a fully-encoded store, forever.
    val committed = SnapshotStore.committedPartIds(root)
    val reachable = partOffset.toInt until (partOffset + boundaries.length + 1).toInt
    val pendingParts = reachable.filterNot(committed)
    val waveSize = math.max(1, (pendingParts.size + waves - 1) / math.max(waves, 1))
    val groups = pendingParts.grouped(waveSize).take(maxWaves).toSeq

    var totalEntries = Seq.empty[SnapshotStore.PartEntry]
    var lastSnap = SnapshotStore.currentSnapshotId(root).getOrElse(0L)
    var jobSecs = 0.0

    for (group <- groups) {
      // the wave's group already excludes committed ids; a CONCURRENT writer
      // racing the same ids is refused loudly by commitReplacing's uniqueness
      // guard at commit time (a re-filter here would hide the race silently)
      val pending = withPart
        .join(broadcast(group.toDF("part_id")), Seq("part_id"), "left_semi")

      val (_, entries, secs) = stageEncode(spark, pending, group.size, root, maxBlockBytes)
      jobSecs += secs
      // a wave of genuinely empty ranges stages nothing: committing would bump
      // an identical empty snapshot per call (manifest churn, never converges)
      if (entries.nonEmpty) lastSnap = SnapshotStore.commit(root, entries)
      totalEntries ++= entries
    }

    RunResult(lastSnap, totalEntries.size, totalEntries.map(_.nRows).sum,
      totalEntries.map(_.origBytes).sum, totalEntries.map(_.encBytes).sum, jobSecs)
  }

  /** spark-submit main: generate webtext and encode it into a snapshot store. */
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val root = if (args.length > 1) args(1) else "/tmp/graft-store"
    val parts = if (args.length > 2) args(2).toInt else 32
    val waves = if (args.length > 3) args(3).toInt else 1
    val spark = LocalSession.create("graft-encode")
    val res = run(spark, Webtext.generate(spark, n, parts), root, parts, waves)
    println(s"encoded: $res ratio=${res.origBytes.toDouble / math.max(res.encBytes, 1)}")
    spark.stop()
  }
}
