package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines. All are
 * declarative DataFrame pipelines: Catalyst plans them, every grouping is a plain
 * hash shuffle on a well-distributed key (hashes), so they scale linearly and skew-free
 * to 10^12 documents.
 *
 * Note on caching: the pair miners cache their signature/vector datasets (reused
 * by the banding pass and both verify joins) and cannot unpersist them from
 * inside a lazy result. Drivers looping many mining calls in one session should
 * `spark.catalog.clearCache()` between corpora, or accept LRU eviction.
 */
object Dedup {

  /**
   * Exact dedup: one representative (min id) per identical text.
   * Single shuffle keyed on the 128-bit md5 of the text — shuffle rows stay narrow
   * (16B key + id instead of whole documents) and 128 bits keeps collision odds
   * negligible even at 10^12 documents (vs ~3% birthday risk at 64 bits).
   */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL-text documents (failed extraction, unparsed) share no content and
    // are NOT duplicates of each other — md5(NULL) is NULL, so grouping them
    // would keep ONE representative of thousands of distinct documents and
    // silently drop the rest. They all pass through.
    val deduped = df.where(col(textCol).isNotNull)
      .groupBy(md5(col(textCol).cast("binary")))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.where(col(textCol).isNull).select(col(idCol)).unionByName(deduped)
  }

  /**
   * Normalized word shingles of size n as an array column. Zero-shingle documents
   * (fewer than n words) yield an empty array — without the guard, `sequence(0, -1)`
   * steps backwards and `slice(words, 0, n)` throws INVALID_PARAMETER_VALUE.START.
   */
  def shingles(textCol: Column, n: Int): Column = {
    // ONE tokenizer definition ([[TextAnalysis.tokens]]): empty edge tokens
    // dropped, so the documented equivalence with the one-pass kernel
    // ([[distinctShingles]]) holds for every whitespace shape
    val words = TextAnalysis.tokens(lower(textCol))
    // sliding n-grams via transform over word indexes
    val cnt = greatest(size(words) - (n - 1), lit(0))
    when(cnt === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(words, i, lit(n)))))
  }

  // ---- JVM kernels (one pass per document; the declarative higher-order-function
  // form re-evaluates the shingle subtree per seed, which is 30x slower) ----

  /** FNV-1a hashes of lowercased whitespace tokens. Separator set matches
    * [[distinctShingles]] exactly, so the LSH candidate generation and the
    * exact shingle verify tokenize identically (a \f- or -separated text
    * previously fused tokens here but split them in the verify). */
  private[operators] def tokenHashes(text: String): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var h = 0xCBF29CE484222325L
    var inTok = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Kernels.isWs(c)) {
        if (inTok) { out += h; h = 0xCBF29CE484222325L; inTok = false }
      } else {
        h = (h ^ Character.toLowerCase(c).toInt) * 0x100000001B3L
        inTok = true
      }
      i += 1
    }
    if (inTok) out += h
    out.result()
  }

  /** One-pass minhash signature over word shingles of size n. */
  def minhashSignature(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val toks = tokenHashes(text)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (toks.length < shingleSize) {
      // degenerate short doc: hash the whole token sequence as one shingle
      var h = 0L
      var i = 0
      while (i < toks.length) { h = h * 0x9E3779B97F4A7C15L + toks(i); i += 1 }
      var s = 0
      while (s < numHashes) { sig(s) = Kernels.mix64(h ^ (s.toLong * 0xC2B2AE3D27D4EB4FL)); s += 1 }
      return sig
    }
    var i = 0
    while (i + shingleSize <= toks.length) {
      var h = 0L
      var j = 0
      while (j < shingleSize) { h = h * 0x9E3779B97F4A7C15L + toks(i + j); j += 1 }
      var s = 0
      while (s < numHashes) {
        val v = Kernels.mix64(h ^ (s.toLong * 0xC2B2AE3D27D4EB4FL))
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    sig
  }

  /**
   * MinHash signatures as a typed kernel: input plus `sig` (array<long> numHashes).
   */
  def withMinhashSignature(df: DataFrame, textCol: String,
                           numHashes: Int, shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idCols = df.columns.filter(_ != textCol)
    require(idCols.length == 1, "withMinhashSignature expects (id, text) input")
    df.select(col(idCols.head).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, minhashSignature(if (t == null) "" else t, numHashes, shingleSize))
      })
      .toDF(idCols.head, "sig")
  }

  /**
   * MinHash + LSH near-duplicate pairs: band the signature, shuffle once on
   * (band index, band hash), emit candidate pairs inside each bucket, then verify
   * with exact signature agreement >= `threshold` (estimated Jaccard).
   *
   * Scale: bucket sizes are bounded by near-duplicate cluster sizes; the
   * self-join inside a bucket happens on grouped ids, never a cartesian across
   * buckets. Only ids ride the banded shuffle — a true near-dup collides in
   * MANY bands, so attaching the 64-long signature arrays before the (a, b)
   * dedup multiplied shuffle bytes by bands x 512B (measured 40% of the query);
   * instead candidates dedup narrow and signatures join once per distinct pair.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleSize: Int = 5, threshold: Double = 0.8,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // bands must tile the signature exactly: integer division would silently
    // drop trailing hashes, and bands > numHashes degenerates to empty band
    // slices (every row in ONE bucket per band -> the cap drops everything)
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) exactly")
    val spark = df.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val signed = withMinhashSignature(df.select(col(idCol), col(textCol)), textCol,
      numHashes, shingleSize)
      .withColumnRenamed(idCol, "id")
      .cache() // sig is reused by the banding pass and both verify joins

    val banded = signed.select(
      $"id",
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select($"id", $"bb.band", $"bb.bucket")

    // mega-cluster guard: a boilerplate bucket of B members contributes B^2/2
    // candidate pairs; skip buckets over the cap (bounded recall loss, logged
    // via the bucket-size aggregate, which shares the self-join's partitioning)
    val bounded = capBuckets(banded, Seq("band", "bucket"), maxBucket)

    val a = bounded.select($"band", $"bucket", $"id".as("a"))
    val b = bounded.select($"band", $"bucket", $"id".as("b"))
    val pairs = a.join(b, Seq("band", "bucket")).where($"a" < $"b")
      .select($"a", $"b").distinct()
    // r7: both signature attachments join the SAME cached relation through a
    // plan alias (no per-side rename projection UNDER the exchange), so the
    // planner's exchange reuse serves both joins from ONE broadcast/shuffle
    // of `signed` instead of building it twice (guide §2.4: two operations
    // keyed the same way can share one exchange)
    val agree = expr("size(filter(zip_with(sa.sig, sb.sig, (x, y) -> x = y), v -> v))")
    pairs
      .join(signed.as("sa"), $"a" === col("sa.id"))
      .join(signed.as("sb"), $"b" === col("sb.id"))
      .withColumn("est_jaccard", agree.cast("double") / lit(numHashes))
      .where($"est_jaccard" >= threshold)
      .select($"a", $"b", $"est_jaccard")
  }

  /**
   * Default quadratic-blowup guard: a B-member bucket emits B^2/2 candidate
   * pairs, so even one boilerplate cluster at the old 100k default meant 5*10^9
   * pairs before the cap bit. 4096 caps any single bucket at ~8M pairs — large
   * enough that real near-dup clusters pass untouched, small enough that a
   * degenerate mega-cluster cannot take down the stage.
   */
  val DefaultMaxBucket = 4096

  /** What the last over-cap event dropped (listener-updated). Convenience for
    * single-query tests/ops ONLY: concurrent mining queries overwrite each other
    * here — a concurrent caller should use [[lastRegisteredCapMetric]] at build
    * time and [[capReport]] after the action to read its OWN query's report. */
  @volatile var lastCapReport: Option[CapReport] = None
  final case class CapReport(metric: String, droppedBuckets: Long, droppedRows: Long,
      maxBucket: Long)

  /** Reports keyed by observed-metric name, bounded (oldest evicted) so a
    * long-lived driver running millions of mining queries cannot leak. */
  private val capReports =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, CapReport]() {
        override def removeEldestEntry(e: java.util.Map.Entry[String, CapReport]): Boolean =
          size() > 128
      })

  /** The over-cap report of a specific mining query, by its observe-metric name. */
  def capReport(metric: String): Option[CapReport] = Option(capReports.get(metric))

  private val capMetricTL = new ThreadLocal[String]

  /** Observe-metric name of the most recent capped mining DataFrame CONSTRUCTED
    * on the calling thread (miners build their plan synchronously, so this is
    * race-free per caller); pair with [[capReport]] after the action runs. */
  def lastRegisteredCapMetric: Option[String] = Option(capMetricTL.get())

  private val capSeq = new java.util.concurrent.atomic.AtomicLong()
  // weak keys: identity per LIVE session (an identityHashCode key could be
  // reused after GC, silently skipping registration for a new session), and
  // dead sessions don't accumulate
  private val capListenerSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** No silent caps: a per-session listener surfaces every over-cap drop. */
  private def registerCapListener(spark: org.apache.spark.sql.SparkSession): Unit =
    if (capListenerSessions.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_lsh_cap")) {
              val buckets = if (row.isNullAt(0)) 0L else row.getLong(0)
              val rows = if (row.isNullAt(1)) 0L else row.getLong(1)
              val mx = if (row.isNullAt(2)) 0L else row.getLong(2)
              if (buckets > 0) {
                val report = CapReport(name, buckets, rows, mx)
                capReports.put(name, report)
                lastCapReport = Some(report)
                log.warn(s"LSH bucket cap dropped $buckets bucket(s) / $rows row(s) " +
                  s"(largest bucket $mx) in $name — bounded recall loss; raise " +
                  s"maxBucket or the band bit-width if those clusters matter")
              }
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
      })
    }

  /** Drop rows in LSH buckets larger than `cap` (quadratic-blowup guard).
    * Dropped volume is observed and logged, never silent. */
  private def capBuckets(banded: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    if (cap <= 0 || cap == Int.MaxValue) {
      // clear the thread-local: an UNCAPPED query must not inherit the
      // previous query's metric name (stale CapReport attribution)
      capMetricTL.remove()
      return banded
    }
    registerCapListener(banded.sparkSession)
    val metric = s"graft_lsh_cap_${capSeq.incrementAndGet()}"
    capMetricTL.set(metric)
    val sizes = banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bucket_n"))
      .observe(metric,
        count(when(col("bucket_n") > cap, lit(1))).as("dropped_buckets"),
        coalesce(sum(when(col("bucket_n") > cap, col("bucket_n"))), lit(0L)).as("dropped_rows"),
        coalesce(max(col("bucket_n")), lit(0L)).as("max_bucket"))
    banded.join(sizes.where(col("bucket_n") <= cap), keys).drop("bucket_n")
  }

  /**
   * 64-bit SimHash over word shingles: sign-aggregated bit votes, returned as a
   * `simhash` long column. Near-dup detection bands the 64 bits into 4 x 16-bit
   * keys (pairs within Hamming distance 3 share at least one band whp).
   */
  /** One-pass 64-bit simhash kernel over word shingles. */
  def simhash64(text: String, shingleSize: Int): Long = {
    val toks = tokenHashes(text)
    if (toks.length < shingleSize) {
      // degenerate short doc: hash the whole token sequence as one shingle (the
      // minhash path does the same). With a single shingle every bit vote comes
      // from that hash, so the simhash IS the mixed hash — distinct short docs
      // get distinct simhashes instead of all colliding at 0.
      var h = 0L
      var i = 0
      while (i < toks.length) { h = h * 0x9E3779B97F4A7C15L + toks(i); i += 1 }
      return Kernels.mix64(h)
    }
    val counts = new Array[Int](64)
    var i = 0
    val last = toks.length - shingleSize
    while (i <= last) {
      var h = 0L
      var j = 0
      while (j < shingleSize) { h = h * 0x9E3779B97F4A7C15L + toks(i + j); j += 1 }
      h = Kernels.mix64(h)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def withSimhash(df: DataFrame, textCol: String, shingleSize: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idCols = df.columns.filter(_ != textCol)
    require(idCols.length == 1, "withSimhash expects (id, text) input")
    df.select(col(idCols.head).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, simhash64(if (t == null) "" else t, shingleSize))
      })
      .toDF(idCols.head, "simhash")
  }

  /**
   * Near-duplicate pairs by simhash banding + exact Hamming verify. Pigeonhole:
   * with 4 x 16-bit bands any pair within Hamming 3 matches on >= 1 whole band.
   * The Hamming filter runs map-side BEFORE the pair dedup, so only verified
   * pairs reach the final (a, b) shuffle; `maxBucket` guards the 65,536-buckets-
   * per-band ceiling against degenerate mega-buckets at high n.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // the pigeonhole guarantee of the fixed 4 x 16-bit banding stops at 3:
    // above that, candidate generation is BEST-EFFORT (a pair spreading its
    // differing bits across all four bands never shares a band key). That is
    // a legitimate LSH trade (minhashPairs is probabilistic too), but it must
    // not be silent — surface it once per call site
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    if (maxHamming > 3) org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"simhashPairs(maxHamming=$maxHamming): the 4x16-bit banding only " +
      "GUARANTEES candidates within Hamming 3; pairs differing by 4+ bits " +
      "spread across all bands are found best-effort only")
    val spark = df.sparkSession
    import spark.implicits._
    val sh = withSimhash(df.select(col(idCol), col(textCol)), textCol)
      .withColumnRenamed(idCol, "id").cache()
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright($"simhash", b * 16).bitwiseAND(lit(0xffffL)).as("key")))
    val banded = sh.select($"id", $"simhash", explode(array(bandStructs: _*)).as("bk"))
      .select($"id", $"simhash", $"bk.band", $"bk.key")
    val bounded = capBuckets(banded, Seq("band", "key"), maxBucket)
    val a = bounded.select($"band", $"key", $"id".as("a"), $"simhash".as("h_a"))
    val b = bounded.select($"band", $"key", $"id".as("b"), $"simhash".as("h_b"))
    a.join(b, Seq("band", "key")).where($"a" < $"b")
      .select($"a", $"b", bit_count($"h_a".bitwiseXOR($"h_b")).as("hamming"))
      .where($"hamming" <= maxHamming) // verify first: the pair dedup shuffles only hits
      .groupBy($"a", $"b").agg(min($"hamming").as("hamming"))
  }

  /**
   * Distinct word n-gram shingles as a one-pass JVM kernel: manual whitespace
   * scanning + per-token lowercase, no regex. Equivalent to
   * `array_distinct(shingles(text, n))` (and the DuckDB regexp_split form) for
   * ASCII whitespace-separated text; the Catalyst regex-split/ICU-lowercase tree
   * it replaces dominated the exact-verify profile (UTF8String.split + Pattern
   * match were the top frames of q_minhash_pairs).
   */
  def distinctShingles(text: String, n: Int): Array[String] = {
    val len = text.length
    val words = new java.util.ArrayList[String](len / 6 + 4)
    import Kernels.isWs
    var i = 0
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) words.add(text.substring(start, i).toLowerCase(java.util.Locale.ROOT))
    }
    val m = words.size - n + 1
    if (m <= 0) return Array.empty
    val set = new java.util.LinkedHashSet[String](m * 2)
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) { if (k > 0) sb.append(' '); sb.append(words.get(j + k)); k += 1 }
      set.add(sb.toString)
      j += 1
    }
    set.toArray(new Array[String](set.size))
  }

  /** Exact n-gram Jaccard similarity between two text columns (verification UDF-free). */
  def ngramJaccard(t1: Column, t2: Column, n: Int): Column = {
    val s1 = array_distinct(shingles(t1, n))
    val s2 = array_distinct(shingles(t2, n))
    val inter = size(array_intersect(s1, s2)).cast("double")
    val union = size(array_union(s1, s2)).cast("double")
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /**
   * Embedding cosine near-duplicate pairs: banded sign-LSH (like [[minhashPairs]])
   * with exact cosine verify inside buckets.
   *
   * `bands` x `bandBits` hyperplanes; a pair is a candidate when ANY band's sign
   * bits match exactly. At cosine c two vectors agree per sign bit with
   * p = 1 - acos(c)/pi (~0.9 at c=0.95), so recall ~ 1-(1-p^bandBits)^bands
   * (~0.96 at the 8x16 default) while each band offers 2^bandBits buckets —
   * raise bandBits with n to keep buckets sparse (24 bits at 10^9+). The plane
   * matrix is built once per partition in a typed kernel (one multiply-add pass),
   * and `maxBucket` caps within-bucket self-join blowup from degenerate clusters.
   * Multiplicative/scale perturbations preserve all sign bits, so true near-dups
   * always collide in every band.
   */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        bands: Int = 8, bandBits: Int = 16,
                        minCosine: Double = 0.95, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // one packed-long band key: 1L << p wraps at p >= 64 (see
    // Similarity.withBuckets) — the documented raise-bandBits-with-n advice
    // must stop at 64
    require(bandBits >= 1 && bandBits <= 64,
      s"bandBits must be in [1, 64] (one packed-long band key), got $bandBits")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val spark = df.sparkSession
    import spark.implicits._
    // null/empty embeddings can't participate in near-dup mining
    val src = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
    // GLOBAL plane dimensionality: deriving it from each partition's first row
    // made an empty/ragged first vector silently key that whole partition with
    // different planes than the rest (partition-dependent buckets, lost recall)
    val dim = Similarity.globalDim(src.toDF("id", "v"), "v")
    val keyed = src
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = Similarity.planeMatrix(bands * bandBits, dim)
        it.map { case (id, v) =>
          (id, v, Array.tabulate(bands)(b => Similarity.signBits(v, m, b * bandBits, bandBits)))
        }
      }
      .toDF("id", "v", "keys")
      .cache() // the plane-projection kernel feeds the banding pass + both verify joins
    // ids-only through the banded self-join (a near-dup collides in every band —
    // carrying vectors would multiply shuffle bytes by bands x vector size);
    // vectors attach once per DISTINCT candidate pair for the exact-cosine verify
    val banded = keyed.select($"id", posexplode($"keys").as(Seq("band", "key")))
    val bounded = capBuckets(banded, Seq("band", "key"), maxBucket)
    val a = bounded.select($"band", $"key", $"id".as("a"))
    val b = bounded.select($"band", $"key", $"id".as("b"))
    val pairs = a.join(b, Seq("band", "key")).where($"a" < $"b")
      .select($"a", $"b").distinct()
    // r7: both vector attachments join the SAME cached relation through a plan
    // alias (no per-side rename projection under the exchange), so exchange
    // reuse serves both joins from ONE broadcast/shuffle of `keyed` instead of
    // building it twice (same fix as minhashPairs' signature joins)
    pairs
      .join(keyed.as("va"), $"a" === col("va.id"))
      .join(keyed.as("vb"), $"b" === col("vb.id"))
      .withColumn("cosine", Similarity.cosine(col("va.v"), col("vb.v")))
      .where($"cosine" >= minCosine)
      .select($"a", $"b", $"cosine")
  }

  /**
   * Connected components over an undirected near-dup edge list: every vertex is
   * labeled with the MINIMUM id reachable from it (its `cluster_id`), plus a
   * `canonical` flag on the cluster's minimum id — the representative a dedup
   * pipeline keeps, turning pair output (minhash/simhash/embedding miners) into
   * per-document keep/drop decisions.
   *
   * Iterated min-label propagation: each round joins labels to the symmetric
   * edge list (ONE ids-only hash shuffle per round, 16B rows), takes the min
   * over each vertex's neighborhood, and stops when no label changed.
   * Rounds = eccentricity of the min vertex per component (≤ diameter): LSH
   * near-dup components are near-cliques (a true duplicate pair collides in
   * every band), so 2-4 rounds in practice — the large-star/small-star
   * alternation would only pay off for long-chain graphs that near-dup mining
   * does not produce. Each round's labels are persisted as an RDD and rebuilt
   * into a fresh DataFrame, which BOTH truncates the otherwise round-linear
   * Catalyst plan AND lets the superseded round be unpersisted explicitly —
   * storage is bounded to two label snapshots at any moment, instead of
   * accumulating one cached copy per round until the driver GC gets around to
   * it (a lost executor recomputes from the previous round's cached blocks,
   * not from scratch; acceptable for a driver-steered iterative job).
   * Vertices = `vertices` ∪ both edge endpoints, so singletons label
   * themselves and edge lists over a superset of `vertices` stay total.
   *
   * Diverges (throws) after `maxRounds` instead of returning a partial
   * labeling — silent mis-clustering would delete the wrong documents. The
   * returned DataFrame reads the FINAL round's persisted labels; it is
   * released by Spark's ContextCleaner once the caller drops it.
   */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          vertices: DataFrame, idCol: String,
                          maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val half = edges.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // edges are re-joined every round: materialize once
    val symRdd = half.union(half.select($"dst".as("src"), $"src".as("dst")))
      .as[(Long, Long)].rdd.persist(level)
    val sym = symRdd.toDF("src", "dst")
    val initRdd = vertices.select(col(idCol).cast("long").as("id"))
      .union(sym.select($"src".as("id")))
      .distinct()
      .select($"id", $"id".as("label"))
      .as[(Long, Long)].rdd.persist(level)
    // only ever unpersisted, so the per-round element types may differ
    var labelsRdd: org.apache.spark.rdd.RDD[_] = initRdd
    var labels = initRdd.toDF("id", "label")
    var round = 0
    var changed = 1L
    // the SUCCESS path deliberately leaves the final labelsRdd persisted (the
    // returned DataFrame reads it; the ContextCleaner unpersists once the
    // caller drops the result) — but a throw anywhere below must not leak
    // either cached RDD into a long-lived session
    var converged = false
    try {
      while (changed > 0 && round < maxRounds) {
        val nbrMin = sym.join(labels.select($"id".as("nid"), $"label"), $"dst" === $"nid")
          .groupBy($"src").agg(min($"label").as("nbr_min"))
        val nextRdd = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select($"id", $"label".as("prev"),
            least($"label", coalesce($"nbr_min", $"label")).as("label"))
          .as[(Long, Long, Long)].rdd.persist(level)
        // a throw in the materializing count must release nextRdd itself: at
        // this point it is neither labelsRdd nor covered by the outer finally
        // (its partially-cached blocks would leak for the session's lifetime)
        changed =
          try nextRdd.filter(t => t._3 < t._2).count() // also materializes the cache
          catch { case t: Throwable => nextRdd.unpersist(blocking = false); throw t }
        labelsRdd.unpersist(blocking = false) // superseded round: bound storage to 2 snapshots
        labelsRdd = nextRdd
        labels = nextRdd.map(t => (t._1, t._3)).toDF("id", "label")
        round += 1
      }
      require(changed == 0,
        s"connectedComponents did not converge in $maxRounds rounds — the edge list " +
        "contains a component with eccentricity beyond maxRounds; raise maxRounds")
      converged = true
      labels.select($"id", $"label".as("cluster_id"), ($"id" === $"label").as("canonical"))
    } finally {
      symRdd.unpersist(blocking = false) // the result depends only on labelsRdd
      if (!converged) labelsRdd.unpersist(blocking = false)
    }
  }

  /**
   * Connected components via the LARGE-STAR / SMALL-STAR alternation (Kiveris
   * et al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
   * algorithm): converges in O(log n) rounds on ANY graph shape, which is the
   * opt-in upgrade for long-chain graphs (session stitching, citation chains)
   * where [[connectedComponents]]'s min-label propagation needs
   * O(eccentricity) rounds and deliberately throws. Min-label stays the
   * default: LSH near-dup components are near-cliques (2-4 rounds) and each
   * min-label round is one narrow shuffle vs this algorithm's several.
   *
   * State = the edge set in canonical (hi > lo) orientation, persisted per
   * round with the same two-snapshot storage bound as min-label. Per round:
   *  - large-star: every node u links each LARGER neighbor to
   *    min(N(u) ∪ {u});
   *  - small-star: every node u links its smaller neighbors (and itself) to
   *    min(N⁻(u) ∪ {u});
   *  - fixpoint when the canonical edge set stops changing (exact exceptAll
   *    check, not a probabilistic hash) — at fixpoint the edges form stars
   *    (v, component-min), read directly as labels. Singleton vertices
   *    self-label via anti-join, matching [[connectedComponents]]'s contract.
   * Same output schema: (id, cluster_id, canonical); same loud divergence
   * (throws past maxRounds, never partial labels).
   */
  def connectedComponentsStars(edges: DataFrame, aCol: String, bCol: String,
                               vertices: DataFrame, idCol: String,
                               maxRounds: Int = 60): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def canonical(df: DataFrame): DataFrame = df
      .select(greatest($"u", $"v").as("hi"), least($"u", $"v").as("lo"))
      .where($"hi" =!= $"lo")
      .distinct()

    val allVerts = vertices.select(col(idCol).cast("long").as("id"))
      .union(edges.select(col(aCol).cast("long").as("id")))
      .union(edges.select(col(bCol).cast("long").as("id")))
      .distinct()
      .as[Long].rdd.persist(level)
    val vertsDf = allVerts.toDF("id")

    val initRdd = canonical(edges.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v")))
      .as[(Long, Long)].rdd.persist(level)
    var eRdd = initRdd
    var e = initRdd.toDF("hi", "lo")
    var eCount = -1L // carried across rounds: count of eRdd (-1 = not yet counted)
    var round = 0
    var changed = true
    var converged = false
    try {
      while (changed && round < maxRounds) {
        // large-star over the symmetric view: m(u) = min(N(u) ∪ {u}); for
        // every neighbor v > u emit (v, m) — hi=v > u >= m=lo, canonical
        val sym = e.select($"hi".as("u"), $"lo".as("v"))
          .union(e.select($"lo".as("u"), $"hi".as("v")))
        val mins = sym.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
        val large = canonical(sym.join(mins, "u").where($"v" > $"u")
          .select($"v".as("u"), $"m".as("v")))
        // small-star on the canonical orientation: per hi-node u, m = min of
        // its smaller neighbors (all lo < hi); link u and each lo to m
        val smins = large.groupBy($"hi").agg(min($"lo").as("m"))
        val joined = large.join(smins, "hi")
        val small = canonical(
          joined.select($"hi".as("u"), $"m".as("v"))
            .union(joined.select($"lo".as("u"), $"m".as("v"))))
        val nextRdd = small.as[(Long, Long)].rdd.persist(level)
        val nextDf = nextRdd.toDF("hi", "lo")
        // exact fixpoint: same count and no edge outside the previous set
        // (the previous round's count is carried in eCount — no re-count job)
        changed =
          try {
            val n = nextRdd.count() // materializes the cache
            val prev = if (eCount >= 0) eCount else eRdd.count()
            eCount = n
            n != prev || nextDf.exceptAll(e).limit(1).count() > 0
          } catch { case t: Throwable => nextRdd.unpersist(blocking = false); throw t }
        eRdd.unpersist(blocking = false)
        eRdd = nextRdd
        e = nextDf
        round += 1
      }
      require(!changed,
        s"connectedComponentsStars did not converge in $maxRounds rounds — " +
        "pathological input (or maxRounds set below ~2 log2 |V|); raise maxRounds")
      converged = true
      // fixpoint edges are stars: (member, component-min). Roots and
      // singletons (never a hi) self-label.
      val member = e.select($"hi".as("id"), $"lo".as("label"))
      val selfLabeled = vertsDf.join(member.select($"id"), Seq("id"), "left_anti")
        .select($"id", $"id".as("label"))
      member.union(selfLabeled)
        .select($"id", $"label".as("cluster_id"), ($"id" === $"label").as("canonical"))
    } finally {
      // the returned plan reads BOTH caches (fixpoint edges via `e`, the
      // singleton anti-join via vertsDf) — on success leave them persisted
      // for the caller's materialization (ContextCleaner reclaims them once
      // the result is dropped, same policy as connectedComponents' labels);
      // unpersisting allVerts here would silently re-run the full
      // union+distinct over all edges at collect time
      if (!converged) {
        allVerts.unpersist(blocking = false)
        eRdd.unpersist(blocking = false)
      }
    }
  }
}
