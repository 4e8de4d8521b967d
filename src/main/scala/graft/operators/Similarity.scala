package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column (array<float>).
 * Brute-force cosine is the exact baseline (one scan, no shuffle until top-k);
 * the persisted LSH-bucketed index is the 10^12-row scale path: the bucket is a
 * hive partition column, so a probe reads only the matching bucket directories
 * (partition pruning — no full scan per query).
 */
object Similarity {

  /** dot(a, b) via zip_with + aggregate — stays inside Catalyst, no UDF.
    * Ragged pairs compare over the COMMON PREFIX and null elements count as 0,
    * matching the bucketing kernels' semantics ([[signBits]]/[[sqDist]] both
    * run to the min length): a bare zip_with pads the shorter array with
    * nulls and the null poisons the whole aggregate, so every verify/rerank
    * stage (`cosine >= t`, top-k) silently DROPPED exactly the mixed-dim or
    * null-element candidates the bucketing deliberately accepted. */
  def dot(a: Column, b: Column): Column = {
    val n = least(size(a), size(b))
    aggregate(zip_with(slice(a, lit(1), n), slice(b, lit(1), n), (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + coalesce(v, lit(0.0d)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with the [[dot]] ragged/null-element semantics; a zero-norm side
    * (empty, all-zero, or all-null vector) yields 0.0, and only a NULL vector
    * column yields NULL. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  // ---------------- deterministic hyperplanes (JVM kernel side) ----------------

  /**
   * planes x dim pseudo-random hyperplane matrix in [-1, 1) — a pure function of
   * (seed, plane, dim index), so every executor derives identical planes with no
   * broadcast state. Materialized ONCE per partition and reused across rows; the
   * previous Column-tree form re-hashed (plane, i) per row x plane x dim, the same
   * 30x higher-order-function trap documented for minhash.
   */
  def planeMatrix(planes: Int, dim: Int, seed: Long = 0x9E3779B97F4A7C15L): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      Kernels.mix64(seed ^ (p.toLong << 32) ^ i.toLong).toDouble / Long.MaxValue.toDouble
    }

  /** Sign bits of vec against plane rows [from, from+bits), packed LSB-first. */
  def signBits(vec: Array[Double], m: Array[Array[Double]], from: Int, bits: Int): Long = {
    var key = 0L
    var p = 0
    while (p < bits) {
      val plane = m(from + p)
      val n = math.min(vec.length, plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec(i) * plane(i); i += 1 }
      if (s > 0.0) key |= (1L << p)
      p += 1
    }
    key
  }

  /** Single-table convenience form of [[withBuckets]] (drops the table column). */
  def withBucket(df: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame =
    withBuckets(df, idCol, vecCol, planes, tables = 1).drop("table")

  /** GLOBAL embedding dimensionality (max element count over non-empty vectors):
    * one tiny aggregate job. Deriving dim from each partition's FIRST row keyed
    * a partition with different hyperplanes whenever its first vector was empty
    * or ragged — partition-dependent buckets, silent recall loss. */
  private[operators] def globalDim(df: DataFrame, vecCol: String): Int = {
    val r = df.agg(max(size(col(vecCol)))).head()
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }

  /**
   * (id, vec, table, bucket) with one `planes`-bit sign-LSH bucket per vector per
   * table — `tables` independent hash tables drawn from disjoint rows of one
   * deterministic plane matrix (the banded pattern of
   * [[Dedup.embeddingNearDups]]). Each row fans out to `tables` output rows.
   */
  def withBuckets(df: DataFrame, idCol: String, vecCol: String,
                  planes: Int, tables: Int, dimHint: Option[Int] = None): DataFrame = {
    // a bucket key is ONE packed long: 1L << p wraps silently at p >= 64
    // (Java shifts mod 64), aliasing high sign bits onto low positions —
    // build and probe wrap identically, so nothing would error while the
    // effective key width quietly stayed 64 with corrupted low bits
    require(planes >= 1 && planes <= 64,
      s"planes must be in [1, 64] (one packed-long bucket key), got $planes")
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val spark = df.sparkSession
    import spark.implicits._
    // null/EMPTY embeddings cannot be bucketed — drop them (a null row NPEs in
    // the projection kernel; an empty one contributes nothing but noise)
    val src = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
    // global, not first-row-of-partition; callers that already computed it
    // (buildIndex) pass the hint — an extra full scan of an uncached upstream
    // tree just to re-derive the same number is the documented recompute trap
    val dim = dimHint.getOrElse(globalDim(src.toDF("id", "v"), "v"))
    src.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = planeMatrix(planes * tables, dim)
        it.flatMap { case (id, v) =>
          (0 until tables).iterator.map(l =>
            (id, v, l, signBits(v, m, l * planes, planes)))
        }
      }
      .toDF(idCol, vecCol, "table", "bucket")
  }

  /**
   * Build the persisted ANN index ONCE: bucket each vector in `tables`
   * independent sign-LSH tables, repartition so each (table, bucket) is one
   * file, and write with both as hive partition columns. Probes then scan only
   * the matching bucket directories (partition pruning) — at 10^12 rows this is
   * the difference between a per-query full scan and reading ~tables*n/2^planes
   * rows. Pick `planes` so 2^planes ~ n / desired_bucket_rows, then `tables`
   * for recall:
   *
   * Recall math: at cosine c a sign bit agrees with probability
   * p = 1 - acos(c)/pi (~0.899 at c=0.95). One table with Hamming<=1 probing
   * recalls r1 = p^planes + planes*p^(planes-1)*(1-p); L independent tables
   * recall 1-(1-r1)^L. At planes=16, c=0.95: r1~0.51, so L=1 is a coin flip —
   * the round-1/2 single-table weakness — while L=4 gives ~0.94 and L=8 ~0.997.
   * Storage and probe IO scale linearly with L (the standard multi-table LSH
   * trade).
   */
  // ---- sidecar IO through the Hadoop FileSystem of the path (java.nio would
  // break every non-local store — hdfs://, s3a:// — exactly where the 10^12-row
  // indexes live) ----
  private def writeSidecar(spark: SparkSession, dir: String, name: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally os.close()
  }

  private def readSidecar(spark: SparkSession, dir: String, name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val is = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(is), java.nio.charset.StandardCharsets.UTF_8))
      finally is.close()
    }
  }

  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
                 planes: Int, path: String, tables: Int = 1,
                 maxRowsPerFile: Int = 1 << 20): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = globalDim(
      df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0).select(col(vecCol)), vecCol)
    val bucketed = withBuckets(df, idCol, vecCol, planes, tables, dimHint = Some(dim))
    // HOT-BUCKET SKEW, same treatment as buildIvfIndex: a dominant boilerplate
    // cluster lands a large share of vectors in one (table, bucket) of EVERY
    // table, and a bare keyed repartition makes one shuffle task write one
    // giant file (write straggler, zero probe-read parallelism). Count only
    // the buckets EXCEEDING maxRowsPerFile (bounded by total/maxRowsPerFile
    // rows collected — the full per-bucket map would be 2^planes-sized) and
    // salt them into ceil(rows/maxRowsPerFile) shuffle groups; cold buckets
    // keep one file. The bucketed frame is recomputed by the write on purpose
    // (at index-build scale it would not fit in cache).
    val hot: Map[String, Int] = bucketed.groupBy(col("table"), col("bucket")).count()
      .where(col("count") > maxRowsPerFile)
      .select(concat_ws(":", col("table"), col("bucket")).as("k"), col("count"))
      .as[(String, Long)].collect()
      .map { case (bk, rows) => bk -> ((rows + maxRowsPerFile - 1) / maxRowsPerFile).toInt }
      .toMap
    val defaultParts = spark.sessionState.conf.numShufflePartitions
    val salted =
      if (hot.isEmpty) bucketed.repartition(col("table"), col("bucket"))
      else bucketed
        .withColumn("salt", pmod(xxhash64(col(idCol)),
          coalesce(element_at(typedLit(hot),
            concat_ws(":", col("table"), col("bucket"))), lit(1))).cast("int"))
        // explicit count: AQE would otherwise coalesce small-looking
        // partitions back into one task, undoing the salting (see
        // buildIvfIndex)
        .repartition(math.max(defaultParts, hot.values.sum),
          col("table"), col("bucket"), col("salt"))
        .drop("salt")
    salted.write.mode("overwrite").partitionBy("table", "bucket").parquet(path)
    // persist the LSH geometry INCLUDING dim: a probe with mismatched
    // (planes, tables) — or a query vector from a different embedding model —
    // would compute buckets from the wrong plane rows and silently lose recall
    writeSidecar(df.sparkSession, path, "_lsh_meta.json",
      s"""{"planes":$planes,"tables":$tables,"dim":$dim}""")
  }

  /** The query's own bucket plus all Hamming-1 neighbors (multi-probe recall)
    * in table `table` of a `tables`-table index. */
  def probeBuckets(query: Array[Double], planes: Int, dim: Int,
                   table: Int = 0, tables: Int = 1): Seq[Long] = {
    val m = planeMatrix(planes * tables, dim)
    val qBucket = signBits(query, m, table * planes, planes)
    qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
  }

  /** Partition-pruning probe predicate: per table, its own bucket + Hamming-1. */
  private[operators] def probeFilter(query: Array[Double], planes: Int,
                                     tables: Int, dim: Int): Column =
    (0 until tables).map { l =>
      val probes = probeBuckets(query, planes, dim, l, tables).map(Long.box)
      col("table") === l && col("bucket").isin(probes: _*)
    }.reduce(_ || _)

  /**
   * Exact brute-force top-k by cosine against one query vector.
   * Scan + narrow projection; the only exchange is the final global top-k
   * (`orderBy.limit`, which Spark executes as per-partition top-k + merge).
   */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    val vecD = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol), cosine(vecD, q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * ANN top-k against a persisted index built by [[buildIndex]]: read ONLY each
   * table's query bucket plus Hamming-1 neighbors (<= tables*(planes+1) of
   * tables*2^planes partition dirs), dedupe candidates that collide in several
   * tables, exact cosine rerank inside what's left. See [[buildIndex]] for the
   * (planes, tables) recall math.
   */
  def annTopK(spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
              query: Array[Float], k: Int, planes: Int, tables: Int = 1): DataFrame = {
    val qd = query.map(_.toDouble)
    val q = typedLit(qd)
    val idx = spark.read.parquet(indexPath)
    // validate the probe geometry against the persisted meta: a mismatched
    // planes/tables silently probes the wrong buckets (bad recall, no error)
    readSidecar(spark, indexPath, "_lsh_meta.json").foreach { meta =>
      def field(k: String): Option[Int] =
        ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(meta).map(_.group(1).toInt)
      (field("planes"), field("tables")) match {
        case (Some(p), Some(t)) =>
          require(p == planes && t == tables,
            s"index at $indexPath was built with (planes=$p, tables=$t); " +
            s"probe requested (planes=$planes, tables=$tables)")
        case _ =>
      }
      // wrong-dimension queries (different embedding model) derive different
      // sign bits and probe the wrong buckets with zero error otherwise
      field("dim").foreach(d => require(d == query.length,
        s"index at $indexPath holds $d-dim embeddings; query has ${query.length}"))
    }
    // graceful legacy read: indexes persisted before the multi-table layout have
    // only a `bucket` partition column — probe them as one table (their buckets
    // come from plane rows [0, planes), identical to table 0 of any layout)
    val probe =
      if (idx.columns.contains("table")) probeFilter(qd, planes, tables, query.length)
      else {
        require(tables == 1, s"index at $indexPath is single-table (legacy layout); " +
          "rebuild with buildIndex(tables = ...) to probe multiple tables")
        col("bucket").isin(probeBuckets(qd, planes, query.length).map(Long.box): _*)
      }
    idx.where(probe)
      .dropDuplicates(idCol)
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * BATCHED ANN probes — the reranking-pipeline shape where [[annTopK]]'s
   * one-query form would mean millions of driver round-trips: a DataFrame of
   * (query id, query vector) probes the persisted index in ONE distributed
   * plan. Each query's probe buckets (own + Hamming-1 per table) are computed
   * kernel-side (the same plane matrix as the index build, validated against
   * the `_lsh_meta.json` sidecar), the probe rows join the index on
   * (table, bucket), candidates colliding in several tables dedupe per
   * (query, id), and the exact cosine rerank keeps each query's top-k via a
   * per-query window. Scale shape: a SMALL probe batch broadcasts and Spark's
   * dynamic partition pruning skips non-probed bucket directories; a HUGE
   * batch shuffle-joins — one full index scan amortized over all queries,
   * which is exactly when per-query pruning stops paying.
   *
   * Output: (qidCol, idCol, cosine), k rows per query (fewer when a query's
   * probed buckets hold fewer candidates; a query with NO candidates is
   * absent). Row-identical per query to [[annTopK]] by construction.
   */
  def annTopKBatch(spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   k: Int, planes: Int, tables: Int = 1): DataFrame = {
    import spark.implicits._
    val meta = readSidecar(spark, indexPath, "_lsh_meta.json").getOrElse(
      throw new IllegalArgumentException(
        s"no _lsh_meta.json under $indexPath — batched probes need the persisted " +
        "LSH geometry (rebuild the index with buildIndex)"))
    def field(key: String): Int =
      ("\"" + key + "\":(\\d+)").r.findFirstMatchIn(meta).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"malformed _lsh_meta.json under $indexPath: $meta"))
    require(field("planes") == planes && field("tables") == tables,
      s"index at $indexPath was built with (planes=${field("planes")}, " +
      s"tables=${field("tables")}); probe requested (planes=$planes, tables=$tables)")
    val dim = field("dim")
    val idx = spark.read.parquet(indexPath)
    require(idx.columns.contains("table"),
      s"index at $indexPath is single-table (legacy layout); batched probes need " +
      "the multi-table layout — rebuild with buildIndex")
    val probes = typedBatchQueries(queries, qidCol, qvecCol, idCol)
      .mapPartitions { it =>
        val m = planeMatrix(planes * tables, dim)
        it.flatMap { case (qid, v) =>
          // a wrong-model query would silently probe the wrong buckets
          if (v.length != dim) throw new IllegalArgumentException(
            s"query $qid has ${v.length}-dim embedding; index holds $dim-dim")
          (0 until tables).iterator.flatMap { l =>
            val qb = signBits(v, m, l * planes, planes)
            (qb +: (0 until planes).map(p => qb ^ (1L << p)))
              .map(b => (qid, v, l, b))
          }
        }
      }
      .toDF("__qid", "__qvec", "table", "bucket")
    perQueryTopK(idx.join(probes, Seq("table", "bucket")), idCol, vecCol, k, qidCol)
  }

  /** Typed (qid, vector) rows for a batched probe — the shared prep of both
    * batch forms: validates the qid name against the (qidCol, idCol, cosine)
    * output contract and drops null/empty-vector queries, which are therefore
    * ABSENT from the output (the batch analog of the single-query forms'
    * loud refusal; a batch must not die on one vectorless row). Duplicate
    * qids are a caller error: their rankings merge under one id, with each
    * candidate kept at most once per qid by the pair dedup below. */
  private def typedBatchQueries(queries: DataFrame, qidCol: String,
      qvecCol: String, idCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Double])] = {
    require(qidCol != idCol && qidCol != "cosine",
      s"qidCol '$qidCol' collides with an output column — alias the query id " +
      "in `queries` to a name distinct from idCol and 'cosine'")
    val spark = queries.sparkSession
    import spark.implicits._
    // internal names ("__qid"/"__qvec") keep the probe/join plan unambiguous
    // even when qidCol is named like an index or probe column; qidCol is
    // restored by perQueryTopK
    queries
      .where(col(qvecCol).isNotNull && size(col(qvecCol)) > 0)
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  /** The batched rerank tail shared by both probe forms: one exact cosine per
    * DISTINCT (query, candidate) pair (multi-table LSH collisions and
    * duplicate qids both collapse here), per-query top-k window with the
    * single-query tie-break (cosine desc, id asc), caller's qid restored. */
  private def perQueryTopK(joined: DataFrame, idCol: String, vecCol: String,
      k: Int, qidCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(desc("cosine"), col(idCol))
    joined
      .dropDuplicates("__qid", idCol)
      .select(col("__qid"), col(idCol), cosine(col(vecCol), col("__qvec")).as("cosine"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
      .withColumnRenamed("__qid", qidCol)
  }

  // ---------------- IVF (inverted-file) ANN index ----------------

  @inline private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Indices of the `n` nearest centroids (euclidean), ties broken by lower
    * index — the exact ordering of a stable `indices.sortBy(sqDist)`, in
    * O(k·n) with zero boxing/allocation beyond the two result-sized arrays:
    * the batched probe runs this per QUERY ROW in the executor kernel, where
    * a full sort of k boxed Ints to take n≈4 cells is hot-path waste. */
  private[operators] def nearestCells(v: Array[Double],
      centroids: Array[Array[Double]], n: Int): Array[Int] = {
    val k = math.min(n, centroids.length)
    val idx = new Array[Int](k)
    val d = new Array[Double](k)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val dist = sqDist(v, centroids(c))
      // strict comparisons keep equal-distance cells in index order (stable)
      if (filled < k) {
        var i = filled
        while (i > 0 && d(i - 1) > dist) { d(i) = d(i - 1); idx(i) = idx(i - 1); i -= 1 }
        d(i) = dist; idx(i) = c; filled += 1
      } else if (dist < d(k - 1)) {
        var i = k - 1
        while (i > 0 && d(i - 1) > dist) { d(i) = d(i - 1); idx(i) = idx(i - 1); i -= 1 }
        d(i) = dist; idx(i) = c
      }
      c += 1
    }
    idx
  }

  /** Index of the nearest centroid (euclidean). */
  def nearestCell(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = sqDist(v, centroids(c))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /**
   * Deterministic Lloyd's k-means on a driver-side sample — the standard IVF
   * coarse-quantizer training shape (train on a bounded sample, assign the full
   * table distributed). Init = k evenly strided sample points; fixed iteration
   * count; no RNG, so the same input always yields the same centroids.
   */
  def trainCentroids(sample: Array[Array[Double]], k: Int, iters: Int = 10): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty centroid training sample")
    val kk = math.min(k, sample.length)
    // MAX length, not the first vector's: a ragged short first sample would
    // silently train truncated centroids (order-dependent, like the LSH dim)
    val dim = sample.iterator.map(_.length).max
    var centroids = Array.tabulate(kk) { c =>
      val src = sample((c.toLong * sample.length / kk).toInt)
      java.util.Arrays.copyOf(src, dim)
    }
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        val c = nearestCell(v, centroids)
        counts(c) += 1
        var i = 0
        val lim = math.min(dim, v.length) // ragged sample vectors must not AIOOBE
        while (i < lim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c) // keep empty cells stable
        else { val m = sums(c); var i = 0; while (i < dim) { m(i) /= counts(c); i += 1 }; m }
      }
    }
    centroids
  }

  /**
   * Build the persisted IVF index: train centroids on a deterministic UNBIASED
   * sample — the `sampleSize` rows with the smallest xxhash64(id) (a bottom-k
   * sketch: uniform over the table regardless of id assignment order, unlike
   * lowest-ids, which skews centroids whenever id correlates with insertion
   * time or content drift). Assign every vector to its nearest cell in one
   * mapPartitions pass, write with `cell` as a hive partition column, and persist
   * the centroids next to the data. At 10^12 rows pick k so each cell holds
   * ~n/k rows; probes read only nProbe of k cell directories.
   *
   * HOT-CELL SKEW: real embedding distributions cluster, so one cell can hold a
   * large share of the table — a bare `repartition(cell)` made that one shuffle
   * task write one giant file (straggler at write, zero read parallelism at
   * probe). Cells whose EXACT row count exceeds `maxRowsPerFile` are salted
   * into ceil(rows/maxRowsPerFile) shuffle groups, giving that many files under
   * the same `cell=` dir — partition pruning is unaffected, write and probe
   * parallelism scale with the cell. Cold cells keep salt 1 (no file blowup).
   *
   * The counts are exact by construction — a k-row `groupBy(cell).count()` on
   * the assignment pass — NOT estimated from the training sample's cell shares:
   * a sample share is Poisson-noisy exactly where it matters most, and any cell
   * holding between `maxRowsPerFile` and ~total/sampleSize rows EXPECTS zero
   * sample hits (at 10^12 rows with the 4096 default, every cell in
   * [10^6, ~2.4x10^8] rows), which would leave it salt-1 and straggling. The
   * price is one extra scan (cell assignment computed twice — the assignment
   * frame is deliberately NOT cached: at index-build scale it wouldn't fit);
   * the aggregate itself is map-side partial into k rows.
   */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, path: String, sampleSize: Int = 4096,
                    maxRowsPerFile: Int = 1 << 20): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    // null/empty embeddings cannot be assigned to a cell (NPE in the sample
    // or assignment kernel otherwise — same guard as the LSH paths)
    val typed = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    // TakeOrdered: per-partition bottom-k + merge — no full sort
    val sample = typed.toDF("id", "v")
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleSize).select(col("v")).as[Array[Double]].collect()
    // centroids padded to the GLOBAL max dimensionality, not the sample's: a
    // ragged corpus whose widest vectors miss the bottom-k sample would train
    // narrow centroids, and ivfTopK's dim check would then reject legitimate
    // full-width queries (the same sample-dependent-dim class globalDim fixed
    // for the LSH path; sqDist runs to min length, so padded zero tails only
    // ADD the wide vectors' tail energy to their distances — still exact)
    val gdim = globalDim(typed.toDF("id", "v"), "v")
    val centroids = trainCentroids(sample, k).map(c => java.util.Arrays.copyOf(c, gdim))
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = typed
      .mapPartitions(_.map { case (id, v) => (id, v, nearestCell(v, bc.value)) })
      .toDF(idCol, vecCol, "cell")
    // EXACT per-cell counts (see scaladoc): k collected rows, map-side partial
    // aggregate; `assigned` is recomputed by the write below on purpose
    val cellCounts: Map[Int, Long] = assigned.groupBy(col("cell")).count()
      .as[(Int, Long)].collect().toMap
    val saltOf: Map[Int, Int] = centroids.indices.map { c =>
      val rows = cellCounts.getOrElse(c, 0L)
      c -> math.max(1, ((rows + maxRowsPerFile - 1) / maxRowsPerFile).toInt)
    }.toMap
    assigned
      .withColumn("salt",
        pmod(xxhash64(col(idCol)), element_at(typedLit(saltOf), col("cell"))).cast("int"))
      // explicit count: one target partition per (cell, salt) group — an
      // unspecified count would let AQE coalesce small-looking partitions back
      // into one task, silently undoing the salting
      .repartition(math.max(saltOf.values.sum, 1), col("cell"), col("salt"))
      .drop("salt")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    writeSidecar(spark, path, "_centroids.json", json)
    centroids
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val json = readSidecar(spark, path, "_centroids.json")
      .getOrElse(throw new IllegalArgumentException(s"no _centroids.json under $path"))
    json.stripPrefix("[[").stripSuffix("]]").split("\\],\\[")
      .map(_.split(",").map(_.toDouble))
  }

  /** Local-filesystem convenience overload (tests, single-node runs). */
  def loadCentroids(path: String): Array[Array[Double]] =
    loadCentroids(SparkSession.active, path)

  /**
   * IVF probe: rank cells by centroid distance to the query, scan ONLY the
   * `nProbe` nearest cell partitions (partition pruning), exact cosine rerank.
   */
  def ivfTopK(spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
              query: Array[Float], k: Int, nProbe: Int): DataFrame = {
    val qd = query.map(_.toDouble)
    val centroids = loadCentroids(spark, indexPath)
    // wrong-model queries silently rank cells with truncated geometry and
    // null out the cosine rerank — refuse, like the LSH probe's dim check
    require(centroids.nonEmpty && centroids(0).length == query.length,
      s"index at $indexPath holds ${centroids.headOption.map(_.length).getOrElse(0)}-dim " +
      s"embeddings; query has ${query.length}")
    val cells = nearestCells(qd, centroids, nProbe).map(Int.box).toSeq
    val q = typedLit(qd)
    spark.read.parquet(indexPath)
      .where(col("cell").isin(cells: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * Batched IVF probes — [[ivfTopK]] for a whole DataFrame of (query id,
   * query vector) in ONE distributed plan: each query ranks the (broadcast,
   * k×dim) centroids kernel-side and emits its `nProbe` nearest cells; probe
   * rows join the index on the `cell` PARTITION column — a small batch
   * broadcasts and dynamic partition pruning scans only the probed cell
   * directories, a huge batch shuffle-joins with one index scan amortized
   * over all queries — and an exact per-query cosine rerank keeps top-k.
   * Output: (qidCol, idCol, cosine), row-identical per query to [[ivfTopK]]
   * by construction (same centroid ranking, same rerank ordering); like
   * [[annTopKBatch]], a null/empty-vector query is ABSENT from the output
   * rather than failing the whole batch.
   */
  def ivfTopKBatch(spark: SparkSession, indexPath: String, idCol: String, vecCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   k: Int, nProbe: Int): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, indexPath)
    require(centroids.nonEmpty, s"index at $indexPath has no centroids")
    val dim = centroids(0).length
    val bc = spark.sparkContext.broadcast(centroids)
    val probes = typedBatchQueries(queries, qidCol, qvecCol, idCol)
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (qid, v) =>
          // a wrong-model query would silently rank cells with truncated
          // geometry — refuse, like the single-query probe's dim check
          if (v.length != dim) throw new IllegalArgumentException(
            s"query $qid has ${v.length}-dim embedding; index holds $dim-dim")
          nearestCells(v, cs, nProbe).map(c => (qid, v, c))
        }
      }
      .toDF("__qid", "__qvec", "cell")
    perQueryTopK(spark.read.parquet(indexPath).join(probes, Seq("cell")),
      idCol, vecCol, k, qidCol)
  }
}
