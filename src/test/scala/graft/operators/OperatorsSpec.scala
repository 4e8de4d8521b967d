package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("operators-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.DataFrame

  private def docs(): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again and again!"), // near-dup of 1
      (3L, "completely different content about spark columnar compression engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog again and again and again"), // exact dup of 1
      (5L, "der schnelle braune fuchs springt über den faulen hund und ist nicht müde"))
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps one representative per identical text") {
    val out = Dedup.exactDedup(docs(), "doc_id", "text").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 collapses into 1
  }

  test("minhash-LSH finds near-duplicate and exact-duplicate pairs, not unrelated ones") {
    val pairs = Dedup.minhashPairs(docs(), "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup pair must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near dup pair must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val h1 = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again", 2)
    val h2 = Dedup.simhash64("the quick brown fox jumps over the lazy dog again and again!", 2)
    val h3 = Dedup.simhash64("completely different content about spark columnar compression", 2)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 8)
    assert(java.lang.Long.bitCount(h1 ^ h3) > 12)
    val pairs = Dedup.simhashPairs(docs(), "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard: identical=1, disjoint=0") {
    import spark.implicits._
    val df = Seq(("a b c d e f", "a b c d e f", "x y z w v u")).toDF("t1", "t2", "t3")
    val r = df.select(
      Dedup.ngramJaccard(col("t1"), col("t2"), 2).as("same"),
      Dedup.ngramJaccard(col("t1"), col("t3"), 2).as("diff")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("brute-force top-k returns the true nearest by cosine; ANN recalls the top hit") {
    import spark.implicits._
    val dim = 16
    val base = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    def scaled(f: Float) = base.map(_ * f)
    def noisy(seed: Int) = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() * 2 - 1)
    }
    val vecs = Seq(
      (1L, scaled(1.0f)),     // cosine 1.0 with query
      (2L, scaled(2.0f)),     // cosine 1.0 (same direction)
      (3L, noisy(7)), (4L, noisy(8)), (5L, noisy(9)))
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, "vec_id", "embedding", base, 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L))
    // persisted index: probe must read only matching bucket partitions
    val idx = java.nio.file.Files.createTempDirectory("ann-idx-").toString
    Similarity.buildIndex(df, "vec_id", "embedding", planes = 4, idx)
    val annQ = Similarity.annTopK(spark, idx, "vec_id", "embedding", base, 2, planes = 4)
    val ann = annQ.collect().map(_.getLong(0)).toSet
    assert(ann.contains(1L) || ann.contains(2L), "ANN must recall a same-direction vector")
    // partition pruning evidence: the scan reads <= planes+1 of the bucket dirs
    val scan = annQ.queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PartitionFilters") || scan.contains("bucket"),
      s"probe should prune on the bucket partition column:\n$scan")
  }

  test("IVF index: deterministic centroids, cell-partition probe recalls planted vectors") {
    import spark.implicits._
    val dim = 16
    val r = new scala.util.Random(5)
    val base = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    val vecs = (1L to 200L).map(id => (id, Array.fill(dim)(r.nextFloat() * 2 - 1))) ++
      Seq((900L, base), (901L, base.map(_ * 1.001f)))
    val df = vecs.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivf-idx-").toString
    val cents = Similarity.buildIvfIndex(df, "vec_id", "embedding", k = 8, idx)
    // determinism: same data -> same centroids
    val cents2 = Similarity.trainCentroids(
      df.orderBy($"vec_id").limit(4096).select(expr("cast(embedding as array<double>)"))
        .as[Array[Double]].collect(), 8)
    assert(cents.map(_.toSeq).toSeq == cents2.map(_.toSeq).toSeq)
    assert(Similarity.loadCentroids(idx).map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    val top = Similarity.ivfTopK(spark, idx, "vec_id", "embedding", base, 2, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(900L, 901L), s"IVF probe must recall the planted twins, got $top")
    // probe reads only the selected cell partitions
    val scan = Similarity.ivfTopK(spark, idx, "vec_id", "embedding", base, 2, nProbe = 3)
      .queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PartitionFilters") || scan.contains("cell"), scan)
  }

  test("embedding near-dups finds the scaled twin") {
    import spark.implicits._
    val dim = 16
    val base = Array.tabulate(dim)(i => math.cos(i + 1))
    val r = new scala.util.Random(3)
    val df = Seq(
      (1L, base), (2L, base.map(_ * 1.0001)),
      (3L, Array.fill(dim)(r.nextDouble() * 2 - 1))).toDF("id", "v")
    val pairs = Dedup.embeddingNearDups(df, "id", "v", bands = 4, bandBits = 4, minCosine = 0.99)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("degenerate docs: empty/short texts don't crash shingles, simhash, or pair mining") {
    import spark.implicits._
    // empty doc + one-word doc + normal docs (ADVICE: sequence(0,-1)/slice(start=0)
    // threw INVALID_PARAMETER_VALUE.START on any corpus with a short document)
    val df = Seq(
      (1L, ""), (2L, "one"), (3L, "two words"),
      (4L, "a normal sentence with enough words to shingle properly"),
      (5L, "a normal sentence with enough words to shingle properly"))
      .toDF("doc_id", "text")
    val j = df.select(Dedup.ngramJaccard(col("text"), concat(col("text"), lit(" t")), 3).as("j"))
      .collect().map(_.getDouble(0))
    assert(j.length == 5 && j.forall(v => v >= 0.0 && v <= 1.0))
    assert(df.select(Dedup.shingles(col("text"), 3)).collect().length == 5)

    // short docs get DISTINCT simhashes (not all 0 -> no quadratic hamming-0 bucket)
    assert(Dedup.simhash64("one", 2) != Dedup.simhash64("two", 2))
    assert(Dedup.simhash64("", 2) != Dedup.simhash64("one", 2))
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 5L)), "exact dup must pair")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)),
      "distinct short docs must not pair as hamming-0")
    // minhash pair mining survives the same corpus
    Dedup.minhashPairs(df, "doc_id", "text", numHashes = 16, bands = 8,
      shingleSize = 3, threshold = 0.9).collect()
  }

  test("LSH bucket caps bound the within-bucket self-join (mega-cluster guard)") {
    import spark.implicits._
    // 40 identical docs = one bucket of 40 -> 780 pairs uncapped; cap 10 drops it
    val boiler = (1L to 40L).map(i => (i, "the same boilerplate page text repeated everywhere"))
    val df = (boiler :+ ((100L, "another unique document entirely different content here"))
      :+ ((101L, "another unique document entirely different content here")))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)), "small-bucket pairs survive the cap")
    assert(!capped.exists(p => p._1 <= 40L), "mega-bucket pairs are dropped by the cap")
    val uncapped = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .count()
    assert(uncapped == 40L * 39 / 2 + 1)
  }

  test("text analysis: token counts, quality, lang id, fingerprints") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat with a hat and that is that for now"),
      (2L, "der hund und die katze sind nicht ein fisch und das ist gut"),
      (3L, ""),
      (4L, "zzzzz qqqqq xxxxx")).toDF("id", "text")
    val r = df.select(
      col("id"),
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.langIdHeuristic(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) == 15)
    assert(r(3L).getInt(1) == 0)
    assert(r(1L).getString(2) == "en")
    assert(r(2L).getString(2) == "de")
    assert(r(1L).getDouble(3) > r(4L).getDouble(3), "stopword-rich text scores above gibberish")
    // fingerprint is whitespace/case-insensitive
    val fps = Seq(("THE  cat sat", "the cat  sat")).toDF("a", "b")
      .select(TextAnalysis.fingerprint(col("a")) === TextAnalysis.fingerprint(col("b"))).head()
    assert(fps.getBoolean(0))
  }

  test("multimodal plumbing: feature extraction is deterministic, frame sampling fans out") {
    val media = Multimodal.synthesize(spark, 60, 4)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, 60, 4)).collect()
    assert(feats.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a.features.sameElements(b.features) })

    val frames = Multimodal.sampleFrames(media.toDF(), everyMs = 500)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    // a video of durationMs d sampled every 500ms yields ceil(d/500) frames
    val m = media.collect().filter(_.meta.kind == "video").map(r => r.meta.mediaId -> r.meta.durationMs).toMap
    perVideo.foreach { r =>
      val expected = (m(r.getLong(0)) + 499) / 500
      assert(r.getLong(1) == expected, s"video ${r.getLong(0)}")
    }
  }
}
