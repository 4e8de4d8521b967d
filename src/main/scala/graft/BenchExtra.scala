package graft

import org.apache.spark.sql.SparkSession

/**
 * Optimization-round instrumentation (guide §1): NOT part of the driver
 * contract — `Bench` is the frozen round-of-record harness; this main exists
 * so plan shapes and phase timings can be captured and cited in
 * OPTIMIZATION_r07.md without touching the measured surface.
 *
 * Modes (args(0)):
 *  - `explain <suffix> <name>[,<name>...]` — write `plans/r07/<name>_<suffix>.txt`
 *    with the `.explain("formatted")` output of each declared query.
 *  - `time <name>[,<name>...] [rounds]` — per-query min-of-N noop timing with
 *    per-round samples printed (same methodology as Bench.timeQueries).
 * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
 */
object BenchExtra {

  private def newSession(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-extra-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = newSession(cpus)
    args(0) match {
      case "explain" =>
        val suffix = args(1)
        val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
        val dir = java.nio.file.Paths.get("plans/r07")
        java.nio.file.Files.createDirectories(dir)
        for (name <- names) {
          val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"wrote plans/r07/${name}_$suffix.txt")
        }
      case "time" =>
        val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val rounds = if (args.length > 2) args(2).toInt else 3
        val qs = SparkEntry.queries
        val samples = scala.collection.mutable.Map[String, List[Double]]()
        for (_ <- 0 until rounds; name <- names) {
          val fn = qs.getOrElse(name, sys.error(s"unknown query $name"))
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val secs = (System.nanoTime() - t0) / 1e9
          samples(name) = samples.getOrElse(name, Nil) :+ secs
        }
        for (name <- names)
          println(f"$name%-24s min=${samples(name).min}%.3f  samples=${samples(name).map(s => f"$s%.3f").mkString(",")}")
      case "abminhash" =>
        // interleaved A/B (old vs new q_minhash form) to cancel host weather
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val rounds = if (args.length > 1) args(1).toInt else 5
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        def corpus = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text")))
        def shingleDf = corpus.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, tx) =>
            (id, operators.Dedup.distinctShingles(if (tx == null) "" else tx, 3)) })
          .toDF("doc_id", "s").cache()
        def verify(cand: org.apache.spark.sql.DataFrame, hint: Boolean) = {
          val sh = shingleDf
          val sa = sh.select(col("doc_id").as("a"), col("s").as("s_a"))
          val sb = sh.select(col("doc_id").as("b"), col("s").as("s_b"))
          val union = size(array_union(col("s_a"), col("s_b")))
          val j = size(array_intersect(col("s_a"), col("s_b"))).cast("double") /
            greatest(union, lit(1)).cast("double")
          val joined =
            if (hint) broadcast(broadcast(cand).join(sa, "a")).join(sb, "b")
            else cand.join(sa, "a").join(sb, "b")
          joined.where(j >= 0.6).select(col("a"), col("b"))
        }
        val variants: Seq[(String, () => Unit)] = Seq(
          "t0.3/nohint" -> (() => verify(operators.Dedup.minhashPairs(corpus, "doc_id",
            "text", 64, 32, 3, 0.3, Int.MaxValue), hint = false)
            .write.format("noop").mode("overwrite").save()),
          "t0.0/nohint" -> (() => verify(operators.Dedup.minhashPairs(corpus, "doc_id",
            "text", 64, 32, 3, 0.0, Int.MaxValue), hint = false)
            .write.format("noop").mode("overwrite").save()),
          "t0.3/hint  " -> (() => verify(operators.Dedup.minhashPairs(corpus, "doc_id",
            "text", 64, 32, 3, 0.3, Int.MaxValue), hint = true)
            .write.format("noop").mode("overwrite").save()),
          "t0.0/hint  " -> (() => verify(operators.Dedup.minhashPairs(corpus, "doc_id",
            "text", 64, 32, 3, 0.0, Int.MaxValue), hint = true)
            .write.format("noop").mode("overwrite").save()))
        val best = scala.collection.mutable.Map[String, List[Double]]()
        for (_ <- 0 until rounds; (nm, f) <- variants) {
          val t0 = System.nanoTime(); f(); val t = (System.nanoTime() - t0) / 1e9
          best(nm) = best.getOrElse(nm, Nil) :+ t
        }
        for ((nm, _) <- variants)
          println(f"$nm min=${best(nm).min}%.3f samples=${best(nm).map(x => f"$x%.3f").mkString(",")}")
      case "minhash" =>
        // phase breakdown for q_minhash_pairs (guide §1.1 empirical loop)
        import org.apache.spark.sql.functions._
        import spark.implicits._
        val rounds = if (args.length > 1) args(1).toInt else 3
        def timeIt(label: String)(f: => Unit): Unit = {
          val ts = (0 until rounds).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"$label%-36s min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
        }
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        def corpus0 = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text")))
        timeIt("corpus noop (2 parts)") {
          corpus0.write.format("noop").mode("overwrite").save() }
        timeIt("corpus noop (repart 32)") {
          corpus0.repartition(32).write.format("noop").mode("overwrite").save() }
        timeIt("sig kernel (2 parts)") {
          operators.Dedup.withMinhashSignature(corpus0, "text", 64, 3)
            .write.format("noop").mode("overwrite").save() }
        timeIt("sig kernel (repart 32)") {
          operators.Dedup.withMinhashSignature(corpus0.repartition(32), "text", 64, 3)
            .write.format("noop").mode("overwrite").save() }
        timeIt("shingle kernel (2 parts)") {
          corpus0.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
            .mapPartitions(_.map { case (id, tx) =>
              (id, operators.Dedup.distinctShingles(if (tx == null) "" else tx, 3)) })
            .write.format("noop").mode("overwrite").save() }
        timeIt("minhashPairs only (2 parts)") {
          spark.catalog.clearCache()
          operators.Dedup.minhashPairs(corpus0, "doc_id", "text",
            numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.3,
            maxBucket = Int.MaxValue).write.format("noop").mode("overwrite").save() }
        timeIt("full query (cold cache)") {
          spark.catalog.clearCache()
          SparkEntry.queries("q_minhash_pairs")(spark, sfDir)
            .write.format("noop").mode("overwrite").save() }
        timeIt("full query (warm cache)") {
          SparkEntry.queries("q_minhash_pairs")(spark, sfDir)
            .write.format("noop").mode("overwrite").save() }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
