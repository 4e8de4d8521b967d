package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * SQL-write scale checkpoint (BASELINE.md round-5/6): push N pages through the
 * V2 write path (`df.write.format("graft")`) at a realistic decomposition,
 * time it, then prove the store: V2-scan content hash == DecodeJob content
 * hash, and a per-row byte-verify against the deterministic generator reports
 * zero mismatches. Run with the arrange rule active (default) or disabled
 * (`spark.graft.write.arrange=false`) to compare the two write plans at scale.
 *
 *   sbt "runMain graft.jobs.WriteScaleCheck 5000000 512"
 */
object WriteScaleCheck {
  import LocalSession.deleteRecursively

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 5000000L
    val parts = if (args.length > 1) args(1).toInt else 512
    val scratch = LocalSession.tmpfsScratchDir("graft-wsc-")
    try {
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .appName("graft-write-scale-check")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.local.dir", s"$scratch/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      val pagesParquet = s"$scratch/pages"
      graft.sources.Webtext.generate(spark, n, 256).write.mode("overwrite").parquet(pagesParquet)
      def pages = spark.read.parquet(pagesParquet)
      val origBytes = pages.select(
        sum(octet_length($"url") + octet_length($"html") + octet_length($"text") +
          octet_length($"lang") + lit(8L))).as[Long].head()

      val store = s"$scratch/store"
      spark.conf.set("spark.graft.write.partitions", parts.toString)
      val t0 = System.nanoTime()
      pages.write.format("graft").mode("append").save(store)
      val wSecs = (System.nanoTime() - t0) / 1e9
      spark.conf.unset("spark.graft.write.partitions")
      val arrangedRuns = graft.plans.GraftWriteArrangeRule.arranged.get()
      val enc = graft.sources.SnapshotStore.currentEntries(store).map(_.encBytes).sum
      println(f"[wsc] WRITE n=$n parts=$parts secs=$wSecs%.1f " +
        f"gbps=${origBytes / 1e9 / wSecs}%.3f ratio=${origBytes.toDouble / enc}%.2f " +
        s"arrangedRuleFired=${arrangedRuns > 0}")

      def contentHash(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(
          bit_xor(xxhash64($"url", unix_micros($"warc_ts"), $"text", $"lang")),
          count(lit(1))).head()
        (r.getLong(0), r.getLong(1))
      }
      // read-back: min-of-3 timed V2 scan + hash equality across both surfaces
      var vSecs = Double.MaxValue
      var v2Hash: (Long, Long) = null
      for (_ <- 0 until 3) {
        val t1 = System.nanoTime()
        val h = contentHash(spark.read.format("graft").load(store)
          .select($"url", $"warc_ts", $"text", $"lang"))
        vSecs = math.min(vSecs, (System.nanoTime() - t1) / 1e9)
        v2Hash = h
      }
      val jobHash = contentHash(DecodeJob.decode(spark, store).toDF())
      println(f"[wsc] READBACK v2_secs_min=$vSecs%.2f v2_gbps=${origBytes / 1e9 / vSecs}%.2f " +
        s"hashEqual=${v2Hash == jobHash} rows=${v2Hash._2}")
      require(v2Hash == jobHash, "V2 scan and DecodeJob disagree on the SQL-written store")
      // exact per-row byte verify against the deterministic generator
      val mismatches = DecodeJob.verifyAgainst(
        graft.sources.Webtext.generate(spark, n, 256), DecodeJob.decode(spark, store))
      println(s"[wsc] VERIFY mismatches=$mismatches")
      require(mismatches == 0L, s"$mismatches mismatching rows")
      spark.stop()
    } finally deleteRecursively(new java.io.File(scratch))
  }
}
