package graft.sources.v2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.DecodeJob
import graft.sources.{SnapshotStore, Webtext}

/**
 * DataSource V2 WRITE path: `df.write.format("graft")` and SQL `INSERT INTO`
 * must run the staged encode-and-commit pipeline distributed (each task = one
 * encode kernel + one block file), produce stores byte-identical to the
 * EncodeJob batch writer's decode view, keep block metadata pruning intact,
 * and stay exactly-once under task retries.
 */
class V2WriteSpec extends AnyFunSuite {

  // local[8, 2]: TWO task attempts, so the injected writer failure retries
  // instead of failing the job (local default maxFailures=1)
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8, 2]")
    .appName("v2-write-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pages(n: Long): DataFrame = Webtext.generate(spark, n, 8).toDF()

  private def freshRoot(): String =
    Files.createTempDirectory("graft-v2-write-").toString

  test("append writes a store the job and V2 read paths decode identically") {
    val root = freshRoot()
    pages(5000L).write.format("graft").mode("append").save(root)
    // byte-identical round trip (url join compares every column incl. html/text)
    assert(DecodeJob.verifyAgainst(Webtext.generate(spark, 5000L, 8),
      DecodeJob.decode(spark, root)) == 0L)
    assert(spark.read.format("graft").load(root).count() == 5000L)
    // per-part lineage + codec metrics landed in the manifest
    val entries = SnapshotStore.currentEntries(root)
    assert(entries.nonEmpty)
    assert(entries.forall(e => e.nRows > 0 && e.encBytes > 0 &&
      e.origBytes > e.encBytes && e.codecsJson.contains("url")))
    assert(entries.map(_.nRows).sum == 5000L)
    // one block file per commit message / part entry, no strays
    val dir = Paths.get(root, entries.head.dataDir)
    val files = SnapshotStore.listFileNames(dir).filter(_.endsWith(".parquet"))
    assert(files.size == entries.size, s"files $files vs entries ${entries.size}")
  }

  test("range distribution gives tight url bounds: prefix pruning works on SQL-written data") {
    val root = freshRoot()
    pages(5000L).write.format("graft").mode("append").save(root)
    val total = DecodeJob.blocks(spark, root).where(col("column") === "url").count()
    val matched = DecodeJob.matchingGroupKeys(spark, root,
      Seq(DecodeJob.StrPrefix("url", "https://host-1.example.com/"))).count()
    assert(matched > 0 && matched < total,
      s"SQL-written blocks must prune by url prefix: $matched of $total")
  }

  test("second append allocates a fresh part-id namespace; overwrite truncates; time travel survives") {
    val root = freshRoot()
    pages(3000L).write.format("graft").mode("append").save(root)
    val firstParts = SnapshotStore.currentEntries(root).map(_.partId).toSet
    pages(1000L).select(concat(lit("x-"), col("url")).as("url"), col("warc_ts"),
        col("html"), col("text"), col("lang"))
      .write.format("graft").mode("append").save(root)
    val all = SnapshotStore.currentEntries(root)
    assert(all.map(_.partId).toSet.size == all.size, "part ids must stay unique")
    assert((all.map(_.partId).toSet -- firstParts).forall(_ > firstParts.max),
      "append ids must sit above every committed id")
    assert(DecodeJob.decode(spark, root).count() == 4000L)
    pages(300L).write.format("graft").mode("overwrite").save(root)
    assert(DecodeJob.decode(spark, root).count() == 300L)
    val ids = SnapshotStore.snapshotIds(root)
    assert(ids.size == 3)
    assert(DecodeJob.decodeAt(spark, root, ids.head).count() == 3000L,
      "pre-overwrite snapshots stay readable (nothing deleted at commit)")
  }

  test("SQL INSERT INTO a USING graft relation appends through the V2 write") {
    val root = freshRoot()
    pages(2000L).write.format("graft").mode("append").save(root)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ins USING graft " +
      s"OPTIONS (path '$root')")
    pages(500L)
      .select(concat(lit("ins-"), col("url")).as("url"), col("warc_ts"),
        col("html"), col("text"), col("lang"))
      .createOrReplaceTempView("graft_ins_src")
    spark.sql("INSERT INTO graft_ins SELECT * FROM graft_ins_src")
    assert(spark.sql("SELECT count(*) FROM graft_ins").collect()(0).getLong(0) == 2500L)
    assert(spark.sql("SELECT count(*) FROM graft_ins WHERE url LIKE 'ins-%'")
      .collect()(0).getLong(0) == 500L)
  }

  test("task retry stays exactly-once: aborted attempt's file is not committed") {
    val root = freshRoot()
    GraftDataWriter.failNextWriteOnce.set(true)
    try {
      pages(3000L).write.format("graft").mode("append").save(root)
    } finally GraftDataWriter.failNextWriteOnce.set(false)
    // exact rows, no duplicates from the failed attempt's partial file
    assert(DecodeJob.verifyAgainst(Webtext.generate(spark, 3000L, 8),
      DecodeJob.decode(spark, root)) == 0L)
    val entries = SnapshotStore.currentEntries(root)
    val dir = Paths.get(root, entries.head.dataDir)
    val files = SnapshotStore.listFileNames(dir).filter(_.endsWith(".parquet"))
    assert(files.size == entries.size,
      s"aborted attempt must leave no stray staged file: $files vs ${entries.size} entries")
  }

  test("schema mismatch is rejected before any staging") {
    val root = freshRoot()
    val bad = spark.range(10).selectExpr("cast(id as string) AS url", "id AS warc_ts")
    val e = intercept[Exception] {
      bad.write.format("graft").mode("append").save(root)
    }
    assert(e.getMessage != null)
    assert(SnapshotStore.currentSnapshotId(root).isEmpty, "no commit on rejection")
  }
}
