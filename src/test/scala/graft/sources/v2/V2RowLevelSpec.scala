package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.{DecodeJob, EncodeJob}
import graft.sources.{SnapshotStore, Webtext}

/**
 * SQL row-level DML on the graft table: UPDATE and MERGE INTO (group-based
 * copy-on-write ReplaceData), DELETE FROM with conditions the metadata path
 * cannot express, and the guarantee that exact DELETEs keep the metadata-only
 * fast path. Every statement must leave the store exact (decode == expected),
 * rewrite ONLY provably-affected parts, keep time travel intact, and mark the
 * commit kind correctly for incremental streams.
 */
class V2RowLevelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("v2-rowlevel-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("graft-rowlevel-").toString

  /** Fresh store + catalog-qualified table name (row-level DML resolves only
    * through a catalog — see GraftCatalog's scaladoc); returns
    * (root, sqlName, original decode). */
  private def storeView(n: Long, parts: Int): (String, String, DataFrame) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = freshRoot()
    EncodeJob.run(spark, Webtext.generate(spark, n, 8), root, parts)
    (root, s"graftcat.`$root`", DecodeJob.decode(spark, root).toDF().cache())
  }

  private def assertSame(got: DataFrame, expected: DataFrame): Unit = {
    assert(got.count() == expected.count(),
      s"row count ${got.count()} vs expected ${expected.count()}")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "content mismatch vs expected")
  }

  test("UPDATE with a pushable condition rewrites only the admitting parts") {
    val (root, v, before) = storeView(4000L, 8)
    val allParts = SnapshotStore.currentEntries(root).map(_.partId).toSet
    val preSnap = SnapshotStore.currentSnapshotId(root).get
    // a url bound inside the data: parts above it are provably untouched
    val k = before.select("url").orderBy("url").limit(600)
      .collect().last.getString(0)

    spark.sql(s"UPDATE $v SET lang = 'xx' WHERE url <= '$k'")

    val expected = before.withColumn("lang",
      when(col("url") <= lit(k), lit("xx")).otherwise(col("lang")))
    assertSame(DecodeJob.decode(spark, root).toDF(), expected)
    // copy-on-write: only parts whose block url-range admits the bound were
    // tombstoned; the rest keep their files
    val replaced = SnapshotStore.currentTombstones(root)
    assert(replaced.nonEmpty && replaced.subsetOf(allParts))
    assert(replaced.size < allParts.size,
      s"UPDATE must not rewrite all ${allParts.size} parts for a prefix bound")
    // time travel: the pre-update snapshot is intact
    assertSame(DecodeJob.decodeAt(spark, root, preSnap).toDF(), before)
    // content changed => NOT a rehomed commit (incremental streams deliver it)
    val snap = SnapshotStore.currentSnapshotId(root).get
    assert(snap == preSnap + 1)
    assert(!SnapshotStore.isRehomedCommit(root, snap))
  }

  test("UPDATE with an untranslatable condition falls back to a full rewrite, still exact") {
    val (root, v, before) = storeView(1500L, 4)
    spark.sql(s"UPDATE $v SET lang = upper(lang), text = concat(text, '!') " +
      "WHERE length(text) % 3 = 0")
    val expected = before
      .withColumn("hit", length(col("text")) % 3 === 0)
      .withColumn("lang", when(col("hit"), upper(col("lang"))).otherwise(col("lang")))
      .withColumn("text", when(col("hit"), concat(col("text"), lit("!"))).otherwise(col("text")))
      .drop("hit")
    assertSame(DecodeJob.decode(spark, root).toDF(), expected)
  }

  test("UPDATE matching nothing provably commits nothing") {
    val (root, v, before) = storeView(800L, 4)
    val preSnap = SnapshotStore.currentSnapshotId(root).get
    spark.sql(s"UPDATE $v SET lang = 'xx' WHERE url > 'zzzz'")
    assert(SnapshotStore.currentSnapshotId(root).get == preSnap,
      "a no-match UPDATE must not create a snapshot")
    assertSame(DecodeJob.decode(spark, root).toDF(), before)
  }

  test("MERGE INTO: matched rows update, unmatched source rows insert") {
    val (root, v, before) = storeView(1200L, 4)
    val allParts = SnapshotStore.currentEntries(root).map(_.partId).toSet
    val preSnap = SnapshotStore.currentSnapshotId(root).get
    // source: half the target urls with new text, plus brand-new urls
    val matched = before.select("url").orderBy("url").limit(300)
      .withColumn("stext", lit("merged-text"))
      .withColumn("slang", lit("mg"))
    val fresh = spark.range(50).select(
      concat(lit("zzz://new/"), col("id").cast("string")).as("url"),
      lit("fresh-text").as("stext"), lit("nw").as("slang"))
    matched.unionByName(fresh).createOrReplaceTempView("rl_merge_src")

    spark.sql(
      s"""MERGE INTO $v t USING rl_merge_src s ON t.url = s.url
         |WHEN MATCHED THEN UPDATE SET text = s.stext, lang = s.slang
         |WHEN NOT MATCHED THEN INSERT (url, warc_ts, html, text, lang)
         |  VALUES (s.url, timestamp'2020-01-01 00:00:00', cast(s.stext as binary), s.stext, s.slang)
         |""".stripMargin)

    val after = DecodeJob.decode(spark, root).toDF()
    assert(after.count() == 1250L)
    val expectedUpdated = before.join(matched, Seq("url"), "left")
      .select(col("url"), col("warc_ts"), col("html"),
        coalesce(col("stext"), col("text")).as("text"),
        coalesce(col("slang"), col("lang")).as("lang"))
    assertSame(after.where(!col("url").startsWith("zzz://new/"))
      .select("url", "warc_ts", "text", "lang"),
      expectedUpdated.select("url", "warc_ts", "text", "lang"))
    assert(after.where(col("url").startsWith("zzz://new/") &&
      col("text") === "fresh-text" && col("lang") === "nw").count() == 50L)
    // runtime group filtering: the ON join condition has no static pushdown,
    // yet only parts holding a matched url (the 300 smallest) are rewritten —
    // the dynamic `_part_id` subquery is the only thing that can prune here
    val replaced = SnapshotStore.currentTombstones(root)
    assert(replaced.nonEmpty && replaced.subsetOf(allParts))
    assert(replaced.size < allParts.size,
      s"MERGE touching a url prefix must not rewrite all ${allParts.size} parts")
    // time travel intact; merge commits are streamable (not rehomed)
    assertSame(DecodeJob.decodeAt(spark, root, preSnap).toDF(), before)
    assert(!SnapshotStore.isRehomedCommit(root, SnapshotStore.currentSnapshotId(root).get))
  }

  test("DELETE with an untranslatable condition runs copy-on-write, rehomed-marked") {
    val (root, v, before) = storeView(1000L, 4)
    // length(text)%2 has no source-filter translation => ReplaceData path
    spark.sql(s"DELETE FROM $v WHERE length(text) % 2 = 0")
    val expected = before.where(length(col("text")) % 2 =!= 0)
    assertSame(DecodeJob.decode(spark, root).toDF(), expected)
    // survivors are re-homed rows: streams must skip this commit
    val snap = SnapshotStore.currentSnapshotId(root).get
    assert(SnapshotStore.isRehomedCommit(root, snap))
  }

  test("exact DELETE keeps the metadata-only fast path (no ReplaceData in the plan)") {
    val (_, v, _) = storeView(600L, 4)
    val plan = spark.sql(s"EXPLAIN EXTENDED DELETE FROM $v WHERE lang = 'en'")
      .collect().map(_.getString(0)).mkString("\n")
    // the ANALYZED plan is always ReplaceData (row-level ops take precedence
    // at analysis); what matters is that the OPTIMIZER converted it back
    val optimizedOn = plan.substring(plan.indexOf("== Optimized Logical Plan =="))
    assert(optimizedOn.contains("DeleteFromTableWithFilters"),
      s"expected metadata delete, got:\n$plan")
    assert(!optimizedOn.contains("ReplaceData"),
      s"exact condition must not execute a copy-on-write rewrite:\n$plan")
  }
}
