package graft.sources.v2

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.{DecodeJob, EncodeJob}
import graft.sources.Webtext

/**
 * DataSource V2 surface: `spark.read.format("graft").load(root)` must equal the
 * DecodeJob view, prune columns down to the block scan, prune block groups via
 * pushed filters, and answer empty-projection counts without touching `encoded`.
 */
class V2SourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("v2-source-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val N = 20000L
  /** One shared store for the suite (encode once). */
  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-v2-store-").toString
    EncodeJob.run(spark, Webtext.generate(spark, N, 8), r, parts = 8)
    r
  }

  private def graftTable: DataFrame = spark.read.format("graft").load(root)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("full scan equals the DecodeJob view (count + content)") {
    val viaV2 = graftTable
      .select(col("url"), unix_micros(col("warc_ts")).as("ts"), col("text"), col("lang"),
        md5(col("html")).as("h"))
    val viaJob = DecodeJob.decode(spark, root).toDF()
      .select(col("url"), unix_micros(col("warc_ts")).as("ts"), col("text"), col("lang"),
        md5(col("html")).as("h"))
    assert(viaV2.count() == N)
    assert(sortedRows(viaV2) == sortedRows(viaJob))
  }

  test("SQL over the registered view works with pushed filters") {
    graftTable.createOrReplaceTempView("graft_pages_v2")
    val one = Webtext.page(123L)
    val out = spark.sql(
      s"SELECT url, lang FROM graft_pages_v2 WHERE url = '${one.url}'").collect()
    assert(out.length == 1 && out(0).getString(1) == one.lang)
    // an exact-url StrEq must have pruned groups during planning
    val stats = GraftDataSource.lastPlanStats.get
    assert(stats.predicates >= 1)
    assert(stats.prunedGroupKeys.exists(_ <= 2),
      s"exact-url predicate should prune to ~1 group: $stats")
  }

  test("column pruning reaches the scan (projection in plan, equality of values)") {
    val df = graftTable.select(col("url"), col("lang"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=[url,lang]"), s"scan must carry pruned columns:\n$plan")
    val expected = DecodeJob.decodeColumns(spark, root, Seq("url", "lang"))
    assert(sortedRows(df) == sortedRows(expected))
  }

  test("url prefix filter prunes block groups and returns exact rows") {
    val prefix = "https://host-1.example.com/"
    val df = graftTable.where(col("url").startsWith(prefix)).select(col("url"))
    val got = sortedRows(df)
    val want = sortedRows(
      DecodeJob.decode(spark, root).toDF().where(col("url").startsWith(prefix))
        .select(col("url")))
    assert(got == want && got.nonEmpty)
    val stats = GraftDataSource.lastPlanStats.get
    val totalGroups = DecodeJob.blocks(spark, root).where(col("column") === "url").count()
    assert(stats.prunedGroupKeys.exists(k => k > 0 && k < totalGroups),
      s"prefix must prune block groups: $stats of $totalGroups groups")
    assert(df.queryExecution.executedPlan.toString.contains("StrPrefix"),
      "pushed predicate must be visible in the scan description")
  }

  test("warc_ts range filter prunes and returns exact rows") {
    // host-0 pages sit at the very bottom of the ts domain (base + 0*3600s)
    val hi = new java.sql.Timestamp(1735689600000L + 3600L * 1000L)
    val df = graftTable.where(col("warc_ts") <= hi).select(col("url"))
    val want = sortedRows(DecodeJob.decode(spark, root).toDF()
      .where(col("warc_ts") <= hi).select(col("url")))
    assert(sortedRows(df) == want && want.nonEmpty)
    assert(GraftDataSource.lastPlanStats.get.predicates >= 1)
  }

  test("empty projection (count(*)) never reads the encoded column") {
    assert(graftTable.count() == N)
    // non-selective residual-only filter: still exact
    assert(graftTable.where(col("lang").isNotNull).count() ==
      DecodeJob.decode(spark, root).toDF().where(col("lang").isNotNull).count())
  }

  test("non-selective pushed filter falls back to no pruning but stays exact") {
    // lang='en' is in every block's dict (55% of rows) — the gate must refuse
    // to prune (None) and the residual filter must still produce exact rows
    val df = graftTable.where(col("lang") === "en").select(col("url"))
    val got = df.count()
    val want = DecodeJob.decode(spark, root).toDF().where(col("lang") === "en").count()
    assert(got == want)
    val stats = GraftDataSource.lastPlanStats.get
    assert(stats.prunedGroupKeys.isEmpty,
      s"non-selective predicate must skip pruning: $stats")
  }

  test("string >=/< filters push OPEN-ENDED ranges and stay exact") {
    // regression: a finite stand-in upper bound (e.g. '￿'*8) would prune
    // blocks whose strings sort above it — rows silently lost. The open-ended
    // StrRange keeps every url >= lo, including ones above any finite bound.
    val lo = "https://host-3"
    val df = graftTable.where(col("url") >= lo).select(col("url"))
    val want = sortedRows(DecodeJob.decode(spark, root).toDF()
      .where(col("url") >= lo).select(col("url")))
    assert(sortedRows(df) == want && want.nonEmpty)
    assert(df.queryExecution.executedPlan.toString.contains("StrRange"),
      "string range must be pushed as a block predicate")
    val strict = graftTable.where(col("url") < lo).select(col("url"))
    val wantStrict = sortedRows(DecodeJob.decode(spark, root).toDF()
      .where(col("url") < lo).select(col("url")))
    assert(sortedRows(strict) == wantStrict && wantStrict.nonEmpty)
  }

  test("count/min/max aggregate pushdown answers from metadata (no decode, no agg exec)") {
    graftTable.createOrReplaceTempView("graft_agg_v2")
    val df = spark.sql(
      "SELECT count(*) AS c, min(warc_ts) AS mn, max(warc_ts) AS mx FROM graft_agg_v2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"aggregates must push to the scan:\n$plan")
    val row = df.collect()(0)
    val want = DecodeJob.decode(spark, root).toDF()
      .agg(count(lit(1)), min(col("warc_ts")), max(col("warc_ts"))).collect()(0)
    assert(row.getLong(0) == want.getLong(0))
    assert(row.getTimestamp(1) == want.getTimestamp(1))
    assert(row.getTimestamp(2) == want.getTimestamp(2))
    // a filtered aggregate must NOT push (metadata reflects the whole table)
    val filtered = spark.sql("SELECT count(*) AS c FROM graft_agg_v2 WHERE lang = 'en'")
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(filtered.collect()(0).getLong(0) ==
      DecodeJob.decode(spark, root).toDF().where(col("lang") === "en").count())
    // grouped aggregates now push too — via the dict-metadata path (r6)
    val grouped = spark.sql("SELECT lang, count(*) FROM graft_agg_v2 GROUP BY lang")
    assert(grouped.queryExecution.executedPlan.toString.contains("group by lang"))
    assert(grouped.count() == DecodeJob.decode(spark, root).toDF()
      .select(col("lang")).distinct().count())
  }

  test("generalized aggregate pushdown: count(col)/min/max over ANY bounded column") {
    graftTable.createOrReplaceTempView("graft_agg_any")
    // strings (exact full-value bounds) + timestamps + null counts in one shot
    val df = spark.sql("SELECT count(lang) AS cl, min(url) AS mnu, max(url) AS mxu, " +
      "min(lang) AS mnl, max(warc_ts) AS mxt FROM graft_agg_any")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("(metadata-only)"),
      s"generalized aggregates must push completely:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"complete pushdown must leave no aggregate exec:\n$plan")
    val want = DecodeJob.decode(spark, root).toDF().agg(
      count(col("lang")), min(col("url")), max(col("url")),
      min(col("lang")), max(col("warc_ts"))).collect()(0)
    val got = df.collect()(0)
    assert(got == want, s"metadata answer must equal the decode: $got vs $want")
    // null counting: planted null langs make count(lang) < count(*)
    val r2 = Files.createTempDirectory("graft-v2-aggany-nulls-").toString
    locally {
      import spark.implicits._
      EncodeJob.run(spark, Webtext.generate(spark, 2000L, 4).map(p =>
        if (p.url.endsWith("1")) p.copy(lang = null) else p), r2, parts = 2)
    }
    spark.read.format("graft").load(r2).createOrReplaceTempView("graft_agg_any_n")
    val nulls = spark.sql(
      "SELECT count(*) AS c, count(lang) AS cl FROM graft_agg_any_n")
    assert(nulls.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val nRow = nulls.collect()(0)
    assert(nRow.getLong(0) == 2000L && nRow.getLong(1) < 2000L &&
      nRow.getLong(1) == DecodeJob.decode(spark, r2).toDF()
        .where(col("lang").isNotNull).count())
    // min/max over an opaque BINARY column has no metadata bounds: shape-decline
    val onHtml = spark.sql("SELECT min(html) AS h FROM graft_agg_any")
    assert(!onHtml.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "binary min/max must not push (no bounds metadata)")
    // distinct counts cannot be answered from per-block metadata
    val distinctCount = spark.sql("SELECT count(DISTINCT lang) AS d FROM graft_agg_any")
    assert(!distinctCount.queryExecution.executedPlan.toString.contains("(metadata-only)"))
    assert(distinctCount.collect()(0).getLong(0) ==
      DecodeJob.decode(spark, root).toDF().select(col("lang")).distinct().count())
  }

  test("GROUPED aggregate pushdown: count(*) GROUP BY lang answers from dict metadata") {
    graftTable.createOrReplaceTempView("graft_gagg")
    val df = spark.sql(
      "SELECT lang, count(*) AS cnt, count(lang) AS cl FROM graft_gagg GROUP BY lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("group by lang") &&
      plan.contains("(metadata-only)"),
      s"grouped agg must push completely:\n$plan")
    val want = DecodeJob.decode(spark, root).toDF()
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"), count(col("lang")).as("cl"))
    assert(sortedRows(df) == sortedRows(want))

    // NULL group: plant null langs, rebuild, the (null, n, 0) row must appear
    import spark.implicits._
    val r2 = Files.createTempDirectory("graft-v2-gagg-nulls-").toString
    val pages = Webtext.generate(spark, 3000L, 8).map(p =>
      if (p.url.endsWith("7")) p.copy(lang = null) else p)
    EncodeJob.run(spark, pages, r2, parts = 4)
    spark.read.format("graft").load(r2).createOrReplaceTempView("graft_gagg_n")
    val dfn = spark.sql(
      "SELECT lang, count(*) AS cnt, count(lang) AS cl FROM graft_gagg_n GROUP BY lang")
    assert(dfn.queryExecution.executedPlan.toString.contains("(metadata-only)"))
    val wantN = DecodeJob.decode(spark, r2).toDF()
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"), count(col("lang")).as("cl"))
    assert(sortedRows(dfn) == sortedRows(wantN))
    val nullRow = dfn.collect().find(_.isNullAt(0))
    assert(nullRow.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0L),
      "the NULL group must count via n_nulls with count(lang) = 0")
  }

  test("GROUPED aggregate pushdown declines exactly when metadata cannot answer") {
    // text: high-cardinality long values never dict-qualify -> fallback, exact
    graftTable.createOrReplaceTempView("graft_gagg_d")
    val onText = spark.sql(
      "SELECT text, count(*) AS cnt FROM graft_gagg_d GROUP BY text")
    assert(!onText.queryExecution.executedPlan.toString.contains("(metadata-only)"),
      "text grouping must fall back (no dict coverage)")
    assert(onText.count() == DecodeJob.decode(spark, root).toDF()
      .groupBy(col("text")).count().count())

    // a filter blocks the pushdown (metadata reflects the unfiltered table)
    val filtered = spark.sql(
      "SELECT lang, count(*) AS cnt FROM graft_gagg_d WHERE lang <> 'en' GROUP BY lang")
    assert(!filtered.queryExecution.executedPlan.toString.contains("(metadata-only)"))
    val wantF = DecodeJob.decode(spark, root).toDF().where(col("lang") =!= "en")
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    assert(sortedRows(filtered) == sortedRows(wantF))

    // count of a DIFFERENT column cannot be attributed across a block
    val otherCol = spark.sql(
      "SELECT lang, count(url) AS cu FROM graft_gagg_d GROUP BY lang")
    assert(!otherCol.queryExecution.executedPlan.toString.contains("(metadata-only)"))

    // legacy store (no counts column) declines at the blocks level
    val legacy = DecodeJob.blocks(spark, root).drop("block_str_dict_counts")
    assert(GraftGroupedAgg.fromBlocks(legacy, "lang").isEmpty,
      "a pre-counts store must decline grouped pushdown")
    // and a store answering normally yields the same counts as the decode
    val viaMeta = GraftGroupedAgg.fromBlocks(DecodeJob.blocks(spark, root), "lang")
    assert(viaMeta.isDefined)
    val wantMap = DecodeJob.decode(spark, root).toDF().groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMeta.get.map(g => g.value -> g.countStar).toMap == wantMap)
  }

  test("FILTERED grouped aggregate answers from metadata at plan level (zero scan)") {
    import spark.implicits._
    val n0 = graft.plans.GroupedAggMetadataRule.fired.get()
    graftTable.createOrReplaceTempView("graft_gaggf")
    val df = spark.sql("SELECT lang, count(*) AS cnt, count(lang) AS cl " +
      "FROM graft_gaggf WHERE lang <> 'en' AND lang LIKE '__' GROUP BY lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("GraftStore"),
      s"filtered grouped agg must become a local relation:\n$plan")
    assert(graft.plans.GroupedAggMetadataRule.fired.get() > n0, "rule did not fire")
    val want = DecodeJob.decode(spark, root).toDF()
      .where(col("lang") =!= "en" && col("lang").like("__"))
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"), count(col("lang")).as("cl"))
    assert(sortedRows(df) == sortedRows(want))

    // NULL-group three-valued logic on a store with planted null langs:
    // `<>` must DROP the NULL group, `IS NULL` must keep exactly it
    val r2 = Files.createTempDirectory("graft-v2-gaggf-nulls-").toString
    val pages = Webtext.generate(spark, 2000L, 4).map(p =>
      if (p.url.endsWith("3")) p.copy(lang = null) else p)
    EncodeJob.run(spark, pages, r2, parts = 2)
    spark.read.format("graft").load(r2).createOrReplaceTempView("graft_gaggf_n")
    val neq = spark.sql(
      "SELECT lang, count(*) AS cnt FROM graft_gaggf_n WHERE lang <> 'zz' GROUP BY lang")
    assert(neq.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(neq.collect().forall(!_.isNullAt(0)), "<> must drop the NULL group")
    val wantNeq = DecodeJob.decode(spark, r2).toDF().where(col("lang") =!= "zz")
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    assert(sortedRows(neq) == sortedRows(wantNeq))
    val isNull = spark.sql(
      "SELECT lang, count(*) AS cnt, count(lang) AS cl FROM graft_gaggf_n " +
      "WHERE lang IS NULL GROUP BY lang")
    assert(isNull.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rows = isNull.collect()
    assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).getLong(1) > 0 &&
      rows(0).getLong(2) == 0L, s"IS NULL must keep exactly the NULL group: ${rows.toSeq}")
    assert(rows(0).getLong(1) ==
      DecodeJob.decode(spark, r2).toDF().where(col("lang").isNull).count())

    // declines, each falling back to an exact scan: a condition on ANOTHER
    // column; count of another column; a high-cardinality group column
    val otherCond = spark.sql("SELECT lang, count(*) AS c FROM graft_gaggf " +
      "WHERE url LIKE 'https%' GROUP BY lang")
    assert(!otherCond.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "a filter on another column must decline the metadata answer")
    val otherCount = spark.sql("SELECT lang, count(url) AS c FROM graft_gaggf " +
      "WHERE lang <> 'en' GROUP BY lang")
    assert(!otherCount.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val onText = spark.sql("SELECT text, count(*) AS c FROM graft_gaggf " +
      "WHERE text <> 'x' GROUP BY text")
    assert(!onText.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "no dict coverage must decline")
    val wantText = DecodeJob.decode(spark, root).toDF().where(col("text") =!= "x")
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
    assert(onText.count() == wantText.count())

    // the plan rule must not swallow the builder's option validation: an
    // unparseable snapshotId still throws (instead of silently answering the
    // CURRENT state from metadata before the builder ever sees the option)
    val badSnap = intercept[Exception] {
      spark.read.format("graft").option("snapshotId", "latest").load(root)
        .createOrReplaceTempView("graft_gaggf_bad")
      spark.sql("SELECT lang, count(*) AS c FROM graft_gaggf_bad " +
        "WHERE lang <> 'x' GROUP BY lang").collect()
    }
    assert(badSnap.getMessage.contains("invalid snapshotId"),
      s"rule must decline and let the builder validate: ${badSnap.getMessage}")

    // incremental (fromSnapshot) scans are NOT the state metadata describes
    spark.read.format("graft").option("fromSnapshot", "0").load(r2)
      .createOrReplaceTempView("graft_gaggf_incr")
    val incr = spark.sql("SELECT lang, count(*) AS c FROM graft_gaggf_incr " +
      "WHERE lang <> 'zz' GROUP BY lang")
    assert(!incr.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "an incremental scan must decline the metadata answer")
    assert(sortedRows(incr) == sortedRows(wantNeq.withColumnRenamed("cnt", "c")))
  }

  test("time travel: option(snapshotId) reads a historical snapshot, aggs included") {
    // a second committed wave on a COPY of the store (the shared fixture must
    // stay single-snapshot for the other tests)
    val r2 = Files.createTempDirectory("graft-v2-tt-").toString
    EncodeJob.run(spark, Webtext.generate(spark, 4000L, 4), r2, parts = 4, waves = 2)
    val ids = graft.sources.SnapshotStore.snapshotIds(r2)
    assert(ids.size == 2)
    val oldDf = spark.read.format("graft").option("snapshotId", ids.head.toString).load(r2)
    val newDf = spark.read.format("graft").load(r2)
    val (nOld, nNew) = (oldDf.count(), newDf.count())
    assert(nOld > 0 && nOld < nNew && nNew == 4000L,
      s"old snapshot must be a strict subset: $nOld vs $nNew")
    // aggregate pushdown respects the snapshot too
    oldDf.createOrReplaceTempView("graft_tt_old")
    val c = spark.sql("SELECT count(*) FROM graft_tt_old")
    assert(c.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(c.collect()(0).getLong(0) == nOld)
  }

  test("incremental read: option(fromSnapshot) returns rows ADDED in the range") {
    import org.apache.spark.sql.functions.{concat, lit}
    val r2 = Files.createTempDirectory("graft-v2-incr-").toString
    // snapshot 1: batch job; snapshot 2: SQL append; snapshot 3: compaction
    // (rehomed — must add nothing); snapshot 4: another SQL append
    EncodeJob.run(spark, Webtext.generate(spark, 1000L, 2), r2, parts = 2)
    def tagged(n: Long, tag: String): DataFrame =
      Webtext.generate(spark, n, 2).toDF()
        .select(concat(lit(tag), col("url")).as("url"), col("warc_ts"),
          col("html"), col("text"), col("lang"))
    tagged(400L, "w2-").write.format("graft").mode("append").save(r2)
    assert(graft.jobs.CompactJob.run(spark, r2).partsCompacted > 0)
    tagged(300L, "w4-").write.format("graft").mode("append").save(r2)
    val ids = graft.sources.SnapshotStore.snapshotIds(r2)
    assert(ids.size == 4)

    def delta(from: Long, to: Option[Long] = None): DataFrame = {
      var r = spark.read.format("graft").option("fromSnapshot", from.toString)
      to.foreach(t => r = r.option("toSnapshot", t.toString))
      r.load(r2)
    }
    // (1, current]: both appends, nothing from wave 1, nothing from compaction
    val d1 = delta(1L).select(col("url")).collect().map(_.getString(0))
    assert(d1.length == 700 && d1.forall(u => u.startsWith("w2-") || u.startsWith("w4-")),
      s"(1, head] must be exactly the two appends, got ${d1.length}")
    // bounded ranges
    assert(delta(1L, Some(2L)).count() == 400)
    assert(delta(2L, Some(3L)).count() == 0, "a compaction commit adds nothing")
    assert(delta(3L, Some(4L)).count() == 300)
    assert(delta(4L).count() == 0, "empty range (from == current) reads nothing")
    // from = 0 is the full additions history (original wave 1 dirs still exist)
    assert(delta(0L).count() == 1700)
    // pushed filters prune within the delta and stay exact
    val f = delta(1L).where(col("url").startsWith("w4-"))
    assert(f.count() == 300)
    // mutually exclusive options are refused loudly
    val ex = intercept[Exception] {
      spark.read.format("graft").option("fromSnapshot", "1")
        .option("snapshotId", "2").load(r2).count()
    }
    assert(ex.getMessage.contains("mutually exclusive"))
    val ex2 = intercept[Exception] {
      spark.read.format("graft").option("toSnapshot", "2").load(r2).count()
    }
    assert(ex2.getMessage.contains("toSnapshot requires fromSnapshot"))
    // a bound past the head is a user error, not a (misleading) retention one
    val exHead = intercept[Exception] {
      spark.read.format("graft").option("fromSnapshot", "1")
        .option("toSnapshot", "99").load(r2).count()
    }
    assert(exHead.getMessage.contains("beyond the current snapshot"))
    // a range whose manifests were expired fails with the remediation, never
    // a silent partial delta
    graft.sources.SnapshotStore.expireSnapshots(r2, keepLast = 1, orphanGraceMs = 0L)
    val ex3 = intercept[Exception] { delta(1L).count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex3).exists(_.contains("expired")),
      s"expired range must fail with remediation, got: ${messages(ex3)}")
  }

  test("multi-file bins: reader chains files, flushing groups at boundaries") {
    // at default confs every test-scale bin holds ONE file, so the cross-file
    // reader path (openNext, boundary flush) would go untested; forcing
    // minPartitionNum=1 packs all 8 files into 1-2 bins and must still decode
    // every group exactly once
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try {
      val viaV2 = graftTable.select(col("url"), unix_micros(col("warc_ts")).as("ts"),
        col("lang"))
      val got = sortedRows(viaV2) // materialize through GraftScan (not the agg scan)
      val stats = GraftDataSource.lastPlanStats.get
      assert(stats.partitions < stats.files && stats.files >= 2,
        s"bins must pack multiple files under minPartitionNum=1: $stats")
      val want = sortedRows(DecodeJob.decode(spark, root).toDF()
        .select(col("url"), unix_micros(col("warc_ts")).as("ts"), col("lang")))
      assert(got.length == N && got == want, "no dropped/duplicated boundary groups")
    } finally spark.conf.unset("spark.sql.files.minPartitionNum")
  }

  test("runtime filtering: join-delivered url In-filter prunes groups; joins stay exact") {
    // deterministic unit check of the runtime-filter hook itself
    val urls = Seq(Webtext.page(5L).url, Webtext.page(77L).url)
    val scan = new GraftScan(root, None, GraftDataSource.PageSchema, Seq.empty)
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("url"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("url", urls.toArray[Any])))
    scan.planInputPartitions()
    val stats = GraftDataSource.lastPlanStats.get
    val totalGroups = DecodeJob.blocks(spark, root).where(col("column") === "url").count()
    assert(stats.prunedGroupKeys.exists(k => k > 0 && k < totalGroups),
      s"runtime In-filter must prune groups: $stats of $totalGroups")
    // an oversized or unconvertible runtime filter is a sound no-op
    val scan2 = new GraftScan(root, None, GraftDataSource.PageSchema, Seq.empty)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("url", Array.tabulate(20000)(i => s"u$i": Any))))
    scan2.planInputPartitions()
    assert(GraftDataSource.lastPlanStats.get.prunedGroupKeys.isEmpty)
    // end-to-end: broadcast join over the V2 table returns exact rows
    import spark.implicits._
    val small = urls.toDF("url")
    val joined = graftTable.join(broadcast(small), Seq("url")).select(col("url"), col("lang"))
    val want = DecodeJob.decode(spark, root).toDF()
      .join(broadcast(small), Seq("url")).select(col("url"), col("lang"))
    assert(sortedRows(joined) == sortedRows(want) && joined.count() == 2)
  }

  test("SQL DDL: CREATE TEMPORARY VIEW ... USING graft works end-to-end") {
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ddl_v2 USING graft " +
      s"OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM graft_ddl_v2").collect()(0).getLong(0) == N)
    val one = Webtext.page(42L)
    val row = spark.sql(
      s"SELECT lang FROM graft_ddl_v2 WHERE url = '${one.url}'").collect()
    assert(row.length == 1 && row(0).getString(0) == one.lang)
  }

  test("opt-in COLUMNAR scans: batches feed ColumnarToRow, values stay exact") {
    // columnar is opt-in (measured: copying multi-KB blobs into vectors loses
    // 2x to zero-copy row wrapping on full scans; narrow projections are ~even)
    spark.conf.set("spark.graft.v2.columnar", "true")
    graftTable.createOrReplaceTempView("graft_count_cols_v2")
    try {
      val df = graftTable.select(col("url"), col("lang"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ColumnarToRow"),
        s"scan must produce ColumnarBatches consumed via ColumnarToRow:\n$plan")
      // equality through the columnar path incl. nullable warc_ts + binary html
      val full = graftTable.select(col("url"), unix_micros(col("warc_ts")).as("ts"),
        md5(col("html")).as("h"), col("text"))
      val want = sortedRows(DecodeJob.decode(spark, root).toDF()
        .select(col("url"), unix_micros(col("warc_ts")).as("ts"),
          md5(col("html")).as("h"), col("text")))
      assert(sortedRows(full) == want)
      // empty-projection (constant select) through the zero-column batch path
      assert(spark.sql("SELECT 1 FROM graft_count_cols_v2").count() == N)
      // forced group splitting: a tiny per-column byte ceiling must slice every
      // group into many batches with identical results (the 2GB-contiguous
      // OnHeapColumnVector guard at scale)
      val saved = GraftColumnarReader.MaxBatchColumnBytes
      try {
        GraftColumnarReader.MaxBatchColumnBytes = 4096L
        val sliced = graftTable.select(col("url"), unix_micros(col("warc_ts")).as("ts"),
          md5(col("html")).as("h"), col("text"))
        assert(sortedRows(sliced) == want, "split batches must lose/duplicate nothing")
      } finally GraftColumnarReader.MaxBatchColumnBytes = saved
    } finally spark.conf.unset("spark.graft.v2.columnar")
    // default stays ROW-based (no ColumnarToRow over the graft scan)
    val rowPlan = graftTable.select(col("url")).queryExecution.executedPlan.toString
    assert(!rowPlan.contains("ColumnarToRow"), s"default must be row-based:\n$rowPlan")
  }

  test("pruning survives >4096 surviving groups (broadcast keys, per-bin slicing)") {
    // r4 regression: the scan dropped ALL pruning past DecodeJob.MaxFallbackGroups
    // (4096) because the whole packed-key array rode every InputPartition. With
    // broadcast + per-dir slicing the SQL surface must prune as deep as the
    // decodeWhere API. Fixture: 1-row block groups (maxBlockBytes=1) make 12k
    // groups from 12k rows; the byte-bound store under-estimates the manifest
    // group count, so the break-even FRACTION heuristic (not the mechanism under
    // test) is widened for the duration.
    val r2 = Files.createTempDirectory("graft-v2-manykeys-").toString
    EncodeJob.run(spark, Webtext.generate(spark, 12000L, 8), r2, parts = 8,
      maxBlockBytes = 1L)
    val savedCutoff = DecodeJob.PruneFractionCutoff
    try {
      DecodeJob.PruneFractionCutoff = 1e9
      val pred = col("url") < "https://host-2" // ~37% of zipf-hosted urls
      val want = sortedRows(DecodeJob.decode(spark, r2).toDF()
        .where(pred).select(col("url")))
      assert(want.length > DecodeJob.MaxFallbackGroups,
        s"fixture must survive in >4096 groups, got ${want.length}")
      val df = spark.read.format("graft").load(r2).where(pred).select(col("url"))
      assert(sortedRows(df) == want)
      val stats = GraftDataSource.planStatsFor(r2).get
      assert(stats.prunedGroupKeys.exists(_ > DecodeJob.MaxFallbackGroups),
        s"scan must prune past the old 4096 ceiling: $stats")
      // over the per-task In-filter budget: only part_id pushes to parquet, the
      // exact liveGroup check keeps rows identical
      val savedBudget = GraftDataSource.InFilterMaxKeys
      try {
        GraftDataSource.InFilterMaxKeys = 16
        val capped = spark.read.format("graft").load(r2).where(pred).select(col("url"))
        assert(sortedRows(capped) == want, "over-budget In-filter must stay exact")
      } finally GraftDataSource.InFilterMaxKeys = savedBudget
    } finally DecodeJob.PruneFractionCutoff = savedCutoff
  }

  test("limit pushdown: scan carries the limit, tasks stop early, counts exact") {
    val df = graftTable.limit(777)
    assert(df.count() == 777)
    val stats = GraftDataSource.planStatsFor(root).get
    assert(stats.pushedLimit.contains(777), s"limit must reach the scan: $stats")
    val builder = new GraftScanBuilder(root, None)
    builder.pushLimit(777)
    assert(builder.build().description().contains("PushedLimit: 777"),
      "pushed limit must be visible in the scan description")
    // limit larger than the table is exact too
    assert(graftTable.limit((N + 5).toInt).count() == N)
    // a RESIDUAL filter blocks limit pushdown (pushing through a post-scan
    // filter would under-produce) — results must still be exact
    val filtered = graftTable.where(col("lang") === "en").limit(50)
    assert(filtered.count() == 50)
    // columnar path honors the cap at batch granularity
    spark.conf.set("spark.graft.v2.columnar", "true")
    try assert(graftTable.limit(777).count() == 777)
    finally spark.conf.unset("spark.graft.v2.columnar")
  }

  test("top-n pushdown: ORDER BY url LIMIT n prunes to a url-prefix of groups") {
    val df = graftTable.orderBy(col("url")).limit(40).select(col("url"), col("lang"))
    val want = DecodeJob.decode(spark, root).toDF().orderBy(col("url")).limit(40)
      .select(col("url"), col("lang")).collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == want)
    val stats = GraftDataSource.planStatsFor(root).get
    assert(stats.pushedTopN.exists(t => t.asc && t.nullsFirst && t.limit == 40),
      s"top-n must reach the scan: $stats")
    assert(stats.prunedGroupKeys.exists(_ <= 2),
      s"a 40-row prefix of an 8-group store should keep ~1 group: $stats")
    assert(df.queryExecution.executedPlan.toString.contains("PushedTopN"),
      "pushed top-n must be visible in the scan description")

    // DESC reads the url-SUFFIX groups instead
    val wantDesc = DecodeJob.decode(spark, root).toDF().orderBy(col("url").desc).limit(40)
      .select(col("url")).collect().map(_.toString).toSeq
    assert(graftTable.orderBy(col("url").desc).limit(40).select(col("url"))
      .collect().map(_.toString).toSeq == wantDesc)
    val statsDesc = GraftDataSource.planStatsFor(root).get
    assert(statsDesc.pushedTopN.exists(t => !t.asc) && statsDesc.prunedGroupKeys.exists(_ <= 2),
      s"desc top-n should prune to the url-suffix groups: $statsDesc")

    // any filter blocks top-n pushdown (group row counts no longer bound the
    // MATCHING rows) — results stay exact via Spark's own sort+limit
    val filtered = graftTable.where(col("lang") === "en").orderBy(col("url")).limit(10)
    assert(filtered.collect().length == 10)
    assert(GraftDataSource.planStatsFor(root).get.pushedTopN.isEmpty,
      "a residual filter must keep top-n out of the scan")

    // a limit past the table keeps every row (quota unreachable -> no pruning)
    assert(graftTable.orderBy(col("url")).limit((N + 5).toInt).count() == N)
  }

  test("top-n pushdown: ORDER BY warc_ts LIMIT n prunes via exact int block bounds") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // a store whose warc_ts CORRELATES with the url layout (a time-partitioned
    // crawl): per-block ts bounds are then narrow/disjoint and the prefix plan
    // prunes. On the suite's shared store ts is random per block, every group
    // survives, and the fraction gate correctly yields a full scan — covered
    // at the end of this test.
    val r2 = Files.createTempDirectory("graft-v2-topn-ts-").toString
    val pages = Webtext.generate(spark, 8000L, 8).toDF()
      .withColumn("rk", row_number().over(Window.orderBy(col("url"))))
      .withColumn("warc_ts",
        expr("timestampadd(SECOND, rk, timestamp'2024-01-01 00:00:00')"))
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"))
      .as[graft.sources.WebPage]
    EncodeJob.run(spark, pages, r2, parts = 8)
    val v2 = spark.read.format("graft").load(r2)
    val full = DecodeJob.decode(spark, r2).toDF()

    val got = v2.orderBy(col("warc_ts")).limit(40).select(col("url"), col("warc_ts"))
      .collect().map(_.toString).sorted.toSeq
    val want = full.orderBy(col("warc_ts")).limit(40).select(col("url"), col("warc_ts"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
    val stats = GraftDataSource.planStatsFor(r2).get
    assert(stats.pushedTopN.exists(t => t.column == "warc_ts" && t.asc && t.limit == 40),
      s"warc_ts top-n must reach the scan: $stats")
    assert(stats.prunedGroupKeys.exists(_ <= 3),
      s"a 40-row ts-prefix of an 8-group time-partitioned store keeps few groups: $stats")

    // DESC reads the ts-suffix groups
    val gotDesc = v2.orderBy(col("warc_ts").desc).limit(40).select(col("warc_ts"))
      .collect().map(_.toString).sorted.toSeq
    val wantDesc = full.orderBy(col("warc_ts").desc).limit(40).select(col("warc_ts"))
      .collect().map(_.toString).sorted.toSeq
    assert(gotDesc == wantDesc)
    assert(GraftDataSource.planStatsFor(r2).get.pushedTopN.exists(t =>
      t.column == "warc_ts" && !t.asc))
    assert(GraftDataSource.planStatsFor(r2).get.prunedGroupKeys.exists(_ <= 3))

    // shared store: ts does NOT correlate with the url layout — every group
    // survives, the gate trips, the scan stays full and results exact (the ts
    // multiset is deterministic even with ties at the cut)
    val gotShared = graftTable.orderBy(col("warc_ts")).limit(40).select(col("warc_ts"))
      .collect().map(_.toString).sorted.toSeq
    val wantShared = DecodeJob.decode(spark, root).toDF().orderBy(col("warc_ts"))
      .limit(40).select(col("warc_ts")).collect().map(_.toString).sorted.toSeq
    assert(gotShared == wantShared)
    val sharedStats = GraftDataSource.planStatsFor(root).get
    assert(sharedStats.pushedTopN.exists(_.column == "warc_ts") &&
      sharedStats.prunedGroupKeys.isEmpty,
      s"uncorrelated ts must fall back to a full (sound) scan: $sharedStats")
  }

  test("top-n pushdown on warc_ts with planted NULLs stays exact under both orderings") {
    import spark.implicits._
    val r2 = Files.createTempDirectory("graft-v2-topn-ts-nulls-").toString
    val nullIds = Set("100", "101", "102", "103", "104")
    val pages = Webtext.generate(spark, 4000L, 8).map { p =>
      if (nullIds.contains(p.url.substring(p.url.lastIndexOf('/') + 1)))
        p.copy(warc_ts = null)
      else p
    }
    EncodeJob.run(spark, pages, r2, parts = 4)
    val v2 = spark.read.format("graft").load(r2)
    val full = DecodeJob.decode(spark, r2).toDF()
    def tss(df: DataFrame): Seq[String] =
      df.collect().map(r => if (r.isNullAt(0)) "null" else r.get(0).toString).sorted.toSeq

    // default asc = NULLS FIRST: the 5 null-ts rows are in the top-20
    val got = v2.orderBy(col("warc_ts")).limit(20).select(col("warc_ts"))
    val want = full.orderBy(col("warc_ts")).limit(20).select(col("warc_ts"))
    assert(tss(got) == tss(want))
    assert(got.collect().count(_.isNullAt(0)) == 5, "null ts must sort into the top-n")
    assert(GraftDataSource.planStatsFor(r2).get.pushedTopN.exists(t =>
      t.column == "warc_ts" && t.nullsFirst))

    // NULLS LAST: pure non-null top-15
    val gotLast = v2.orderBy(col("warc_ts").asc_nulls_last).limit(15).select(col("warc_ts"))
    val wantLast = full.orderBy(col("warc_ts").asc_nulls_last).limit(15).select(col("warc_ts"))
    assert(tss(gotLast) == tss(wantLast))
    assert(gotLast.collect().forall(!_.isNullAt(0)))
  }

  test("top-n pushdown with NULL urls stays exact under both null orderings") {
    import spark.implicits._
    val r2 = Files.createTempDirectory("graft-v2-topn-nulls-").toString
    val nullIds = Set("100", "101", "102", "103", "104")
    val pages = Webtext.generate(spark, 4000L, 8).map { p =>
      if (nullIds.contains(p.url.substring(p.url.lastIndexOf('/') + 1))) p.copy(url = null)
      else p
    }
    EncodeJob.run(spark, pages, r2, parts = 4)
    val v2 = spark.read.format("graft").load(r2)
    val full = DecodeJob.decode(spark, r2).toDF()

    // Spark's default asc = NULLS FIRST: all 5 null-url rows are IN the top-20,
    // so the group holding them must survive pruning via its n_nulls metadata
    val got = v2.orderBy(col("url")).limit(20).select(col("url"), col("text"))
    val want = full.orderBy(col("url")).limit(20).select(col("url"), col("text"))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.collect().count(_.isNullAt(0)) == 5, "null urls must sort into the top-n")
    val stats = GraftDataSource.planStatsFor(r2).get
    assert(stats.pushedTopN.exists(_.nullsFirst), s"default asc pushes NULLS FIRST: $stats")

    // NULLS LAST: the top-15 is pure non-null; null counts keep the quota honest
    val gotLast = v2.orderBy(col("url").asc_nulls_last).limit(15).select(col("url"))
    val wantLast = full.orderBy(col("url").asc_nulls_last).limit(15).select(col("url"))
    assert(sortedRows(gotLast) == sortedRows(wantLast))
    assert(gotLast.collect().forall(!_.isNullAt(0)))
    assert(GraftDataSource.planStatsFor(r2).get.pushedTopN.exists(!_.nullsFirst))

    // pre-n_nulls stores (column absent -> null count UNKNOWN) must not prune
    // unsoundly: nulls-first keeps every possibly-null group (gate -> None),
    // nulls-last can never establish the quota (countable rows are 0) -> None
    val legacy = DecodeJob.blocks(spark, r2).drop("n_nulls")
    assert(DecodeJob.planTopNKeys(legacy, "url", asc = true, nullsFirst = false, 15, 4L).isEmpty,
      "unknown null counts must yield no nulls-last pruning")
    // nulls-first on a legacy store keeps EVERY group (each may hold nulls):
    // a wide gate (estimate 1000 -> threshold 500) proves the survivor set is
    // genuinely all 4 url groups, not a coincidence of the gate tripping...
    val legacyKeys = DecodeJob.planTopNKeys(legacy, "url", asc = true, nullsFirst = true, 15, 1000L)
    assert(legacyKeys.exists(_.length == 4), s"legacy nulls-first must keep ALL groups: " +
      s"${legacyKeys.map(_.length)}")
    // ...and at the store's REAL size the 4-of-4 survivor set trips the
    // fraction gate (threshold 2), so the caller scans everything — sound
    assert(DecodeJob.planTopNKeys(legacy, "url", asc = true, nullsFirst = true, 15, 4L).isEmpty,
      "an all-groups survivor set must trip the fraction gate")
  }

  test("V2 scan reads compacted (negative part-id) stores completely") {
    // regression: the reader's one-group buffer used `bufKey < 0` as its
    // empty sentinel — compacted parts live in a NEGATIVE id namespace, so
    // every compacted group silently vanished from the V2 surface
    val r2 = Files.createTempDirectory("graft-v2-compacted-").toString
    EncodeJob.run(spark, Webtext.generate(spark, 3000L, 8), r2, parts = 8)
    val cr = graft.jobs.CompactJob.run(spark, r2)
    assert(cr.partsCompacted > 0 && cr.partsCreated > 0)
    assert(graft.sources.SnapshotStore.currentEntries(r2).exists(_.partId < 0))
    val viaV2 = spark.read.format("graft").load(r2)
      .select(col("url"), md5(col("html")).as("h"), col("lang"))
    val want = sortedRows(DecodeJob.decode(spark, r2).toDF()
      .select(col("url"), md5(col("html")).as("h"), col("lang")))
    assert(viaV2.count() == 3000L, "compacted groups must not vanish from the V2 scan")
    assert(sortedRows(viaV2) == want)
  }

  test("statistics report manifest row count and decoded size") {
    val scan = new GraftScan(root, None, GraftDataSource.PageSchema, Seq.empty)
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong == N)
    assert(st.sizeInBytes().getAsLong > 0)
  }
}
