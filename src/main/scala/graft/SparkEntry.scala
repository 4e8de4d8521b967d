package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{IntBlockCodec, StringBlockCodec}
import graft.core.{GolombCodec, PhysicalIntType}
import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity, TextAnalysis}

/**
 * Driver contract: one entry per implemented operator (SURVEY.md §2), each with an
 * ANSI-SQL DuckDB oracle where expressible. Codec round-trips use IDENTITY oracles —
 * decode(encode(x)) must equal x, so the oracle is simply `SELECT x AS v`.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-trip a long column through per-partition blocks of 8192 values. */
  private def rtLong(df: DataFrame, c: String)(codec: Array[Long] => Array[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(c).cast("long")).as[Long]
      .mapPartitions(_.grouped(8192).flatMap(b => codec(b.toArray).iterator))
      .toDF("v")
  }

  private def rtString(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(c)).as[String]
      .mapPartitions(_.grouped(4096).flatMap { b =>
        StringBlockCodec.decodeStrings(StringBlockCodec.encodeStrings(b.toArray)).iterator
      })
      .toDF("v")
  }

  /** Flagship query on sf=0.001: encode+decode l_orderkey, prove identity + compression. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val rt = rtLong(li, "l_orderkey")(vs =>
      IntBlockCodec.decode(IntBlockCodec.encode(vs, PhysicalIntType.I64)))
    val a = li.select(sum($"l_orderkey").as("orig_sum"), count(lit(1)).as("orig_n"))
    val b = rt.select(sum($"v").as("rt_sum"), count(lit(1)).as("rt_n"))
    a.crossJoin(b).where($"orig_sum" === $"rt_sum" && $"orig_n" === $"rt_n")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- codec round-trips (identity oracles) ----------------
    "rt_eg_i64" -> ((s, d) => rtLong(t(s, d, "lineitem"), "l_orderkey")(vs =>
      GolombCodec.decode(GolombCodec.encode(vs, 4, PhysicalIntType.I64), 4, PhysicalIntType.I64))),

    "rt_eg_adaptive_i32" -> ((s, d) => rtLong(t(s, d, "lineitem"), "l_linenumber")(vs =>
      GolombCodec.adaptiveDecode(
        GolombCodec.adaptiveEncode(vs, 2, 2, PhysicalIntType.I32), 2, 2, PhysicalIntType.I32))
      .select(col("v").cast("int").as("v"))),

    "rt_auto_ts" -> ((s, d) => rtLong(
      t(s, d, "lineitem").select(unix_micros(col("l_shipdate").cast("timestamp")).as("us")), "us")(vs =>
      IntBlockCodec.decode(IntBlockCodec.encode(vs, PhysicalIntType.I64)))),

    "rt_auto_i64" -> ((s, d) => rtLong(t(s, d, "orders"), "o_custkey")(vs =>
      IntBlockCodec.decode(IntBlockCodec.encode(vs, PhysicalIntType.I64)))),

    "rt_str_text" -> ((s, d) => rtString(t(s, d, "documents"), "text")),

    "rt_str_lang" -> ((s, d) => rtString(t(s, d, "documents"), "lang")),

    // u64 raw-bit round trip (no SQL oracle: xxhash64 unavailable in DuckDB)
    "rt_u64" -> ((s, d) => rtLong(
      t(s, d, "orders").select(xxhash64(col("o_orderkey")).as("h")), "h")(vs =>
      IntBlockCodec.decode(IntBlockCodec.encode(vs, PhysicalIntType.U64)))),

    // Catalyst expression surface: SQL-level eg_encode/eg_decode round trip
    "rt_expr_sql" -> ((s, d) => {
      GraftFunctions.registerAll(s)
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT explode(eg_decode(eg_encode(vals, 3, 'i64'), 3, 'i64')) AS v
          |FROM (SELECT collect_list(l_suppkey) AS vals
          |      FROM lineitem_v GROUP BY l_orderkey % 64)""".stripMargin)
    }),

    // string blocks through the SQL expression surface
    "rt_expr_str" -> ((s, d) => {
      GraftFunctions.registerAll(s)
      t(s, d, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT explode(graft_decode_str(graft_encode_str(vals))) AS v
          |FROM (SELECT collect_list(lang) AS vals FROM documents_v GROUP BY source)""".stripMargin)
    }),

    // ---------------- aggregations / stats ----------------
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    "q_stats_profile" -> ((s, d) => t(s, d, "lineitem").agg(
      count(lit(1)).as("n"),
      min(col("l_partkey")).as("mn"),
      max(col("l_partkey")).as("mx"),
      countDistinct(col("l_partkey")).as("card"))),

    "q_rollup" -> ((s, d) => t(s, d, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"))),

    // salted two-phase aggregation (skew-safe heavy-hitter detection)
    "q_salted_topk_users" -> ((s, d) => {
      val e = t(s, d, "events")
      e.groupBy(col("user_id"), pmod(xxhash64(col("event_id")), lit(16)).as("salt"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id")).agg(sum(col("c")).as("cnt"))
        .orderBy(desc("cnt"), col("user_id"))
        .limit(10)
    }),

    // ---------------- joins ----------------
    "q_join_broadcast" -> ((s, d) => t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))),

    "q_join3" -> ((s, d) => t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))),

    // resume anti-join: pending = all work units minus committed
    "q_antijoin_resume" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val committed = orders.where(pmod(col("o_orderkey"), lit(10)) < 3)
        .select(col("o_orderkey"))
      orders.join(committed, Seq("o_orderkey"), "left_anti")
        .select(col("o_orderkey"))
    }),

    "q_semijoin_exists" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "orders").where(year(col("o_orderdate")) === 1995),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))),

    // ---------------- windows ----------------
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("event_id"), col("rn"))
    }),

    "q_window_gap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) - lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
        .select(col("event_id"), col("gap_us"))
    }),

    // batch time-window aggregation (streaming-shaped plan)
    "q_time_window" -> ((s, d) => t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))),

    // ---------------- set ops ----------------
    "q_setops_exceptall" -> ((s, d) => {
      val e = t(s, d, "events")
      e.where(col("event_type") === "click").select(col("user_id"))
        .exceptAll(e.where(col("event_type") === "purchase").select(col("user_id")))
    }),

    "q_setops_union" -> ((s, d) => {
      val e = t(s, d, "events")
      e.where(col("event_type") === "click").select(col("user_id"))
        .union(e.where(col("event_type") === "view").select(col("user_id")))
    }),

    // ---------------- sorts / top-k ----------------
    "q_topk_price" -> ((s, d) => t(s, d, "lineitem")
      .orderBy(desc("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(25)),

    // ---------------- scalar functions ----------------
    "q_scalar_funcs" -> ((s, d) => t(s, d, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("sp"))),

    "q_scalar_math" -> ((s, d) => t(s, d, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("ub"),
      length(col("p_name")).as("ln"),
      substring(col("p_type"), 1, 5).as("st"),
      floor(col("p_retailprice")).cast("long").as("fl"),
      ceil(col("p_retailprice")).cast("long").as("cl"),
      pmod(col("p_partkey"), lit(7)).as("md"))),

    "q_zigzag" -> ((s, d) => t(s, d, "lineitem").select(
      col("l_orderkey"),
      GraftFunctions.zigzag_encode(col("l_orderkey") - 3000).as("zz"),
      GraftFunctions.zigzag_decode(GraftFunctions.zigzag_encode(col("l_orderkey") - 3000)).as("rt"))),

    "q_stats_udaf" -> ((s, d) => t(s, d, "lineitem")
      .agg(graft.functions.StatsAggregator.graft_stats(col("l_partkey")).as("st"))
      .select(col("st.n").as("n"), col("st.mn").as("mn"),
        col("st.mx").as("mx"), col("st.maxbw").as("maxbw"))),

    "q_cube" -> ((s, d) => t(s, d, "events")
      .select(col("event_type"), year(col("ts").cast("timestamp")).as("y"))
      .cube(col("event_type"), col("y"))
      .agg(count(lit(1)).as("cnt"))),

    "q_setops_intersect" -> ((s, d) => {
      val e = t(s, d, "events")
      e.where(col("event_type") === "click").select(col("user_id"))
        .intersectAll(e.where(col("event_type") === "view").select(col("user_id")))
    }),

    "q_json" -> ((s, d) => t(s, d, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))),

    "q_array_funcs" -> ((s, d) => t(s, d, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      aggregate(transform(col("embedding"), x => x.cast("double")), lit(0.0d),
        (a, x) => a + x).as("vsum"))),

    // ---------------- dedup / text analysis (documents) ----------------
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDedup(t(s, d, "documents"), "doc_id", "text")),

    "q_fingerprint_dedup" -> ((s, d) => t(s, d, "documents")
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))),

    "q_token_count" -> ((s, d) => t(s, d, "documents").select(
      col("doc_id"), TextAnalysis.tokenCount(col("text")).as("tc"))),

    "q_quality" -> ((s, d) => t(s, d, "documents").select(
      col("doc_id"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.meanWordLen(col("text")).as("mwl"))),

    "q_langid" -> ((s, d) => t(s, d, "documents").select(
      col("doc_id"), TextAnalysis.langIdHeuristic(col("text")).as("lang_guess"))),

    // near-dup pair mining over documents ∪ perturbed copies (guaranteed positives)
    "q_minhash_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
      Dedup.minhashPairs(docs.union(perturbed), "doc_id", "text",
        numHashes = 32, bands = 8, shingleSize = 3, threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    "q_simhash_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val perturbed = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))
      Dedup.simhashPairs(docs.union(perturbed), "doc_id", "text", maxHamming = 3)
        .orderBy(col("a"), col("b"))
    }),

    "q_ngram_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select(col("doc_id"),
        Dedup.ngramJaccard(col("text"), concat(col("text"), lit(" tail")), 3).as("j"))
        .where(col("j") > 0.5)
        .select(col("doc_id"))
    }),

    // ---------------- similarity search (embeddings) ----------------
    "q_knn_brute" -> ((s, d) => {
      val q = Array.tabulate(64)(i => (math.sin(i.toDouble) * 0.5).toFloat)
      Similarity.bruteForceTopK(t(s, d, "embeddings"), "vec_id", "embedding", q, 10)
        .select(col("vec_id"))
    }),

    "q_knn_ann" -> ((s, d) => {
      val q = Array.tabulate(64)(i => (math.sin(i.toDouble) * 0.5).toFloat)
      Similarity.annTopK(t(s, d, "embeddings"), "vec_id", "embedding", q, 10)
        .select(col("vec_id"))
    }),

    "q_embedding_neardups" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val shifted = e.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x * 1.0001f).as("embedding"))
      Dedup.embeddingNearDups(e.union(shifted).withColumn("embedding",
        transform(col("embedding"), _.cast("double"))), "vec_id", "embedding")
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))
    }))

  def oracleSql: Map[String, String] = extraOracles ++ Map(
    "rt_eg_i64" -> "SELECT l_orderkey AS v FROM lineitem",
    "rt_eg_adaptive_i32" -> "SELECT l_linenumber AS v FROM lineitem",
    "rt_auto_ts" -> "SELECT epoch_us(l_shipdate) AS v FROM lineitem",
    "rt_auto_i64" -> "SELECT o_custkey AS v FROM orders",
    "rt_str_text" -> "SELECT text AS v FROM documents",
    "rt_str_lang" -> "SELECT lang AS v FROM documents",
    "rt_expr_sql" -> "SELECT l_suppkey AS v FROM lineitem",
    "rt_expr_str" -> "SELECT lang AS v FROM documents",

    "q1_agg" -> ("SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt, " +
      "sum(l_quantity) AS sum_qty, min(l_extendedprice) AS min_price, " +
      "max(l_extendedprice) AS max_price FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    "q_stats_profile" -> ("SELECT CAST(count(*) AS BIGINT) AS n, min(l_partkey) AS mn, " +
      "max(l_partkey) AS mx, CAST(count(DISTINCT l_partkey) AS BIGINT) AS card FROM lineitem"),

    "q_rollup" -> ("SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt " +
      "FROM documents GROUP BY ROLLUP(lang, source)"),

    "q_salted_topk_users" -> ("SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events " +
      "GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10"),

    "q_join_broadcast" -> ("SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt " +
      "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),

    "q_join3" -> ("SELECT n_name, CAST(count(*) AS BIGINT) AS cnt, min(o_totalprice) AS mn, " +
      "max(o_totalprice) AS mx FROM orders " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),

    "q_antijoin_resume" -> "SELECT o_orderkey FROM orders WHERE o_orderkey % 10 >= 3",

    "q_semijoin_exists" -> ("SELECT c_custkey FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)"),

    "q_window_rank" -> ("SELECT event_id, rn FROM (SELECT event_id, CAST(row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn FROM events) WHERE rn <= 3"),

    "q_window_gap" -> ("SELECT event_id, epoch_us(ts) - lag(epoch_us(ts), 1) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events"),

    "q_time_window" -> ("SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type, " +
      "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY ws, event_type"),

    "q_setops_exceptall" -> ("SELECT user_id FROM events WHERE event_type = 'click' " +
      "EXCEPT ALL SELECT user_id FROM events WHERE event_type = 'purchase'"),

    "q_setops_union" -> ("SELECT user_id FROM events WHERE event_type = 'click' " +
      "UNION ALL SELECT user_id FROM events WHERE event_type = 'view'"),

    "q_topk_price" -> ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
      "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25"),

    "q_scalar_funcs" -> ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, " +
      "CAST(month(o_orderdate) AS INTEGER) AS m, " +
      "concat(o_orderstatus, '-', o_orderpriority) AS sp FROM orders"),

    "q_scalar_math" -> ("SELECT p_partkey, upper(p_brand) AS ub, " +
      "CAST(length(p_name) AS INTEGER) AS ln, substr(p_type, 1, 5) AS st, " +
      "CAST(floor(p_retailprice) AS BIGINT) AS fl, CAST(ceil(p_retailprice) AS BIGINT) AS cl, " +
      "p_partkey % 7 AS md FROM part"),

    "q_zigzag" -> ("SELECT l_orderkey, CASE WHEN l_orderkey - 3000 < 0 " +
      "THEN -2 * (l_orderkey - 3000) - 1 ELSE 2 * (l_orderkey - 3000) END AS zz, " +
      "l_orderkey - 3000 AS rt FROM lineitem"),

    "q_dedup_exact" -> "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text",

    "q_fingerprint_dedup" -> ("SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents " +
      "GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"),

    "q_token_count" -> ("SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE " +
      "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) END AS tc FROM documents"),

    "q_quality" -> ("SELECT doc_id, " +
      "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
      "CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) " +
      "/ CAST(length(text) AS DOUBLE) END AS pr, " +
      "CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE " +
      "CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / " +
      "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) END AS mwl FROM documents"))


  private val extraOracles: Map[String, String] = Map(
    "q_stats_udaf" -> ("SELECT CAST(count(*) AS BIGINT) AS n, min(l_partkey) AS mn, " +
      "max(l_partkey) AS mx, max(CASE WHEN zz = 0 THEN 0 ELSE " +
      "CAST(floor(log2(zz)) AS BIGINT) + 1 END) AS maxbw FROM " +
      "(SELECT l_partkey, CASE WHEN l_partkey < 0 THEN -2 * l_partkey - 1 " +
      "ELSE 2 * l_partkey END AS zz FROM lineitem)"),

    "q_cube" -> ("SELECT event_type, y, CAST(count(*) AS BIGINT) AS cnt FROM " +
      "(SELECT event_type, CAST(year(ts) AS INTEGER) AS y FROM events) " +
      "GROUP BY CUBE (event_type, y)"),

    "q_setops_intersect" -> ("SELECT user_id FROM events WHERE event_type = 'click' " +
      "INTERSECT ALL SELECT user_id FROM events WHERE event_type = 'view'"),

    "q_json" -> ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) " +
      "AS k FROM events"),

    "q_array_funcs" -> ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
      "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vsum FROM embeddings"))

    // NOTE: q_langid, q_minhash_pairs, q_simhash_pairs, q_ngram_jaccard, rt_u64,
  // q_knn_brute, q_knn_ann, q_embedding_neardups have no SQL-expressible oracle
  // (hash/float semantics) — driver records rows-only checks for those.
}
