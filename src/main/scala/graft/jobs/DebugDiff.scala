package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc diagnostic: per-column mismatch counts between original and decoded. */
object DebugDiff {
  def main(args: Array[String]): Unit = {
    val root = args(0); val n = args(1).toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = graft.sources.Webtext.generate(spark, n, 32).toDF("url", "warc_ts", "html", "text", "lang")
    val d = DecodeJob.decode(spark, root).toDF("url", "d_warc_ts", "d_html", "d_text", "d_lang")
    val j = o.join(d, Seq("url"), "full_outer").cache()
    println("url only in original: " + j.where(col("d_lang").isNull).count())
    println("url only in decoded:  " + j.where(col("lang").isNull).count())
    println("ts diff:   " + j.where(col("d_warc_ts") =!= col("warc_ts")).count())
    println("html diff: " + j.where(col("d_html") =!= col("html")).count())
    println("text diff: " + j.where(col("d_text") =!= col("text")).count())
    println("lang diff: " + j.where(col("d_lang") =!= col("lang")).count())
    j.where(col("d_text") =!= col("text")).select("url", "text", "d_text").show(3, 120)
    j.where(col("d_warc_ts") =!= col("warc_ts")).select("url", "warc_ts", "d_warc_ts").show(3, false)
    spark.stop()
  }
}
