package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one driver query repeatedly (min-of-N, same method as Bench). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <query-name> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-qt-$name")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    if (reps == 0) { // explain mode: dump the formatted physical plan
      println(s"== $name ==")
      fn(spark, sfDir).explain("formatted")
    } else {
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"run $i: $s%.3f s")
        s
      }
      println(f"$name min=${times.min}%.3f s over $reps runs")
    }
    spark.stop()
  }
}
