package graft.jobs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.jobs.{DecodeJob, EncodeJob}
import graft.sources.{SnapshotStore, Webtext}

/**
 * Dev tool: scale/throughput checkpoint for the streaming READ surface
 * (`readStream.format("graft")`, see graft.sources.v2 MICRO_BATCH_READ).
 *
 * Builds (or reuses) a multi-snapshot store, then measures:
 *  1. a fresh AvailableNow drain of the whole store (per-batch rows, total
 *     rows/s — the "bootstrap a new consumer" cost vs the batch scan);
 *  2. an INCREMENTAL catch-up: append one more wave, restart the stream from
 *     its checkpoint, and time the delta-only batch (the steady-state cost a
 *     training-data pipeline pays per new crawl snapshot);
 *  3. content equality: bit_xor(xxhash64(url, text, lang)) + row count of
 *     everything streamed == the batch decode of the final snapshot.
 *
 * Usage: runMain graft.jobs.StreamReadCheck [pages] [root] [parts] [waves]
 */
object StreamReadCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 400000L
    val root = if (args.length > 1) args(1) else "/dev/shm/graft-streamread"
    val parts = if (args.length > 2) args(2).toInt else 32
    val waves = if (args.length > 3) args(3).toInt else 4
    val spark = LocalSession.create("graft-stream-read-check")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // waves sequential commits now, one more appended later for the catch-up
    val perWave = n / (waves + 1)
    val t0 = System.nanoTime()
    // no cache: the generator is deterministic and ~free relative to encode,
    // and at checkpoint scale (5M pages = 11.5 GB) caching would thrash
    val all = Webtext.generate(spark, n, parts)
    // each wave appends NEW rows, so it gets its own part-id namespace
    // (run() treats an already-committed id as resumable work, not new data)
    (0 until waves).foreach { w =>
      val slice = all.where(pmod(xxhash64($"url"), lit(waves + 1)) === w)
      EncodeJob.run(spark, slice, root, parts, partOffset = w.toLong * parts)
    }
    println(f"store: ${waves} snapshots, ~$perWave rows each, " +
      f"built in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def drain(checkpoint: String, label: String): (Long, Long, Double) = {
      val t = System.nanoTime()
      var rows = 0L
      var hash = 0L
      var batches = 0L
      val q = spark.readStream.format("graft").load(root)
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val r = df.agg(count(lit(1)), bit_xor(xxhash64($"url", $"text", $"lang")))
            .as[(Long, Option[Long])].head()
          rows += r._1
          hash ^= r._2.getOrElse(0L)
          batches += 1
          ()
        }
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t) / 1e9
      println(f"$label: $batches batches, $rows rows in $secs%.2f s " +
        f"(${rows / math.max(secs, 1e-9)}%.0f rows/s)")
      (rows, hash, secs)
    }

    // the root may be REUSED across runs (rebuilding 5M pages is the slow
    // part), but the checkpoint must NOT be: a surviving checkpoint makes the
    // "fresh drain" silently empty and the catch-up wave inert, and the tool
    // then reports a false content-hash MISMATCH on a perfectly good store
    val ckpt = root + "-ckpt-" + java.util.UUID.randomUUID().toString.take(8)
    val (rows1, hash1, _) = drain(ckpt, s"fresh drain ($waves snapshots)")

    // steady state: one new wave lands, the restarted stream reads ONLY it.
    // Its namespace comes from the max COMMITTED id, not waves*parts — on a
    // reused store the prior run's catch-up wave already owns that range and
    // run() would treat the new wave as resumed (i.e. committed) work
    val catchupOffset =
      (SnapshotStore.committedPartIds(root).filter(_ >= 0).max / parts + 1).toLong * parts
    EncodeJob.run(spark, all.where(pmod(xxhash64($"url"), lit(waves + 1)) === waves), root, parts,
      partOffset = catchupOffset)
    val (rows2, hash2, secs2) = drain(ckpt, "incremental catch-up (1 new snapshot)")

    val batch = DecodeJob.decode(spark, root).toDF()
      .agg(count(lit(1)), bit_xor(xxhash64($"url", $"text", $"lang")))
      .as[(Long, Option[Long])].head()
    val streamedRows = rows1 + rows2
    val streamedHash = hash1 ^ hash2
    println(f"batch decode: ${batch._1} rows; streamed total: $streamedRows rows")
    println(s"content hash ${if (batch._2.getOrElse(0L) == streamedHash && batch._1 == streamedRows)
      "IDENTICAL" else s"MISMATCH (batch=${batch._2} streamed=$streamedHash)"}")
    println(f"steady-state per-snapshot cost: $secs2%.2f s for $rows2 rows " +
      f"(${rows2 / math.max(secs2, 1e-9)}%.0f rows/s)")
    spark.stop()
  }
}
