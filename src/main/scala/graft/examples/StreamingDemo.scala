package graft.examples

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.streaming.EventStreams

/** Runnable demo of the streaming surface: stage the events fixture as a
  * file-stream directory, run the watermarked tumbling-window aggregation
  * and the stateful per-user totals through memory sinks, print both.
  *
  * Usage: runMain graft.examples.StreamingDemo [sfDir] [workDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse("target/tmp/streaming-demo")
    val spark = Sessions.get("graft-streaming-demo")

    import java.nio.file.{Files, Paths, StandardCopyOption}
    // fresh work dir: a prior run's versioned-src table under the same
    // root would otherwise conflict with the flat event files at scan
    // time (the event stream reads `work` as its source directory)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    val dir = Paths.get(work)
    Files.createDirectories(dir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val events = EventStreams.readEvents(spark, work)
    val q1 = EventStreams.tumblingCounts(events).writeStream
      .format("memory").queryName("tumbling").outputMode("complete").start()
    q1.processAllAvailable(); q1.stop()
    val tumbling = spark.table("tumbling").orderBy(col("hour"), col("event_type"))
    println(s"TUMBLING_ROWS=${tumbling.count()}")
    tumbling.show(5, truncate = false)

    val q2 = EventStreams.runningUserTotals(spark, EventStreams.readEvents(spark, work))
      .toDF().writeStream
      .format("memory").queryName("running").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val running = spark.table("running").orderBy(col("user_id"))
    println(s"RUNNING_USERS=${running.count()}")
    running.show(5, truncate = false)

    val q3 = EventStreams.clickPurchaseJoin(EventStreams.readEvents(spark, work))
      .writeStream
      .format("memory").queryName("ssjoin").outputMode("append").start()
    q3.processAllAvailable(); q3.stop()
    println(s"JOIN_ROWS=${spark.table("ssjoin").count()}")

    // The write twin: the engine-owned streaming sink spelling — no
    // foreachBatch, the sink owns batchId idempotence. Sink table +
    // checkpoint live OUTSIDE `work`: the file-stream source scans
    // `work`, and a versioned table's v=N dirs under it would
    // conflict with the flat event files at partition inference.
    val sinkTable = s"$work-sink/table"
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(s"$work-sink"))
    val q5 = EventStreams.readEvents(spark, work)
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream.format("graft")
      .option("streamId", "demo")
      .option("checkpointLocation", s"$work-sink/ckpt")
      .start(sinkTable)
    q5.processAllAvailable(); q5.stop()
    println("SINK_VERSIONS=" +
      graft.sources.Versioned.currentVersion(spark, sinkTable))
    println("SINK_ROWS=" +
      graft.sources.Versioned.read(spark, sinkTable).count())

    // Spark-native changelog streaming over a versioned table:
    // readStream.table streams appends with Spark-owned offsets
    import spark.implicits._
    val vt = s"$work/versioned-src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(vt))
    graft.sources.Versioned.commit(
      Seq((1L, "seed")).toDF("id", "tag"), vt)
    val abs = new java.io.File(vt).getAbsolutePath
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q4 = spark.readStream.table(s"graft.`$abs`")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        { seen.addAndGet(df.count()); () })
      .start()
    try {
      q4.processAllAvailable() // anchored: the seed is history
      graft.sources.Versioned.append(
        (2L to 6L).map(i => (i, s"r$i")).toDF("id", "tag"), vt)
      q4.processAllAvailable()
    } finally q4.stop()
    println(s"TABLE_STREAM_ROWS=${seen.get()}")
    spark.stop()
  }
}
