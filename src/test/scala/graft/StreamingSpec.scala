package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  // The file stream source requires a directory; stage the single-file
  // fixture into one.
  private lazy val streamDir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get("target/tmp/stream-events")
    Files.createDirectories(dir)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  // Stream the staged parquet dir through a memory sink, synchronously.
  private def runStream(name: String,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val events = EventStreams.readEvents(spark, streamDir)
    val q = build(events).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("streaming crawl loop: foreachBatch ingestDedup with " +
      "allowReingest is replay-safe — a restarted stream re-delivers " +
      "its batches and the index neither duplicates nor drops") {
    import graft.operators.Dedup
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    val stage = Paths.get("target/tmp/crawl-src")
    val idx = "target/tmp/crawl-idx"
    val ckpt = "target/tmp/crawl-ckpt"
    Seq(stage.toString, idx, s"$idx.sigs", s"$idx.tombs", ckpt)
      .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(p)))
    Files.createDirectories(stage)
    val all = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // standing corpus; the stream delivers the crawl batches
    Dedup.buildDedupIndexOf(all.filter(col("doc_id") < 300), idx)
    def stageSlice(lo: Long, hi: Long, name: String): Unit = {
      val tmp = s"target/tmp/crawl-half-$lo"
      all.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, stage.resolve(name))
    }
    stageSlice(300, 360, "a.parquet")
    stageSlice(360, 420, "b.parquet")
    def drain(): Unit = {
      val docsStream = spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = docsStream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            _: Long) =>
          // allowReingest IS the exactly-once story here: a replayed
          // micro-batch keeps already-indexed ids by identity and
          // appends nothing, so foreachBatch's at-least-once delivery
          // composes into an idempotent crawl loop
          Dedup.ingestDedup(spark, batch, idx, allowReingest = true)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    val sigsDir = s"$idx.sigs"
    val n1 = Versioned.read(spark, sigsDir)
      .select("doc_id").distinct().count()
    val v1 = (Versioned.currentVersion(spark, idx),
      Versioned.currentVersion(spark, sigsDir))
    assert(n1 > 300, "survivors of both batches must have appended")
    // RESTART with a fresh checkpoint: both batches re-deliver; the
    // loop must neither duplicate band/sig rows nor drop survivors
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    drain()
    val n2 = Versioned.read(spark, sigsDir)
      .select("doc_id").distinct().count()
    assert(n2 == n1)
    assert((Versioned.currentVersion(spark, idx),
      Versioned.currentVersion(spark, sigsDir)) == v1,
      "a full replay must append NOTHING (kept-by-identity)")
    // and the standing index still answers: the replayed ingest left
    // no chimera sketches — every sig row is still one per doc
    val sigRows = Versioned.read(spark, sigsDir).count()
    assert(sigRows == n2)
  }

  test("streaming ingestion publishes atomic versioned snapshots") {
    import graft.sources.Versioned
    val table = "target/tmp/stream-versioned"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    val events = EventStreams.readEvents(spark, streamDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = EventStreams.versionedSink(events, table).start()
    try q.processAllAvailable() finally q.stop()
    val versions = Versioned.versions(spark, table)
    assert(versions.nonEmpty)
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    // the current snapshot is the WHOLE ingested stream, exactly once
    val cur = Versioned.read(spark, table)
    assert(cur.count() == total)
    assert(cur.select("event_id").distinct().count() == total)
    // history: version k is a strict prefix of version k+1
    val counts = versions.map(v =>
      Versioned.read(spark, table, Some(v)).count())
    assert(counts == counts.sorted)
    assert(counts.last == total)
  }

  test("multi-batch sink appends a version chain, replays are idempotent") {
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    // Stage TWO disjoint raw halves so maxFilesPerTrigger=1 yields two
    // real micro-batches — the append-onto-existing-snapshot path the
    // single-file test never reaches.
    val stage = Paths.get("target/tmp/stream-multi-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def stageHalf(rem: Int, name: String): Unit = {
      val tmp = s"target/tmp/stream-multi-half-$rem"
      raw.filter(col("event_id") % 2 === rem).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, stage.resolve(name))
    }
    stageHalf(0, "half0.parquet")
    stageHalf(1, "half1.parquet")
    val table = "target/tmp/stream-multi-versioned"
    val ckpt = "target/tmp/stream-multi-ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    def run(): Unit = {
      // the sink only consumes (event_id, user_id, value); declare the
      // on-disk schema as staged (ts layout-agnostic — see
      // EventStreams.readEvents for the ts-normalizing reader)
      val events = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .select(col("event_id"), col("user_id"), col("value"))
      val q = EventStreams.versionedSink(events, table, streamId = "multi")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val total = raw.count()
    val versions = Versioned.versions(spark, table)
    assert(versions.size >= 2) // one append per file-trigger batch
    val cur = Versioned.read(spark, table)
    assert(cur.count() == total)
    assert(cur.select("event_id").distinct().count() == total)
    // version k is a strict prefix of k+1 (append chain, time travel)
    val counts = versions.map(v =>
      Versioned.read(spark, table, Some(v)).count())
    assert(counts == counts.sorted && counts.last == total)
    // v1 was produced by a plain commit, v2+ by manifest appends that
    // LINK v1's directory rather than rewriting it
    assert(Versioned.dataFileCount(spark, table, Some(versions.head)) <
      Versioned.dataFileCount(spark, table, Some(versions.last)))
    // restart from the SAME checkpoint: no new input -> no new versions
    run()
    assert(Versioned.versions(spark, table) == versions)
    // restart from a FRESH checkpoint with the same streamId: batch ids
    // restart at 0, the applied watermark marks them as replays, and
    // the table is unchanged (the documented replay guard)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    run()
    assert(Versioned.versions(spark, table) == versions)
    assert(Versioned.read(spark, table).count() == total)
  }

  test("CDC sink applies upserts and deletes as one atomic commit per batch") {
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val stage = Paths.get("target/tmp/stream-cdc-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    // three change batches, file mtimes force micro-batch order
    def stageBatch(name: String, mtime: Long,
        rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"target/tmp/stream-cdc-$name"
      rows.toDF("id", "v", "op").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = stage.resolve(s"$name.parquet")
      Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    stageBatch("b0", t0, Seq((1L, "a1", "upsert"), (2L, "b1", "upsert"),
      (3L, "c1", "upsert"), (4L, "d1", "upsert")))
    stageBatch("b1", t0 + 10000, Seq((2L, "b2", "upsert"),
      (3L, "", "delete")))
    stageBatch("b2", t0 + 20000, Seq((3L, "c3", "upsert")))
    val table = "target/tmp/stream-cdc-table"
    val ckpt = "target/tmp/stream-cdc-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    def run(): Unit = {
      val changes = spark.readStream
        .schema("id LONG, v STRING, op STRING")
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val q = EventStreams.cdcSink(changes, table, "id",
        streamId = "cdc-spec")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val versions = Versioned.versions(spark, table)
    assert(versions == Seq(1, 2, 3)) // one atomic commit per batch
    def state(v: Int) = Versioned.read(spark, table, Some(v))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state(1) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1", 4L -> "d1"))
    // batch 2: update + delete landed together, atomically
    assert(state(2) == Map(1L -> "a1", 2L -> "b2", 4L -> "d1"))
    // batch 3: the deleted key re-inserted AFTER its tombstone survives
    assert(state(3) == Map(1L -> "a1", 2L -> "b2", 3L -> "c3", 4L -> "d1"))
    // the incremental changelog round-trips the sink's commits:
    // replaying each version's readChanges events (deletes by key,
    // then inserts) over the prior state reproduces the next state
    def replay(prev: Map[Long, String], v: Int): Map[Long, String] = {
      val ev = Versioned.readChanges(spark, table, v - 1, v).collect()
      val dels = ev.filter(_.getAs[String](Versioned.ChangeTypeCol)
        == "delete").map(_.getAs[Long]("id")).toSet
      val ins = ev.filter(_.getAs[String](Versioned.ChangeTypeCol)
        == "insert").map(r =>
        r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      (prev -- dels) ++ ins
    }
    assert(replay(Map.empty, 1) == state(1))
    assert(replay(state(1), 2) == state(2))
    assert(replay(state(2), 3) == state(3))
    val fl2 = Versioned.files(spark, table, Some(2)).collect()
    assert(fl2.exists(_.getString(4) == "delete"))
    assert(fl2.exists(r => r.getString(4) == "data" &&
      r.getString(0).startsWith("v=2/")))
    // fresh-checkpoint restart: batch ids restart at 0, the applied
    // watermark marks them replays, nothing changes
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    run()
    assert(Versioned.versions(spark, table) == versions)
    assert(state(3) == Map(1L -> "a1", 2L -> "b2", 3L -> "c3", 4L -> "d1"))
  }

  test("native writeStream.format(\"graft\") appends exactly-once " +
      "through restarts, no foreachBatch in user code") {
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    val stage = Paths.get("target/tmp/stream-native-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def stageHalf(rem: Int, name: String): Unit = {
      val tmp = s"target/tmp/stream-native-half-$rem"
      raw.filter(col("event_id") % 2 === rem).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, stage.resolve(name))
    }
    stageHalf(0, "half0.parquet")
    stageHalf(1, "half1.parquet")
    val table = "target/tmp/stream-native-table"
    val ckpt = "target/tmp/stream-native-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    def run(): Unit = {
      val events = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .select(col("event_id"), col("user_id"), col("value"))
      val q = events.writeStream.format("graft")
        .option("streamId", "native")
        .option("checkpointLocation", ckpt)
        .start(table)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val total = raw.count()
    val versions = Versioned.versions(spark, table)
    assert(versions.size >= 2) // one append per file-trigger batch
    assert(Versioned.read(spark, table).count() == total)
    assert(Versioned.read(spark, table)
      .select("event_id").distinct().count() == total)
    // same-checkpoint restart: no new input -> no new versions
    run()
    assert(Versioned.versions(spark, table) == versions)
    // FRESH checkpoint, same streamId: batch ids restart at 0, the
    // applied watermark marks them replays — exactly-once holds
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    run()
    assert(Versioned.versions(spark, table) == versions)
    assert(Versioned.read(spark, table).count() == total)
    // guard rails: Update mode and multi-column partitionBy refuse
    val ex = intercept[Exception] {
      spark.readStream.schema(raw.schema).parquet(stage.toString)
        .groupBy(col("user_id")).count()
        .writeStream.format("graft").outputMode("update")
        .option("checkpointLocation", s"$ckpt-bad")
        .start(s"$table-bad")
    }
    assert(ex.getMessage.contains("OutputMode.Append only"))
  }

  test("bronze->silver composition: native sink feeds a materialized " +
      "view, ChangeFeed-triggered refresh_mv propagates exactly-once " +
      "through a stream restart") {
    import graft.sources.{DerivedTable, Versioned}
    import graft.streaming.ChangeFeed
    import java.nio.file.{Files, Paths}
    val stage = Paths.get("target/tmp/compose-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def stageHalf(rem: Int, name: String): Unit = {
      val tmp = s"target/tmp/compose-half-$rem"
      raw.filter(col("event_id") % 2 === rem).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, stage.resolve(name))
    }
    val bronze = new java.io.File("target/tmp/compose-bronze")
      .getAbsolutePath
    val silver = new java.io.File("target/tmp/compose-silver")
      .getAbsolutePath
    val ckpt = "target/tmp/compose-ckpt"
    val feedCkpt = "target/tmp/compose-feed"
    Seq(bronze, silver, ckpt, feedCkpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    def drain(): Unit = {
      val events = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
        .select(col("event_id"), col("user_id"), col("value"))
      val q = events.writeStream.format("graft")
        .option("streamId", "compose")
        .option("checkpointLocation", ckpt)
        .start(bronze)
      try q.processAllAvailable() finally q.stop()
    }
    // bronze fills from the stream; the MV bootstraps over it in SQL
    stageHalf(0, "half0.parquet")
    drain()
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$silver` " +
      s"KEY (event_id) AS SELECT event_id, user_id, value * 2 AS w " +
      s"FROM graft.`$bronze` WHERE value >= 0")
    def recompute() = spark.sql(s"SELECT event_id, user_id, " +
      s"value * 2 AS w FROM graft.`$bronze` WHERE value >= 0")
    assert(DerivedTable.bagEqual(Versioned.read(spark, silver),
      recompute()))
    // the ChangeFeed is the refresh trigger: its poller unit sees the
    // bronze versions the stream lands and drives the argument-free
    // refresh — anchor first (fresh feeds start at current)
    ChangeFeed.pollOnce(spark, bronze, feedCkpt)((_, _, _) => ())
    var refreshed = 0
    def pollAndRefresh(): Unit =
      ChangeFeed.pollOnce(spark, bronze, feedCkpt) { (_, _, _) =>
        DerivedTable.refreshMv(spark, silver); refreshed += 1
      }
    // nothing pending -> the handler must NOT fire
    pollAndRefresh()
    assert(refreshed == 0)
    // more events stream in; one poll propagates them into silver
    stageHalf(1, "half1.parquet")
    drain()
    pollAndRefresh()
    assert(refreshed == 1)
    assert(DerivedTable.bagEqual(Versioned.read(spark, silver),
      recompute()))
    val totalExpected = raw.filter(col("value") >= 0).count()
    assert(Versioned.read(spark, silver).count() == totalExpected)
    // STREAM RESTART with a fresh checkpoint: the sink's applied
    // watermark marks the batches replays -> no new bronze versions,
    // the feed stays quiet, silver holds — exactly-once end to end
    val bronzeVs = Versioned.versions(spark, bronze)
    val silverV = Versioned.currentVersion(spark, silver)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    drain()
    assert(Versioned.versions(spark, bronze) == bronzeVs)
    pollAndRefresh()
    assert(refreshed == 1)
    assert(Versioned.currentVersion(spark, silver) == silverV)
    assert(Versioned.read(spark, silver)
      .select("event_id").distinct().count() == totalExpected)
  }

  test("native sink mode=cdc lands op-tagged batches atomically") {
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val stage = Paths.get("target/tmp/stream-native-cdc-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    def stageBatch(name: String, mtime: Long,
        rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"target/tmp/stream-native-cdc-$name"
      rows.toDF("id", "v", "op").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = stage.resolve(s"$name.parquet")
      Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    stageBatch("b0", t0, Seq((1L, "a1", "upsert"), (2L, "b1", "upsert"),
      (3L, "c1", "upsert")))
    stageBatch("b1", t0 + 10000, Seq((2L, "b2", "upsert"),
      (3L, "", "delete")))
    val table = "target/tmp/stream-native-cdc-table"
    val ckpt = "target/tmp/stream-native-cdc-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val changes = spark.readStream
      .schema("id LONG, v STRING, op STRING")
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = changes.writeStream.format("graft")
      .option("mode", "cdc").option("key", "id")
      .option("streamId", "native-cdc")
      .option("checkpointLocation", ckpt)
      .start(table)
    try q.processAllAvailable() finally q.stop()
    assert(Versioned.versions(spark, table) == Seq(1, 2))
    val state = Versioned.read(spark, table)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a1", 2L -> "b2"))
    // missing key option refuses at start, loudly
    val ex = intercept[Exception] {
      changes.writeStream.format("graft").option("mode", "cdc")
        .option("checkpointLocation", s"$ckpt-bad")
        .start(s"$table-bad")
    }
    assert(ex.getMessage.contains("key"))
  }

  test("CDC sink survives a concurrent compactSmall") {
    import graft.sources.Versioned
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val stage = Paths.get("target/tmp/stream-cdc-race-src")
    org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    Files.createDirectories(stage)
    def stageBatch(name: String, mtime: Long,
        rows: Seq[(Long, String, String)]): Unit = {
      val tmp = s"target/tmp/stream-cdc-race-$name"
      rows.toDF("id", "v", "op").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = stage.resolve(s"$name.parquet")
      Files.copy(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    // six single-file micro-batches: upserts, re-upserts, deletes
    stageBatch("b0", t0, (1L to 8L).map(i => (i, s"v$i", "upsert")))
    stageBatch("b1", t0 + 5000, Seq((2L, "b2", "upsert")))
    stageBatch("b2", t0 + 10000, Seq((3L, "", "delete")))
    stageBatch("b3", t0 + 15000, Seq((9L, "n9", "upsert")))
    stageBatch("b4", t0 + 20000, Seq((4L, "b4", "upsert"),
      (5L, "", "delete")))
    stageBatch("b5", t0 + 25000, Seq((3L, "back", "upsert")))
    val table = "target/tmp/stream-cdc-race-table"
    val ckpt = "target/tmp/stream-cdc-race-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val changes = spark.readStream
      .schema("id LONG, v STRING, op STRING")
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = EventStreams.cdcSink(changes, table, "id",
      streamId = "cdc-race-spec")
      .option("checkpointLocation", ckpt).start()
    // hammer the table with small-file maintenance while batches land:
    // whichever side loses a commit race retries (compactSmall via the
    // library's rebase-safe auto-retry, the sink via its fresh-merge
    // re-run) — nothing may be lost or doubled
    @volatile var stop = false
    val maintErrs =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val maint = new Thread(() => {
      while (!stop) {
        try {
          if (Versioned.currentVersion(spark, table) > 0)
            Versioned.compactSmall(spark, table,
              minFileBytes = 1024 * 1024)
        } catch {
          // bounded retries exhausted under pathological contention is
          // acceptable for maintenance; anything else is a real bug
          case _: Versioned.CommitRaceException => ()
          case e: Throwable => maintErrs.add(e)
        }
        Thread.sleep(15)
      }
    })
    maint.start()
    try q.processAllAvailable() finally { q.stop(); stop = true }
    maint.join(60000)
    assert(maintErrs.isEmpty, s"maintenance failed: ${maintErrs.peek()}")
    // final state reflects every batch in order, exactly once
    val state = Versioned.read(spark, table)
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "v1", 2L -> "b2", 3L -> "back",
      4L -> "b4", 6L -> "v6", 7L -> "v7", 8L -> "v8", 9L -> "n9"))
  }

  test("stream-static enrichment joins every event to its user profile") {
    // Static dimension derived from the same fixture: per-user profile.
    val users = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("lifetime_events"))
    val out = runStream("enriched",
      ev => EventStreams.enrichedEvents(ev, users)
        .select(col("event_id"), col("user_id"), col("lifetime_events")))
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(out.count() == total) // left join preserves every event
    assert(out.filter(col("lifetime_events").isNull).count() == 0)
  }

  test("streaming tumbling counts match the batch equivalent") {
    val streamed = runStream("tumbling",
      EventStreams.tumblingCounts, mode = "complete")
    val batch = graft.operators.Events.tumblingHourly(spark, sf)
    // window starts cast to string: the streaming side is an instant
    // (event time must be LTZ) while the batch side follows the
    // fixture's NTZ — under the UTC session both render identically
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("hour").cast("string"), col("event_type"),
          col("cnt"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), math.round(r.getDouble(3) * 1e4)))
        .toSet
    assert(key(streamed) == key(batch))
  }

  test("streaming hopping counts match the batch equivalent") {
    val streamed = runStream("hopping",
      EventStreams.hoppingCounts, mode = "complete")
    val batch = graft.operators.Events.hoppingQuarterHour(spark, sf)
    // sums rounded: streaming and batch may add doubles in different
    // orders (same values, last-ulp divergence)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ws").cast("string"), col("event_type"),
          col("cnt"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), math.round(r.getDouble(3) * 1e4)))
        .toSet
    assert(key(streamed) == key(batch))
  }

  test("session windows produce sessions for every active user") {
    val sessions = runStream("sessions",
      EventStreams.sessionCounts, mode = "complete")
    val users = sessions.select("user_id").distinct().count()
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(users == expected)
    // total events across sessions = total events
    val tot = sessions.agg(sum("n_events")).head().getLong(0)
    assert(tot == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("streaming dedup collapses a duplicated source to distinct events") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get("target/tmp/stream-dup")
    Files.createDirectories(dir)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("b.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val events = EventStreams.readEvents(spark, dir.toString)
    val q = EventStreams.dedupedEvents(events).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dedup").count()
    val expected = spark.read.parquet(s"$sf/events.parquet").count()
    assert(n == expected)
  }

  test("stream-stream interval join matches the batch equivalent") {
    val streamed = runStream("ssjoin", EventStreams.clickPurchaseJoin)
    // the batch oracle reads through Tables.load (layout-agnostic ts);
    // the interval arithmetic below works on either timestamp flavor
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = clicks.join(purchases,
      org.apache.spark.sql.functions.expr(
        "c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id")
    val a = streamed.select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("graft-changes streaming source delivers each version range exactly once") {
    import graft.sources.Versioned
    import spark.implicits._
    val table = "target/tmp/stream-changes-src"
    val ckpt = "target/tmp/stream-changes-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), table)
    val abs = new java.io.File(table).getAbsolutePath
    // foreachBatch sink (checkpoint-recoverable, unlike memory):
    // accumulates every delivered event across starts
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Int)]()
    def start() = {
      val changes = spark.readStream.format("graft-changes").load(abs)
      assert(changes.isStreaming)
      changes.writeStream
        .option("checkpointLocation",
          new java.io.File(ckpt).getAbsolutePath)
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.select("id", Versioned.ChangeTypeCol,
              Versioned.CommitVersionCol).collect()
              .foreach(r =>
                got.add((r.getInt(0), r.getString(1), r.getInt(2))))
        }.start()
    }
    val q = start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty) // a fresh query replays no history
      // commits under a live query: each range arrives exactly once
      Versioned.append(Seq((3, "c")).toDF("id", "v"), table) // v2
      q.processAllAvailable()
      Versioned.deleteRows(spark, table, Seq(1).toDF("id")) // v3
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == Set((3, "insert", 2), (1, "delete", 3)))
      assert(got.size == 2) // exactly once, no duplicates
    } finally q.stop()
    // the fresh query persisted its anchor into the checkpoint: a
    // restart must reuse it, never re-capture at the current version
    // (which would swallow a WAL-logged-but-uncommitted range)
    val anchorFiles = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(ckpt), null, true)
      .toArray.map(_.toString).filter(_.endsWith("graft-changes-anchor"))
    assert(anchorFiles.length == 1)
    // offline commit, then a RESTART from the same checkpoint resumes
    // at the recorded offset — the offline range arrives, prior ranges
    // do NOT replay
    Versioned.append(Seq((4, "d")).toDF("id", "v"), table) // v4
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == Set((3, "insert", 2),
        (1, "delete", 3), (4, "insert", 4)))
      assert(got.size == 3) // the restart re-delivered nothing
    } finally q2.stop()
    // startingVersion backfills history through the same source
    val q3 = spark.readStream.format("graft-changes")
      .option("startingVersion", "1").load(abs)
      .writeStream.format("memory").queryName("chg_backfill")
      .outputMode("append").start()
    try {
      q3.processAllAvailable()
      val ins = spark.table("chg_backfill")
        .filter(col(Versioned.ChangeTypeCol) === "insert")
        .select("id").collect().map(_.getInt(0)).toSet
      assert(ins == Set(1, 2, 3, 4))
    } finally q3.stop()
  }

  test("startingVersion ahead of the table is honored, not re-delivered") {
    import graft.sources.Versioned
    import spark.implicits._
    val table = "target/tmp/stream-changes-future"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), table) // v1
    Versioned.append(Seq((2, "b")).toDF("id", "v"), table) // v2
    val abs = new java.io.File(table).getAbsolutePath
    // ask to start at a version the table has not reached yet: the
    // whole (current, startingVersion) window is a requested skip —
    // an unclamped offset would commit at v2 and later deliver it
    val q = spark.readStream.format("graft-changes")
      .option("startingVersion", "5").load(abs)
      .writeStream.format("memory").queryName("chg_future")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("chg_future").isEmpty)
      Versioned.append(Seq((3, "c")).toDF("id", "v"), table) // v3
      Versioned.append(Seq((4, "d")).toDF("id", "v"), table) // v4
      q.processAllAvailable()
      assert(spark.table("chg_future").isEmpty,
        "versions below startingVersion must never deliver")
      Versioned.append(Seq((5, "e")).toDF("id", "v"), table) // v5
      q.processAllAvailable()
      val got = spark.table("chg_future")
        .select("id", Versioned.CommitVersionCol)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got == Set((5, 5)), s"expected exactly v5's change, got $got")
    } finally q.stop()
  }

  test("maxVersionsPerTrigger drains a backfill as bounded batches") {
    import graft.sources.Versioned
    import spark.implicits._
    val table = "target/tmp/stream-changes-rate"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), table)
    (2 to 6).foreach(i =>
      Versioned.append(Seq((i, "x")).toDF("id", "v"), table)) // v2..v6
    val abs = new java.io.File(table).getAbsolutePath
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val rows = new java.util.concurrent.atomic.AtomicLong()
    val q = spark.readStream.format("graft-changes")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2").load(abs)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select(Versioned.CommitVersionCol).distinct()
          .collect().map(_.getInt(0))
        if (vs.nonEmpty) spans.add(vs.max - vs.min + 1)
        rows.addAndGet(df.count())
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(rows.get() == 6L, s"backfill must deliver every row")
      import scala.jdk.CollectionConverters._
      val sp = spans.asScala.toSeq
      assert(sp.size >= 3,
        s"6 versions at 2/trigger need >= 3 batches, got $sp")
      assert(sp.forall(_ <= 2),
        s"a batch spanned more than maxVersionsPerTrigger versions: $sp")
      // live commits stay throttled too
      (7 to 9).foreach(i =>
        Versioned.append(Seq((i, "y")).toDF("id", "v"), table))
      q.processAllAvailable()
      assert(rows.get() == 9L)
      assert(spans.asScala.forall(_ <= 2))
    } finally q.stop()
  }

  test("idle triggers memoize the version probe: O(1) listings, not per tick") {
    import graft.sources.Versioned
    import graft.streaming.ChangeStreamSource
    import spark.implicits._
    val table = "target/tmp/stream-changes-idle"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), table)
    val abs = new java.io.File(table).getAbsolutePath
    val q = spark.readStream.format("graft-changes").load(abs)
      .writeStream.format("memory").queryName("chg_idle")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      // let the table root's mtime pass the stability window, then
      // measure: ~40 idle triggers must coalesce into O(1) full probes
      Thread.sleep(ChangeStreamSource.MtimeStableMs + 500)
      val before = ChangeStreamSource.fullProbes.get()
      Thread.sleep(2000)
      val delta = ChangeStreamSource.fullProbes.get() - before
      assert(delta <= 3,
        s"idle stream paid $delta directory listings in 2s of 50ms " +
          "triggers — the version probe memo is not engaging")
      // and a new commit still lands: staleness is bounded by a tick
      Versioned.append(Seq((2, "b")).toDF("id", "v"), table)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table("chg_idle").count() < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.table("chg_idle").select("id")
        .collect().map(_.getInt(0)).toSet == Set(2))
    } finally q.stop()
  }

  test("spark.readStream.table streams a versioned table's appends") {
    import graft.sources.Versioned
    import spark.implicits._
    val table = "target/tmp/stream-table-src"
    val ckpt = "target/tmp/stream-table-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), table)
    val abs = new java.io.File(table).getAbsolutePath
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.collect().foreach(r => got.add((r.getInt(0), r.getString(1))))
    // the catalog table streams directly — no format(), no options
    val q = spark.readStream.table(s"graft.`$abs`")
      .writeStream
      .option("checkpointLocation", new java.io.File(ckpt).getAbsolutePath)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => sink(df))
      .start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty) // anchored at current: no history replay
      Versioned.append(Seq((2, "b"), (3, "c")).toDF("id", "v"), table)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // TABLE-schema rows, no changelog metadata columns
      assert(got.asScala.toSet == Set((2, "b"), (3, "c")))
      // a delete is NOT an append: the batch fails loudly rather than
      // silently presenting an incomplete append-only view
      Versioned.deleteRows(spark, table, Seq(2).toDF("id"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("delete/update") ||
        Option(e.getCause).exists(_.getMessage.contains("delete/update")))
    } finally q.stop()
    // the same checkpoint restarts through the format() spelling with
    // skipDeletes: the failed range replays (anchor + offsets are
    // checkpoint state), the delete event drops, appends keep flowing
    val q2 = spark.readStream.format("graft-changes")
      .option("mode", "appends").option("skipDeletes", "true")
      .load(abs)
      .writeStream
      .option("checkpointLocation", new java.io.File(ckpt).getAbsolutePath)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => sink(df))
      .start()
    try {
      q2.processAllAvailable()
      Versioned.append(Seq((4, "d")).toDF("id", "v"), table)
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == Set((2, "b"), (3, "c"), (4, "d")))
      // skipDeletes skips the WHOLE change commit (skipChangeCommits
      // semantics): an upsert's post-image must not re-surface as a
      // fresh append — the consumer already holds the key
      Versioned.upsert(spark, table,
        Seq((3, "C2")).toDF("id", "v"), "id")
      Versioned.append(Seq((5, "e")).toDF("id", "v"), table)
      q2.processAllAvailable()
      assert(got.asScala.toSet ==
        Set((2, "b"), (3, "c"), (4, "d"), (5, "e")))
    } finally q2.stop()
  }

  test("readStream.table withChanges streams the full changelog") {
    import graft.sources.Versioned
    import spark.implicits._
    val table = "target/tmp/stream-table-chg"
    val ckpt = "target/tmp/stream-table-chg-ckpt"
    Seq(table, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), table)
    val abs = new java.io.File(table).getAbsolutePath
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, String, Int)]()
    // downstream references to the metadata columns must resolve —
    // the widened relation output is part of the contract
    val q = spark.readStream.option("withChanges", "true")
      .table(s"graft.`$abs`")
      .select(col("id"), col("v"), col(Versioned.ChangeTypeCol),
        col(Versioned.CommitVersionCol))
      .writeStream
      .option("checkpointLocation", new java.io.File(ckpt).getAbsolutePath)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(
          (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3)))): Unit)
      .start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty) // anchored at current: no history replay
      Versioned.append(Seq((2, "b")).toDF("id", "v"), table)
      // a delete flows as a _change_type=delete event instead of
      // failing the batch — the changelog contract
      Versioned.deleteRows(spark, table, Seq(1).toDF("id"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val events = got.asScala.toSet
      assert(events.exists(e =>
        e._1 == 2 && e._3 == "insert" && e._4 == 2))
      assert(events.exists(e => e._1 == 1 && e._3 == "delete"))
    } finally q.stop()
    // an explicit mode option still refuses with the format() pointer
    val err = intercept[Exception] {
      spark.readStream.option("mode", "changes")
        .table(s"graft.`$abs`")
        .writeStream.format("noop").start()
    }
    assert(err.getMessage.contains("withChanges") ||
      Option(err.getCause).exists(_.getMessage.contains("withChanges")))
  }

  test("flatMapGroupsWithState accumulates per-user running totals") {
    val running = runStream("running",
      df => EventStreams.runningUserTotals(spark, df).toDF(),
      mode = "append")
    // one output row per user per (single) microbatch; totals = batch agg
    val got = running.groupBy("user_id")
      .agg(max("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
