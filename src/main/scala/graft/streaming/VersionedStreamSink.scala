package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Versioned

/** The engine-owned STREAMING WRITE spelling — the write twin of
  * [[ChangeStreamProvider]]'s `readStream.format("graft-changes")`:
  *
  * {{{
  * df.writeStream.format("graft")
  *   .option("checkpointLocation", ckpt)
  *   .option("streamId", "ingest")        // idempotence scope
  *   .start(tableDir)                     // or .option("path", dir)
  * }}}
  *
  * is exactly the documented `foreachBatch` +
  * [[EventStreams.versionedSink]] discipline, with the engine owning
  * the batchId-idempotence pattern instead of every user re-deriving
  * it — the Iceberg/Delta norm (`writeStream.format("iceberg")`).
  * `option("mode", "cdc")` + `option("key", col)` selects the
  * [[EventStreams.cdcSink]] semantics instead: each micro-batch
  * carries an `op` column (`upsert`/`delete`) and lands as ONE atomic
  * [[Versioned.applyChanges]] commit. `.partitionBy(col)` routes to
  * the table's hive layout (at most one column — the engine's
  * partition spec).
  *
  * WHY the V1 `Sink` API (mirroring [[ChangeStreamSource]]'s V1
  * choice): `addBatch(batchId, df)` hands the sink the micro-batch as
  * a PLAN plus the one number the exactly-once contract needs. The
  * engine's commit path is already an atomic batch write; a DSv2
  * `StreamingWrite` would force the rows through per-partition
  * `DataWriter` commit messages only to re-assemble the same single
  * atomic publish at the driver. V1 streaming sinks are fully
  * supported engine surface (`ForeachBatchSink` ships on it).
  *
  * Exactly-once: Spark's micro-batch engine is at-least-once at the
  * sink (a crash between the table commit and the streaming
  * checkpoint replays the same batchId), so `addBatch` applies the
  * SAME two replay guards as the foreachBatch discipline — the
  * `(streamId, batchId)` note INSIDE the commit marker (covers the
  * crash window) and the `_applied_` watermark file written after
  * (survives compact/vacuum expiring the note). `streamId` is the
  * Delta `txnAppId` contract verbatim: batch ids are monotone PER
  * CHECKPOINT, so a stream restarted against a FRESH checkpoint must
  * use a new streamId, and two DIFFERENT queries writing the same
  * table must not share one. Commit races (a concurrent
  * `compactSmall`, another writer) re-run through
  * [[Versioned.retryOnRace]]: the losing attempt published nothing
  * and recomputes against the new snapshot — a streaming sink owns
  * its batches and must land them.
  *
  * Scale shape: per batch, one O(delta) manifest append (or one
  * O(touched files + delete keys) CDC commit) + two O(1) guard
  * probes; nothing grows with table history between vacuums. The
  * accumulated small per-batch files collapse under the standard
  * `compactSmall` maintenance cadence. */
final class GraftSinkProvider extends StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val dir = parameters.get("path").orElse(parameters.get("table"))
      .getOrElse(throw new IllegalArgumentException(
        "graft sink needs the versioned table directory: .start(dir) " +
          "or .option(\"path\", dir)"))
    // Append is the one mode whose rows ARE the payload. Update/
    // Complete re-emit revised aggregate rows per trigger; appending
    // those would duplicate keys silently — CDC revisions must arrive
    // as explicit op rows (mode=cdc), not as engine output modes.
    require(outputMode == OutputMode.Append,
      s"graft sink supports OutputMode.Append only, got $outputMode — " +
        "for updating semantics send op-tagged rows to mode=cdc")
    require(partitionColumns.size <= 1,
      "graft sink supports at most one partitionBy column (the " +
        s"engine's partition spec), got: ${partitionColumns.mkString(", ")}")
    val mode = parameters.getOrElse("mode", "append")
    require(mode == "append" || mode == "cdc",
      s"graft sink mode must be 'append' or 'cdc', got '$mode'")
    val key = parameters.get("key")
    require(mode != "cdc" || key.nonEmpty,
      "graft sink mode=cdc needs .option(\"key\", <column>)")
    new VersionedStreamSink(dir,
      streamId = parameters.getOrElse("streamId", "stream"),
      cdcKey = if (mode == "cdc") key else None,
      partitionCol = partitionColumns.headOption)
  }
}

private final class VersionedStreamSink(dir: String, streamId: String,
    cdcKey: Option[String], partitionCol: Option[String])
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // the addBatch frame is marked isStreaming — re-wrap its lazy
    // physical plan as a batch frame the commit path can write, and
    // persist it: the guards + commit feed several independent
    // actions, and a V1 micro-batch plan must execute exactly once
    // per action anyway (re-planning it is the documented hazard)
    val batch = org.apache.spark.sql.graft.SparkInternals
      .batchFrame(data)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try if (!batch.isEmpty) {
      val note = s"stream=$streamId;batch=$batchId"
      // bounded note scan: newest-first, stops at the last applied
      // batch's note (see EventStreams.versionedSink)
      val la = Versioned.lastApplied(spark, dir, streamId)
      val replay = la.exists(_ >= batchId) ||
        Versioned.noteRecorded(spark, dir, note,
          stopNote = la.map(b => s"stream=$streamId;batch=$b"))
      if (!replay) cdcKey match {
        case None =>
          Versioned.retryOnRace() {
            Versioned.append(batch, dir, partitionCol = partitionCol,
              note = Some(note))
          }
        case Some(k) =>
          // an unknown or NULL op must FAIL the batch, not silently
          // drop its rows (a bare !isin() is NULL for a null op)
          val unknown = batch
            .filter(col("op").isNull ||
              !col("op").isin("upsert", "delete"))
            .select("op").distinct().collect()
            .map(r => Option(r.getString(0)).getOrElse("NULL"))
          require(unknown.isEmpty, s"graft sink batch $batchId has " +
            s"unknown op values: ${unknown.mkString(", ")}")
          Versioned.retryOnRace() {
            Versioned.applyChanges(spark, dir,
              upserts = batch.filter(col("op") === "upsert").drop("op"),
              deleteKeys = batch.filter(col("op") === "delete"),
              key = k, partitionCol = partitionCol, note = Some(note))
          }
      }
      // watermark in BOTH branches: a replay detected via the note
      // means the previous attempt crashed before its recordApplied —
      // backfill so the batch never depends on the note surviving
      // later compact/vacuum
      Versioned.recordApplied(spark, dir, streamId, batchId)
    } finally batch.unpersist(blocking = false)
  }

  override def toString: String = s"GraftSink[$dir]"
}
