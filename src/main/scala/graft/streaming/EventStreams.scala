package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over event data (north-star; the reference is
  * batch-only, SURVEY.md §2.9). The batch queries in
  * [[graft.operators.Events]] define the semantics; these are the
  * incremental versions: watermarked tumbling windows, session windows,
  * and custom per-key state via flatMapGroupsWithState.
  *
  * At scale: state is partitioned by grouping key across executors; the
  * watermark bounds state size (late rows beyond 30 minutes are dropped),
  * which is what keeps a 1000-executor streaming job stable over 100 TB
  * of replayed history.
  */
object EventStreams {

  /** Parquet stream schema for the events layout, parameterized on the
    * on-disk `ts` type: a stream source needs a declared schema (no
    * inference), and the fixture has shipped `ts` as TIMESTAMP(NANOS)
    * (surfacing as Long under nanosAsLong) and as tz-less
    * TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ) across
    * generations. */
  private def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `tsType` pins the on-disk `ts` layout explicitly — REQUIRED for
    * a stream started before its producer writes the first file: the
    * schema is a stream-definition property (it cannot re-sniff per
    * batch), so with no footer to read the fallback assumes the
    * legacy Long-nanos layout, and a producer that later writes
    * timestamp-typed parquet would fail every micro-batch against
    * the locked-in LONG schema. On a populated directory one
    * driver-side footer read decides; declaring the wrong type would
    * either fail the scan or misread raw micros as nanos (1000x). */
  def readEvents(spark: SparkSession, dir: String,
      tsType: Option[org.apache.spark.sql.types.DataType] = None)
      : DataFrame = {
    // the Long-nanos fallback is ONLY for a missing/empty directory
    // (stream declared before its producer's first file). A POPULATED
    // directory that fails the sniff (transient FS fault, permissions)
    // must rethrow: falling back there would silently lock the wrong
    // schema into the stream definition and fail or 1000x-misread
    // every micro-batch.
    val onDisk = tsType.getOrElse {
      val p = new org.apache.hadoop.fs.Path(dir)
      val f = p.getFileSystem(spark.sessionState.newHadoopConf())
      val populated = f.exists(p) && f.listStatus(p).exists { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      if (!populated) LongType
      else spark.read.parquet(dir).schema("ts").dataType
    }
    val raw = spark.readStream.schema(rawSchema(onDisk)).parquet(dir)
    onDisk match {
      // integral `div`, not `/`: double division is 256 ns coarse at
      // 2024-epoch nanos — boundary rows would diverge from exact
      // truncation (see Tables.load)
      case LongType => raw
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // event-time (watermarks, window state) requires an instant —
      // Spark refuses TIMESTAMP_NTZ event time. Interpret the naive
      // wall-clock as UTC (the same convention the batch side and
      // DuckDB apply to these files): the LTZ cast SUBTRACTS the
      // session-zone offset, from_utc_timestamp ADDS it back — exact
      // wall-clock-as-UTC under any fixed-offset session zone (the
      // engine pins UTC, where both steps are identities).
      case TimestampNTZType => raw
        .withColumn("ts", from_utc_timestamp(col("ts").cast("timestamp"),
          current_timezone()))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windowed counts with a 30-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Hopping 1-hour/15-minute windowed counts — the incremental form of
    * Events.hoppingQuarterHour. Watermark bounds the open-window state
    * to (watermark horizon / slide) windows per key. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Session windows (30-minute gap) per user — the incremental form of
    * Events.sessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within the following 30 minutes. Watermarks bound both
    * join states (rows older than watermark + interval are evicted), so
    * state stays finite on unbounded streams — the streaming form of the
    * batch range join. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""))
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
  }

  /** Stream-static enrichment join: each streamed event looks up its
    * user's profile in a static dimension table. The static side is
    * broadcast per micro-batch (no streaming state at all — the usual
    * dimension-lookup shape); on a cluster the dimension can also be
    * re-read per batch to pick up slowly-changing updates. */
  def enrichedEvents(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left")

  /** Streaming exact-dedup by event_id: watermark-bounded state, so a
    * replayed/at-least-once source dedups without unbounded memory —
    * the streaming face of TextAnalysis.dedupExact. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming ingestion into a [[graft.sources.Versioned]] snapshot
    * table: every micro-batch APPENDS as one atomic commit
    * ([[graft.sources.Versioned.append]]), so version k is exactly the
    * first k batches — batch readers always see a consistent prefix of
    * the stream and time travel walks ingestion history — the streaming
    * face of the reference's Iceberg-append pattern. foreachBatch is
    * the idiomatic exactly-once-per-batch sink seam; at scale,
    * compaction ([[graft.sources.Versioned.compact]]) runs periodically
    * over the accumulated small per-batch files. */
  /** @param streamId idempotence scope for this ingestion stream — the
    *   Delta `txnAppId` pattern: batch ids are monotone PER CHECKPOINT,
    *   so a stream restarted against a FRESH checkpoint (ids restart at
    *   0) must use a new streamId or its early batches would be
    *   mistaken for replays; a restart from the SAME checkpoint keeps
    *   the same streamId. */
  def versionedSink(events: DataFrame, tableDir: String,
      streamId: String = "events")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch is at-least-once: after a crash between the
        // commit and the streaming checkpoint, the same batchId
        // replays. Two replay guards make appends exactly-once:
        //  - the (streamId, batchId) note INSIDE the commit marker,
        //    written at the atomic commit point — covers the crash
        //    window below;
        //  - the _applied_<streamId>=<batchId> watermark file, written
        //    after the commit — survives compact/vacuum rewriting or
        //    expiring the marker that carried the note.
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val note = s"stream=$streamId;batch=$batchId"
          // The note scan is BOUNDED: markers are read newest-first and
          // stop at the last-applied batch's note, so a long-running
          // stream pays O(commits since last applied) marker reads per
          // batch, not O(all versions) — which grows without bound
          // between vacuums.
          val la = graft.sources.Versioned
            .lastApplied(spark, tableDir, streamId)
          val replay = la.exists(_ >= batchId) ||
            graft.sources.Versioned.noteRecorded(spark, tableDir, note,
              stopNote = la.map(b => s"stream=$streamId;batch=$b"))
          if (!replay)
            graft.sources.Versioned.append(batch, tableDir,
              note = Some(note))
          // Watermark in BOTH branches: a replay detected via the
          // commit note means the previous attempt crashed before its
          // recordApplied — backfill it so the batch does not depend on
          // the note surviving later compact/vacuum.
          graft.sources.Versioned.recordApplied(spark, tableDir,
            streamId, batchId)
        }
        ()
      }

  /** Streaming CDC apply into a [[graft.sources.Versioned]] table: each
    * micro-batch carries an `op` column (`upsert` / `delete`) and lands
    * as ONE atomic commit via
    * [[graft.sources.Versioned.applyChanges]] — copy-on-write for the
    * upserts, a merge-on-read tombstone for the deletes, published
    * together, so batch readers never see half a change batch. At
    * 100 TB this is the streaming-merge shape that works: the per-batch
    * write cost is O(touched files) + O(delete keys), never a table
    * rewrite, with `compact`/`compactSmall` as the periodic collapse.
    * Replay protection is [[versionedSink]]'s two-guard scheme
    * (commit-marker note + `_applied_` watermark) under the same
    * `streamId` contract. */
  def cdcSink(changes: DataFrame, tableDir: String, key: String,
      streamId: String = "cdc")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // the batch feeds several independent actions (emptiness, op
        // validation, applyChanges' preflight + both op splits) —
        // persist it once instead of re-reading the source per action
        val batch = batch0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // an unknown or NULL op must FAIL the batch, not silently
          // drop its rows — a typo'd producer would otherwise lose
          // changes (a bare !isin() is NULL for a null op and would
          // slip through the filter)
          val unknown = batch
            .filter(col("op").isNull ||
              !col("op").isin("upsert", "delete"))
            .select("op").distinct().collect()
            .map(r => Option(r.getString(0)).getOrElse("NULL"))
          require(unknown.isEmpty, s"cdcSink batch $batchId has " +
            s"unknown op values: ${unknown.mkString(", ")}")
          val note = s"stream=$streamId;batch=$batchId"
          val la = graft.sources.Versioned
            .lastApplied(spark, tableDir, streamId)
          val replay = la.exists(_ >= batchId) ||
            graft.sources.Versioned.noteRecorded(spark, tableDir, note,
              stopNote = la.map(b => s"stream=$streamId;batch=$b"))
          // A lost commit race (a concurrent compactSmall, another
          // writer) is re-run FROM SCRATCH: the losing attempt
          // published nothing, and re-invoking applyChanges recomputes
          // its touched-file provenance against the new current
          // snapshot — a fresh merge, never a stale replay. (The
          // library call itself surfaces the race: a CoW merge's
          // rewrite was computed against the superseded snapshot, so
          // retrying is the CALLER's decision; a streaming sink owns
          // its batches and must land them.) retryOnRace is the
          // library's bounded exponential-backoff-with-jitter loop —
          // the same policy its internal rebase-safe ops use, so two
          // herding committers de-synchronize instead of re-colliding.
          if (!replay) graft.sources.Versioned.retryOnRace() {
            graft.sources.Versioned.applyChanges(spark, tableDir,
              upserts = batch.filter(col("op") === "upsert").drop("op"),
              deleteKeys = batch.filter(col("op") === "delete"),
              key = key, note = Some(note))
          }
          graft.sources.Versioned.recordApplied(spark, tableDir,
            streamId, batchId)
        } finally batch.unpersist(blocking = false)
        ()
      }

  case class Ev(event_id: Long, user_id: Long, event_type: String,
      value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via
    * flatMapGroupsWithState — the escape hatch for stateful logic that
    * windowed aggregation can't express. */
  def runningUserTotals(spark: SparkSession,
      events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }
}
