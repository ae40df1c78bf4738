package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{assert_true, col, isnull, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.sources.Versioned

/** Spark-NATIVE streaming over a versioned table's changelog — the
  * `spark.readStream.format("graft-changes").load(tableDir)`
  * integration seam [[ChangeFeed]]'s poller deliberately left open:
  * the same `(fromVersion, toVersion]` ranges, but with SPARK owning
  * the trigger cadence, the offset checkpoint, and the restart
  * semantics (`Trigger.ProcessingTime`, `Trigger.AvailableNow`,
  * `foreachBatch`, checkpointed restarts — all of Structured
  * Streaming's machinery, none of it reimplemented).
  *
  * WHY the V1 `Source` API and not a DSv2 `MicroBatchStream`: a
  * changelog batch is a PLAN (per-version file scans, rename-chain
  * projection, tombstone anti-joins and key frames), and V1's
  * `getBatch(start, end): DataFrame` contract hands Spark exactly
  * that plan — the same reason snapshot reads are an analyzer
  * expansion ([[graft.plans.VersionedRelationRule]]). A DSv2
  * `PartitionReader` would force materializing the changelog rows
  * outside Spark's planner (a driver-side collect at data scale — the
  * one pattern this engine bans). V1 streaming sources are fully
  * supported engine surface (FileStreamSource ships on it).
  *
  * Offsets ARE versions: the checkpoint offset log records the table
  * version each batch ended at, so a restarted query resumes from the
  * exact committed version — each version range enters the offset log
  * exactly once (side-effect exactly-once additionally needs an
  * idempotent/transactional sink, Spark's standard `foreachBatch`
  * contract; [[graft.streaming.EventStreams.versionedSink]]'s replay
  * guard composes). A FRESH query anchors at the table's CURRENT
  * version (no history replay); pass `startingVersion` to backfill
  * from `(startingVersion - 1, …]` — i.e. that version's own changes
  * onward — and `maxVersionsPerTrigger` to drain a deep backfill as
  * bounded batches (at most that many commits per trigger) instead of
  * one giant first batch; like Delta's `maxFilesPerTrigger` the limit
  * is approximate across restarts (the first post-restart trigger is
  * unthrottled — a Source cannot read Spark's commit log, and a
  * guessed base below the committed position would read as
  * no-new-data forever). Vacuum retention must outlast the trigger lag:
  * [[Versioned.readChanges]] refuses expired ranges loudly rather
  * than skipping silently (restart the query with a fresh checkpoint
  * after a too-aggressive vacuum).
  *
  * Batches are O(changed files + tombstone keys) via
  * [[Versioned.readChanges]] — never a snapshot diff. */
final class ChangeStreamProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-changes"

  private def tableDir(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("table")).getOrElse(
      throw new IllegalArgumentException("graft-changes needs the " +
        "versioned table directory: .load(dir) or .option(\"path\", dir)"))

  /** `mode=changes` (default): the full changelog with the two
    * metadata columns. `mode=appends`: the table's OWN schema, insert
    * events only — the `spark.readStream.table("graft.db.t")` shape
    * (a stream of the table's new rows), where a delete/update event
    * FAILS the batch loudly unless `skipDeletes=true` skips the WHOLE
    * change commit, inserts included (the Delta `skipChangeCommits`
    * semantic — an upsert's post-image must not re-surface as a fresh
    * append; a consumer assuming append-only must opt into missing
    * those commits). A compact commit nets to zero changelog events,
    * so maintenance never disturbs an appends stream in either
    * setting. */
  private def mode(parameters: Map[String, String]): String = {
    val m = parameters.getOrElse("mode", "changes")
    require(m == "changes" || m == "appends",
      s"graft-changes mode must be 'changes' or 'appends', got '$m'")
    m
  }

  /** The stream schema: the table's columns, plus (in `changes` mode)
    * the two changelog metadata columns — exactly
    * [[Versioned.readChanges]]' output. */
  private def changeSchema(sqlContext: SQLContext,
      userSchema: Option[StructType], dir: String,
      m: String): StructType = {
    val spark = sqlContext.sparkSession
    val base = userSchema.getOrElse {
      require(graft.sources.Versioned.currentVersion(spark, dir) > 0,
        s"no committed version at $dir — create the table first, or " +
          "declare the TABLE schema with .schema(...) to start a " +
          "stream before the first commit")
      Versioned.read(spark, dir).schema
    }
    if (m == "appends") base
    else StructType(base.fields.toSeq :+
      StructField(Versioned.ChangeTypeCol, StringType) :+
      StructField(Versioned.CommitVersionCol, IntegerType,
        nullable = false))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), changeSchema(sqlContext, schema,
      tableDir(parameters), mode(parameters)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = tableDir(parameters)
    val m = mode(parameters)
    val out = changeSchema(sqlContext, schema, dir, m)
    // The anchor must be CHECKPOINT state, not a per-createSource
    // computation: Spark may write an offset to its WAL and crash
    // before the batch commits, then replay that batch as
    // getBatch(None, end) after restart — a re-captured anchor at the
    // then-current version would swallow the replayed range. Persist
    // the anchor under the engine-provided metadataPath on FIRST
    // creation and read it back ever after. Publish is
    // write-tmp-then-rename: the named file either does not exist or
    // holds complete content — a crash can never leave an
    // existing-but-empty anchor that poisons every later restart. A
    // lost rename race adopts the winner's value.
    val f = new Path(metadataPath)
      .getFileSystem(sqlContext.sparkSession.sessionState.newHadoopConf())
    val anchorFile = new Path(metadataPath, "graft-changes-anchor")
    def readAnchor(): Int = {
      val in = f.open(anchorFile)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt
      finally in.close()
    }
    val resumed = f.exists(anchorFile)
    val anchor =
      if (resumed) readAnchor()
      else {
        // anchor BEFORE the first trigger: a fresh query consumes
        // commits made after stream START, not after the first
        // trigger fired
        val a = parameters.get("startingVersion") match {
          case Some(v) =>
            require(v.trim.toInt >= 1,
              s"startingVersion must be >= 1, got $v")
            v.trim.toInt - 1 // (anchor, …] delivers that version on
          case None => math.max(0,
            Versioned.currentVersion(sqlContext.sparkSession, dir))
        }
        f.mkdirs(new Path(metadataPath))
        val tmp = new Path(metadataPath,
          s".graft-changes-anchor.tmp-${java.util.UUID.randomUUID()}")
        graft.sources.FsFast.put(f, tmp,
          a.toString.getBytes("UTF-8"), overwrite = false)
        if (f.rename(tmp, anchorFile)) a
        else { f.delete(tmp, false); readAnchor() }
      }
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.trim.toInt
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $v")
      n
    }
    new ChangeStreamSource(sqlContext, dir, out, anchor,
      appends = m == "appends",
      skipDeletes = parameters.getOrElse("skipDeletes", "false")
        .toBoolean,
      maxVersionsPerTrigger = maxPerTrigger,
      resumed = resumed)
  }
}

private final class ChangeStreamSource(sqlContext: SQLContext,
    dir: String, out: StructType, anchor: Int,
    appends: Boolean = false, skipDeletes: Boolean = false,
    maxVersionsPerTrigger: Option[Int] = None,
    resumed: Boolean = false)
    extends Source {
  private def spark = sqlContext.sparkSession
  private def ver(o: Offset): Int = o.json().trim.toInt
  // the engine's committed position as of the last getBatch — the base
  // the per-trigger version budget counts from. Spark calls
  // getOffset/getBatch from one stream-execution thread; @volatile
  // covers the restart path reading it from another. -1 = unknown
  // (a RESTARTED query before its first getBatch: the true base lives
  // in Spark's commit log, which a Source cannot read — the first
  // post-restart trigger goes unthrottled rather than risk reporting
  // an offset BELOW the committed position, which would read as
  // no-new-data forever; rate limits are approximate across restarts,
  // the Delta maxFilesPerTrigger contract).
  @volatile private var lastBatchEnd: Int = if (resumed) -1 else anchor

  // (mtime, version, firstSeenMs, trustable) of the last FULL probe.
  // `trustable` records that the probe ITSELF ran after the SAME
  // mtime had already been observed more than the stability window
  // earlier ON THE DRIVER CLOCK: only then can "mtime unchanged"
  // prove "no new commit" — M is truncated to filesystem granularity,
  // and once M's granularity tick has surely elapsed (both clocks
  // advance at the same rate, so a driver-measured wait bounds the
  // store-side tick without ever comparing the two clocks' OFFSETS —
  // an NFS/HDFS store skewed ahead of the driver can't fake
  // stability), any commit after such a probe stamps a time strictly
  // greater than M and must change the observed mtime. A probe taken
  // before its mtime re-observation window closed can share a
  // granularity tick with a commit that landed just after it (same
  // truncated M — the probe would never see it change) and is
  // therefore never trusted. `firstSeenMs` is the driver clock at the
  // first observation of this mtime, carried while it is unchanged.
  @volatile private var verMemo: (Long, Int, Long, Boolean) =
    (-1L, -1, 0L, false)

  override def schema: StructType = out

  // getOffset fires every trigger, and an idle sub-second-trigger
  // stream was paying one directory listing per tick; with the memo a
  // quiet table costs one stat call per tick. The mtime is statted
  // BEFORE the listing, so a commit racing the full probe invalidates
  // the next tick's comparison rather than hiding behind it. Stores
  // without meaningful directory mtimes (mtime <= 0, the S3A
  // synthetic-prefix shape) never memoize — degrade to the listing,
  // never a stale version held indefinitely.
  private def probeVersion(): Int = {
    val mtime = try {
      val p = new Path(dir)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(p).getModificationTime
    } catch { case _: Exception => -1L }
    val now = System.currentTimeMillis()
    val (m0, v0, seen0, trust) = verMemo
    if (trust && mtime > 0 && mtime == m0 && v0 >= 0) v0
    else {
      ChangeStreamSource.fullProbes.incrementAndGet()
      val v = Versioned.currentVersion(spark, dir)
      val sameM = mtime > 0 && mtime == m0
      // driver-observed stability: trust only a full probe that ran
      // with the same mtime first seen a stable window ago — never
      // `now - mtime`, which mixes the driver's clock with the
      // store's and breaks under skew
      verMemo = (mtime, v, if (sameM) seen0 else now,
        sameM && now - seen0 > ChangeStreamSource.MtimeStableMs)
      v
    }
  }

  override def getOffset: Option[Offset] = {
    // report the table's latest version PAST THE ANCHOR: the engine
    // owns the consumed-up-to state (its checkpointed offset), but
    // with startingVersion ahead of the table's current version an
    // unclamped report would commit offsets INSIDE the range the user
    // asked to skip, and later batches would deliver (cur, anchor].
    // Below the anchor there is nothing deliverable — report None.
    val cur = probeVersion()
    if (cur < 1 || cur <= anchor) return None
    // rate limit: cap each trigger at maxVersionsPerTrigger commits
    // past the last batch's end, so a deep backfill (startingVersion
    // far behind the head) drains as bounded batches instead of one
    // giant one. Base unknown (post-restart) = this trigger
    // unthrottled; see lastBatchEnd.
    val capped = maxVersionsPerTrigger match {
      case Some(n) if lastBatchEnd >= 0 =>
        math.min(cur, math.max(lastBatchEnd, anchor) + n)
      case _ => cur
    }
    if (capped <= anchor) None else Some(LongOffset(capped.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // clamp to the anchor: offsets recorded below it (a pre-clamp
    // checkpoint, or a WAL replay racing an anchor bump) must never
    // resurrect the skipped (offset, anchor] range
    val fromV = math.max(start.map(ver).getOrElse(anchor), anchor)
    val toV = ver(end)
    // the rate-limit base follows the engine's own batch progression
    // (WAL replays included)
    lastBatchEnd = math.max(lastBatchEnd, toV)
    // normalize to the declared schema (order + types): readChanges
    // unions per-channel frames, and the engine requires the batch
    // plan to line up column-for-column with the source schema
    val changes =
      if (fromV >= toV) None
      else Some(Versioned.readChanges(spark, dir, fromV, toV))
    // appends mode: the table's own rows, insert events only. A
    // delete/update event fails the batch loudly unless skipDeletes
    // opted in — the guard rides the row filter (an Or short-circuits
    // for insert rows and raises on the first change row), so it can
    // never be pruned away with an unused column. skipDeletes skips
    // the WHOLE change commit (the Delta skipChangeCommits semantic):
    // an upsert's post-image must not re-surface as a fresh append —
    // a consumer that already holds the key would silently
    // double-count it — so inserts anti-join against the range's
    // delete-carrying commit versions. A compact nets to zero events
    // and passes through both settings untouched.
    val frame = changes match {
      case None => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), out)
      case Some(c) if !appends => c
      case Some(c) =>
        val isInsert = col(Versioned.ChangeTypeCol) === "insert"
        if (skipDeletes) {
          val changeCommits = c.filter(!isInsert)
            .select(Versioned.CommitVersionCol).distinct()
          c.filter(isInsert).join(changeCommits,
            Seq(Versioned.CommitVersionCol), "left_anti")
        } else c.filter(isInsert ||
          isnull(assert_true(isInsert, lit(s"graft-changes[$dir] " +
            s"mode=appends hit a delete/update event in ($fromV, " +
            s"$toV] — consume mode=changes, or set skipDeletes=true " +
            "to skip change commits in an append-only view"))))
    }
    // normalize to the declared schema: a range whose only events are
    // equality-delete keys carries KEY columns only (the Iceberg
    // equality-delete contract) — the other table columns pad to NULL
    // here so every batch lines up column-for-column (appends mode
    // also drops the two changelog metadata columns here)
    val normalized = frame.select(out.fields.toSeq.map { f =>
      (if (frame.columns.contains(f.name)) col(f.name)
      else lit(null)).cast(f.dataType).as(f.name)
    }: _*)
    // the engine asserts getBatch frames carry isStreaming=true; the
    // bridge wraps the frame's own (lazy, distributed) physical plan
    org.apache.spark.sql.graft.SparkInternals.streamingFrame(
      normalized, out)
  }

  // vacuum retention is table policy, not stream state: nothing to
  // reclaim on offset commit (readChanges refuses expired ranges)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftChangeStream[$dir]"
}

private[graft] object ChangeStreamSource {
  /** How long a table root's mtime must have been stable before the
    * memoized version is trusted — comfortably past filesystem
    * timestamp granularity. */
  private[graft] val MtimeStableMs = 1000L
  /** Diagnostic: FULL version probes (directory listings) taken by
    * getOffset across all sources — lets tests assert idle triggers
    * cost O(1) listings, not one per tick. */
  private[graft] val fullProbes =
    new java.util.concurrent.atomic.AtomicLong(0L)
}
