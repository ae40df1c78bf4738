package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import java.util.concurrent.CountDownLatch

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Versioned

/** Incremental CONSUMPTION loop over a versioned table's changelog —
  * the read-side complement of [[EventStreams.cdcSink]] (which writes
  * changes in) and [[Versioned.readChanges]] (which diffs two pinned
  * versions): follow a table's commits and hand each new version
  * range to a handler as one change batch, with a checkpointed cursor
  * so a restarted feed resumes where it stopped.
  *
  * Delivery contract is AT-LEAST-ONCE, the `foreachBatch` discipline:
  * the cursor advances (a new monotonically numbered cursor file,
  * max-on-read — the cursor can never transiently disappear, even
  * mid-crash) only AFTER the handler returns, so
  * a crash mid-handler replays the same `(fromVersion, toVersion]`
  * range — handlers make that exactly-once by keying on `toVersion`
  * (the replay guard [[EventStreams.versionedSink]] demonstrates).
  * Each batch frame is [[Versioned.readChanges]]' output: inserted
  * rows, deleted rows, and tombstone keys tagged `_change_type` /
  * `_commit_version`, O(delta) in the versions consumed — never a
  * snapshot diff.
  *
  * Why a poller rather than a DSv2 `MicroBatchStream`: Spark's
  * streaming-scan contract hands back batches of ONE relation through
  * a `PartitionReader`, and a changelog batch is a PLAN (per-version
  * file scans, rename-chain projection, tombstone anti-joins and key
  * frames — the same reason snapshot READS are an analyzer expansion,
  * [[graft.plans.VersionedRelationRule]]). For SPARK-native triggers
  * and checkpoints over the same ranges, use [[ChangeStreamSource]]
  * (`spark.readStream.format("graft-changes")`) — a V1 `Source`,
  * whose `getBatch` contract accepts exactly such a plan; this poller
  * stays the engine-native, dependency-free path (cron maintenance,
  * non-Spark-streaming consumers, explicit cursor control). Vacuum
  * safety for both: retention must outlast feed lag
  * ([[Versioned.readChanges]] refuses expired ranges loudly rather
  * than skipping silently). */
object ChangeFeed {

  /** Running feed handle: [[stop]] drains the in-flight batch — it
    * blocks until the loop exits, and the loop is NEVER interrupted,
    * so a `pollOnce` that already started always finishes both the
    * handler and the cursor publish before the loop observes the stop
    * flag (an interrupt could land inside Hadoop I/O during the
    * cursor publish and abort the drain's final step, leaving the
    * just-delivered batch to replay — safe under at-least-once, but a
    * contract violation). The only thing stop() cuts short is the
    * BETWEEN-polls wait, via the wake latch. */
  final class Handle private[ChangeFeed] (
      stopFlag: AtomicReference[Boolean], wake: CountDownLatch,
      failure: AtomicReference[Option[Throwable]],
      stopped: CountDownLatch, poller: Thread) {
    def stop(): Unit = {
      stopFlag.set(true)
      wake.countDown() // wakes the inter-poll wait; never interrupts
      stopped.await()
      failure.get().foreach(e => throw e)
    }
    /** Bounded [[stop]] for a caller that cannot trust its handler to
      * return — the recourse the unbounded drain deliberately gives
      * up. Waits `timeoutMs` for the clean drain; past the deadline it
      * ESCALATES to an interrupt (which may land inside the handler or
      * the cursor publish — the just-delivered batch then replays on
      * restart: safe under the feed's at-least-once contract, but no
      * longer the drain guarantee) and waits the same bound again.
      * Returns true for a clean drain, false if it escalated; only a
      * clean drain rethrows a recorded handler failure — after an
      * interrupt the recorded failure is the interrupt itself, not a
      * signal worth throwing. A handler wedged in NON-interruptible
      * I/O can outlive even the escalation; the poller is a daemon
      * thread, so the JVM is never held hostage either way. */
    def stop(timeoutMs: Long): Boolean = {
      require(timeoutMs > 0, s"timeoutMs must be > 0, got $timeoutMs")
      stopFlag.set(true)
      wake.countDown()
      val clean = stopped.await(timeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      if (clean) failure.get().foreach(e => throw e)
      else {
        poller.interrupt()
        stopped.await(timeoutMs,
          java.util.concurrent.TimeUnit.MILLISECONDS)
      }
      clean
    }
    /** Surfaces a handler/engine failure without stopping. */
    def checkFailed(): Option[Throwable] = failure.get()
  }

  private val CursorPrefix = "_changefeed_cursor"

  /** The checkpointed cursor: the newest version already consumed
    * (0 = nothing yet). The cursor is the MAX over monotonically
    * numbered `_changefeed_cursor.v{N}` files — publishing a new one
    * never deletes-then-renames, so no crash window can make the
    * cursor transiently disappear (a vanished cursor would re-anchor
    * pollOnce at the current version and silently skip the unconsumed
    * range, violating at-least-once). Older files are garbage, pruned
    * best-effort AFTER the new cursor is durable. A bare
    * `_changefeed_cursor` file (the pre-numbered layout) still reads
    * for checkpoint compatibility. */
  def cursor(spark: SparkSession, checkpointDir: String): Int = {
    val dir = new Path(checkpointDir)
    val f = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(dir)) return 0
    f.listStatus(dir).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(CursorPrefix + ".v"))
        Try(n.stripPrefix(CursorPrefix + ".v").toInt).toOption
      else if (n == CursorPrefix) Try {
        val in = f.open(st.getPath)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt
        finally in.close()
      }.toOption
      else None
    }.foldLeft(0)(math.max)
  }

  private def writeCursor(spark: SparkSession, checkpointDir: String,
      v: Int): Unit = {
    val dir = new Path(checkpointDir)
    val f = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(dir)) f.mkdirs(dir)
    val target = new Path(checkpointDir, s"$CursorPrefix.v$v")
    val tmp = new Path(checkpointDir,
      s".$CursorPrefix.tmp-${java.util.UUID.randomUUID()}")
    graft.sources.FsFast.put(f, tmp,
      v.toString.getBytes("UTF-8"), overwrite = false)
    // rename-into-place: a reader never observes a torn cursor. The
    // target name embeds v, so a lost race means an identical file
    // already exists — drop the tmp and carry on.
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      if (!f.exists(target)) throw new IllegalStateException(
        s"cannot publish changefeed cursor at $checkpointDir")
    }
    // prune superseded cursors only now that v is durable; failures
    // here cost a stray file, never the cursor. The legacy bare file
    // is deleted only after READING it and confirming its value <= v
    // (mirroring the < v guard on numbered files) — a newer legacy
    // cursor racing a stale writer must not be pruned, or max-on-read
    // would move backwards and re-deliver consumed ranges
    Try {
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        val stale =
          if (n == CursorPrefix) Try {
            val in = f.open(st.getPath)
            try new String(in.readAllBytes(), "UTF-8").trim.toInt
            finally in.close()
          }.toOption.exists(_ <= v)
          else n.startsWith(CursorPrefix + ".v") &&
            Try(n.stripPrefix(CursorPrefix + ".v").toInt)
              .toOption.exists(_ < v)
        if (stale) f.delete(st.getPath, false)
      }
    }
  }

  /** Consume one pending range, if any: `(cursor, current]` → handler
    * → cursor advance. Returns the new cursor. This is the unit the
    * polling loop repeats; call it directly for a Trigger.AvailableNow
    * style drain. A FRESH feed (cursor 0) starts from the current
    * version WITHOUT replaying history — pass `fromVersion` to
    * [[cursor]]-seed a backfill explicitly. `maxVersions` caps one
    * call's range (the [[ChangeStreamSource]] `maxVersionsPerTrigger`
    * analog): a deep seeded backfill drains as bounded batches — each
    * with its own cursor advance, so a crash mid-backfill replays one
    * bounded range, not the whole history. */
  def pollOnce(spark: SparkSession, tableDir: String,
      checkpointDir: String, maxVersions: Int = Int.MaxValue)(
      handler: (DataFrame, Int, Int) => Unit): Int =
    pollOnceImpl(spark, tableDir, checkpointDir, maxVersions)(handler)._1

  /** (new cursor, whether the cap truncated the range — i.e. more is
    * pending RIGHT NOW without another listing). */
  private def pollOnceImpl(spark: SparkSession, tableDir: String,
      checkpointDir: String, maxVersions: Int)(
      handler: (DataFrame, Int, Int) => Unit): (Int, Boolean) = {
    require(maxVersions >= 1, s"maxVersions must be >= 1, got $maxVersions")
    val cur = Versioned.currentVersion(spark, tableDir)
    val from0 = cursor(spark, checkpointDir)
    if (from0 == 0) {
      // first contact: anchor at the current version (consumers that
      // want history seed the cursor first)
      if (cur > 0) writeCursor(spark, checkpointDir, cur)
      return (cur, false)
    }
    if (cur <= from0) return (from0, false)
    val to = math.min(cur, from0.toLong + maxVersions).toInt
    handler(Versioned.readChanges(spark, tableDir, from0, to),
      from0, to)
    writeCursor(spark, checkpointDir, to)
    (to, to < cur)
  }

  /** Seed the cursor (e.g. 1 to backfill everything after v1, or an
    * explicit resume point). Refuses to overwrite an existing cursor. */
  def seed(spark: SparkSession, checkpointDir: String,
      fromVersion: Int): Unit = {
    require(cursor(spark, checkpointDir) == 0,
      s"changefeed at $checkpointDir already has a cursor")
    require(fromVersion > 0, "seed needs a committed version")
    writeCursor(spark, checkpointDir, fromVersion)
  }

  /** Start the polling loop on a daemon thread. Handler failures are
    * recorded (see [[Handle.checkFailed]]) and the failed range is
    * retried next tick — at-least-once, never silently skipped.
    * The inter-poll wait is a latch await, not a sleep the stopper
    * interrupts: [[Handle.stop]] counts the latch down so shutdown is
    * immediate between polls, while a poll already in flight always
    * runs to completion (handler AND cursor publish). */
  def start(spark: SparkSession, tableDir: String,
      checkpointDir: String, pollIntervalMs: Long = 1000L,
      maxVersionsPerPoll: Int = Int.MaxValue)(
      handler: (DataFrame, Int, Int) => Unit): Handle = {
    // fail fast at the call site: inside the daemon loop this would
    // only surface through checkFailed()/stop() while the feed spins
    require(maxVersionsPerPoll >= 1,
      s"maxVersionsPerPoll must be >= 1, got $maxVersionsPerPoll")
    val stopFlag = new AtomicReference[Boolean](false)
    val failure = new AtomicReference[Option[Throwable]](None)
    val stopped = new CountDownLatch(1)
    val wake = new CountDownLatch(1)
    val t = new Thread(() => {
      try {
        while (!stopFlag.get()) {
          try {
            // drain while the cap is truncating, so a rate-limited
            // backfill needs no poll-interval waits between its
            // bounded ranges; an idle tick stays ONE poll
            var more = true
            while (more && !stopFlag.get()) {
              more = pollOnceImpl(spark, tableDir, checkpointDir,
                maxVersionsPerPoll)(handler)._2
            }
            failure.set(None)
          } catch {
            case e: Throwable => failure.set(Some(e))
          }
          wake.await(pollIntervalMs,
            java.util.concurrent.TimeUnit.MILLISECONDS)
        }
      } finally stopped.countDown()
    }, s"graft-changefeed-$tableDir")
    t.setDaemon(true)
    t.start()
    new Handle(stopFlag, wake, failure, stopped, t)
  }
}
