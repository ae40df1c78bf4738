package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch,
  TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.sources.{DerivedTable, Versioned}

/** CONTINUOUS materialized-view maintenance — the follow loop that
  * makes a view track its source without manual refresh calls:
  * `follow(view)` polls and runs [[DerivedTable.refreshMv]] with
  * cascade (so chained bronze→silver→gold views converge through one
  * follower on the gold), a no-op tick costing a few metadata probes.
  *
  * There is deliberately NO checkpoint directory: the view's `src=vN`
  * pin IS the cursor, and it advances atomically WITH the refreshed
  * data in one commit — so delivery is EXACTLY-ONCE through any
  * crash/restart by the pin protocol itself (a replayed tick sees the
  * pin already at the head and no-ops; a crash between source commit
  * and refresh just means the next tick picks the range up). This is
  * the property the at-least-once [[ChangeFeed]] has to delegate to
  * its handlers; the MV refresh machinery carries it natively.
  *
  * The loop discipline mirrors [[ChangeFeed.start]]: daemon thread,
  * never interrupted, stop() drains the in-flight refresh, failures
  * are recorded and retried next tick (a stale-source refusal or a
  * transient I/O error must not kill the follower). */
object MvFollower {

  /** Running follower: [[stop]] drains the in-flight refresh and
    * rethrows a recorded failure; [[checkFailed]] surfaces one
    * without stopping. */
  final class Handle private[MvFollower] (
      stopFlag: AtomicReference[Boolean], wake: CountDownLatch,
      failure: AtomicReference[Option[Throwable]],
      stopped: CountDownLatch) {
    def stop(): Unit = {
      stopFlag.set(true)
      wake.countDown()
      stopped.await()
      failure.get().foreach(e => throw e)
    }
    def checkFailed(): Option[Throwable] = failure.get()
  }

  // one follower per view dir per JVM — the SQL spellings
  // (follow_mv / unfollow_mv) address followers by the view they
  // maintain, and two loops on one view would only race no-ops
  private val running = new ConcurrentHashMap[String, Handle]()

  /** Start following: every tick refreshes the view (with cascade —
    * upstream MVs first) when any lineage leg lags. Refuses a second
    * follower on the same view. */
  def follow(s: SparkSession, dstDir: String,
      pollIntervalMs: Long = 1000L): Handle =
    followWith(s, dstDir, pollIntervalMs,
      () => DerivedTable.refreshMv(s, dstDir, cascade = true))

  /** [[follow]] with an injectable tick body — the test seam for the
    * fatal-error contract (a real fatal is not injectable through the
    * refresh path). Package-private; the public surface is
    * [[follow]]. */
  private[graft] def followWith(s: SparkSession, dstDir: String,
      pollIntervalMs: Long, tick: () => Unit): Handle = {
    require(pollIntervalMs > 0,
      s"pollIntervalMs must be > 0, got $pollIntervalMs")
    // fail fast at the call site: not-an-MV must refuse HERE, not as
    // a recorded failure the caller has to poll for
    require(Versioned.properties(s, dstDir)
        .contains(DerivedTable.MvKindProp),
      s"$dstDir is not a materialized view — CREATE MATERIALIZED " +
        "VIEW first, or pass the view (not the source) table")
    val stopFlag = new AtomicReference[Boolean](false)
    val failure = new AtomicReference[Option[Throwable]](None)
    val stopped = new CountDownLatch(1)
    val wake = new CountDownLatch(1)
    val h = new Handle(stopFlag, wake, failure, stopped)
    val prev = running.putIfAbsent(dstDir, h)
    require(prev == null,
      s"a follower is already running on $dstDir — unfollow first")
    val t = new Thread(() => {
      try {
        while (!stopFlag.get()) {
          try {
            // refreshMv no-ops at two metadata probes per source when
            // every pin matches its head — the idle tick is cheap and
            // the pin commit is the exactly-once guarantee
            tick()
            failure.set(None)
          } catch {
            // a RETRYABLE failure (stale-source refusal, transient
            // I/O) is recorded and retried next tick; a FATAL error
            // (OOM, linkage) kills the daemon — spinning a broken
            // loop at poll interval would only repeat it while
            // looking alive. The failure stays recorded either way,
            // so checkFailed()/following() surface which happened.
            case e: Throwable =>
              failure.set(Some(e))
              if (!scala.util.control.NonFatal(e)) throw e
          }
          wake.await(pollIntervalMs, TimeUnit.MILLISECONDS)
        }
      } finally {
        running.remove(dstDir, h)
        stopped.countDown()
      }
    }, s"graft-mv-follower-$dstDir")
    t.setDaemon(true)
    t.start()
    h
  }

  /** Arm a follower on `dstDir` if none is running — the idempotent
    * spelling the DURABLE-follow re-arm path uses (a concurrent arm
    * losing the race is fine, not an error). Returns whether THIS
    * call started one. */
  def ensureFollowing(s: SparkSession, dstDir: String,
      pollIntervalMs: Long): Boolean =
    if (running.containsKey(dstDir)) false
    else try { follow(s, dstDir, pollIntervalMs); true }
    catch { case e: IllegalArgumentException
        if e.getMessage.contains("already running") => false }

  /** Stop the follower on `dstDir`, draining its in-flight refresh.
    * Returns false when none was running. */
  def unfollow(dstDir: String): Boolean =
    Option(running.get(dstDir)) match {
      case Some(h) => h.stop(); true
      case None => false
    }

  /** View dirs with a live follower in this JVM. */
  def following(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    running.keySet().asScala.toSeq.sorted
  }
}
