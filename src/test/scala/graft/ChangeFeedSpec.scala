package graft

import org.apache.spark.sql.functions._
import graft.sources.Versioned
import graft.streaming.ChangeFeed

/** Checkpointed changelog consumption ([[graft.streaming.ChangeFeed]]):
  * cursor anchoring/seeding, at-least-once delivery, O(delta) batches. */
class ChangeFeedSpec extends SparkSpec {
  private val work = "target/tmp/changefeed-spec"

  private def fresh(name: String): (String, String) = {
    val t = s"$work/$name"
    val c = s"$work/$name-ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(c))
    (t, c)
  }

  test("pollOnce anchors fresh feeds, then delivers exact ranges") {
    import spark.implicits._
    val (t, c) = fresh("anchor")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    var batches = List.empty[(Int, Int, Long, Long)]
    def handle(df: org.apache.spark.sql.DataFrame, from: Int,
        to: Int): Unit = {
      val n = df.filter(col(Versioned.ChangeTypeCol) === "insert").count()
      val d = df.filter(col(Versioned.ChangeTypeCol) === "delete").count()
      batches = batches :+ ((from, to, n, d))
    }
    // first contact: anchors at current, no replay
    assert(ChangeFeed.pollOnce(spark, t, c)(handle) == 1)
    assert(batches.isEmpty)
    // nothing new -> no batch, cursor stays
    assert(ChangeFeed.pollOnce(spark, t, c)(handle) == 1)
    assert(batches.isEmpty)
    // two commits -> ONE batch covering both versions
    Versioned.append(Seq((2, "b")).toDF("id", "v"), t)
    Versioned.applyChanges(spark, t,
      upserts = Seq((3, "c")).toDF("id", "v"),
      deleteKeys = Seq(Tuple1(1)).toDF("id"), key = "id")
    assert(ChangeFeed.pollOnce(spark, t, c)(handle) == 3)
    assert(batches.map(b => (b._1, b._2)) == List((1, 3)))
    val (_, _, ins, del) = batches.head
    assert(ins >= 2 && del >= 1) // rows 2,3 inserted; key 1 deleted
  }

  test("a failed handler leaves the cursor so the range replays") {
    import spark.implicits._
    val (t, c) = fresh("replay")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    ChangeFeed.pollOnce(spark, t, c)((_, _, _) => ())
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    intercept[RuntimeException] {
      ChangeFeed.pollOnce(spark, t, c)((_, _, _) =>
        throw new RuntimeException("boom"))
    }
    assert(ChangeFeed.cursor(spark, c) == 1) // NOT advanced
    var seen = 0L
    ChangeFeed.pollOnce(spark, t, c)((df, _, _) => seen = df.count())
    assert(seen == 1L && ChangeFeed.cursor(spark, c) == 2)
  }

  test("maxVersions caps each poll; batched cursor advances bound replay") {
    import spark.implicits._
    val (t, c) = fresh("ratelimit")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    (2 to 7).foreach(i => Versioned.append(Seq(Tuple1(i)).toDF("x"), t))
    ChangeFeed.seed(spark, c, fromVersion = 1) // (1, 7] pending
    var batches = List.empty[(Int, Int)]
    def drainOnce() = ChangeFeed.pollOnce(spark, t, c, maxVersions = 2) {
      (_, from, to) => batches = batches :+ ((from, to))
    }
    // each call advances the cursor by at most 2 versions, with its
    // own durable cursor write — a crash between calls replays at
    // most one bounded range
    assert(drainOnce() == 3 && ChangeFeed.cursor(spark, c) == 3)
    assert(drainOnce() == 5 && ChangeFeed.cursor(spark, c) == 5)
    assert(drainOnce() == 7)
    assert(batches == List((1, 3), (3, 5), (5, 7)))
    // drained: a further capped poll is a no-op
    assert(drainOnce() == 7 && batches.size == 3)
    // the polling loop drains a capped backlog without waiting a poll
    // interval per range
    val (t2, c2) = fresh("ratelimit-loop")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t2)
    (2 to 7).foreach(i => Versioned.append(Seq(Tuple1(i)).toDF("x"), t2))
    ChangeFeed.seed(spark, c2, fromVersion = 1)
    val total = new java.util.concurrent.atomic.AtomicLong()
    val h = ChangeFeed.start(spark, t2, c2, pollIntervalMs = 60000L,
      maxVersionsPerPoll = 2) { (df, from, to) =>
      assert(to - from <= 2)
      total.addAndGet(df.count()); ()
    }
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (total.get() < 6 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(total.get() == 6, s"expected the full backfill, saw $total")
    } finally h.stop()
    assert(ChangeFeed.cursor(spark, c2) == 7)
  }

  test("stop() mid-batch drains: handler finishes AND cursor advances") {
    import spark.implicits._
    val (t, c) = fresh("drain")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    ChangeFeed.seed(spark, c, fromVersion = 1) // (1, 2] pending
    val entered = new java.util.concurrent.CountDownLatch(1)
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val h = ChangeFeed.start(spark, t, c, pollIntervalMs = 60000L) {
      (df, _, _) =>
        entered.countDown()
        df.count() // real work while stop() is racing us
        Thread.sleep(500) // widen the window stop() must NOT cut short
        finished.set(true)
    }
    assert(entered.await(20, java.util.concurrent.TimeUnit.SECONDS))
    h.stop() // called while the handler is mid-batch
    // the drain contract: the in-flight handler ran to completion and
    // its cursor publish happened before stop() returned
    assert(finished.get(), "stop() cut the in-flight handler short")
    assert(ChangeFeed.cursor(spark, c) == 2,
      "stop() aborted the in-flight batch's cursor publish")
  }

  test("stop(timeoutMs) escalates past a wedged handler; clean drains " +
      "return true") {
    import spark.implicits._
    // clean case: an idle feed drains immediately, reports true
    val (t1, c1) = fresh("bounded-clean")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t1)
    val h1 = ChangeFeed.start(spark, t1, c1, pollIntervalMs = 60000L) {
      (df, _, _) => df.count(); ()
    }
    Thread.sleep(300) // let the first poll drain
    assert(h1.stop(10000L), "an idle feed must drain cleanly in bound")
    // wedged case: a handler that never returns on its own — the very
    // case the unbounded drain gives no recourse for. The bounded stop
    // must come back within ~its two timeout windows, having
    // interrupted the poller, and report the escalation.
    val (t2, c2) = fresh("bounded-wedge")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t2)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t2)
    ChangeFeed.seed(spark, c2, fromVersion = 1) // (1, 2] pending
    val entered = new java.util.concurrent.CountDownLatch(1)
    val h2 = ChangeFeed.start(spark, t2, c2, pollIntervalMs = 60000L) {
      (_, _, _) =>
        entered.countDown()
        Thread.sleep(3600L * 1000) // wedged (interruptible) I/O stand-in
    }
    assert(entered.await(20, java.util.concurrent.TimeUnit.SECONDS))
    val t0 = System.currentTimeMillis()
    val clean = h2.stop(1000L)
    val took = System.currentTimeMillis() - t0
    assert(!clean, "a wedged handler cannot be a clean drain")
    assert(took < 30000L, s"bounded stop must not hang (took ${took}ms)")
    // the wedged batch never published its cursor — it replays on
    // restart, the at-least-once contract the escalation documents
    assert(ChangeFeed.cursor(spark, c2) == 1)
  }

  test("seeding backfills history; the polling loop follows commits") {
    import spark.implicits._
    val (t, c) = fresh("loop")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    ChangeFeed.seed(spark, c, fromVersion = 1)
    intercept[IllegalArgumentException] {
      ChangeFeed.seed(spark, c, 1) // no silent cursor overwrite
    }
    val total = new java.util.concurrent.atomic.AtomicLong()
    val h = ChangeFeed.start(spark, t, c, pollIntervalMs = 50L) {
      (df, _, _) => total.addAndGet(
        df.filter(col(Versioned.ChangeTypeCol) === "insert").count())
      ()
    }
    try {
      // the seeded backfill (v2's row) arrives, then a live commit
      Versioned.append(Seq(Tuple1(3)).toDF("x"), t)
      val deadline = System.currentTimeMillis() + 20000
      while (total.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(total.get() == 2, s"expected 2 inserted rows, saw $total")
      assert(h.checkFailed().isEmpty)
    } finally h.stop()
    assert(ChangeFeed.cursor(spark, c) == 3)
  }

  test("follow_mv: the view converges on source commits without " +
      "manual refreshes, exactly-once through a restart, and the " +
      "SQL spellings manage the follower") {
    import spark.implicits._
    val (src0, _) = fresh("follow-src")
    val src = new java.io.File(src0).getAbsolutePath
    val dst = s"$work/follow-dst"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst))
    val dstAbs = new java.io.File(dst).getAbsolutePath
    Versioned.commit((1L to 30L).map(i => (i, s"g${i % 3}", i))
      .toDF("id", "g", "v"), src)
    // an AGGREGATE view is the honest exactly-once probe: a replayed
    // (at-least-once) patch would corrupt the sums, so recompute
    // equality proves each range applied exactly once
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$dstAbs` ROW KEY " +
      s"(id) AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v, " +
      s"count(*) AS n_rows FROM graft.`$src` GROUP BY g")
    def expect = spark.sql(s"SELECT g, sum(v) AS sum_v, count(v) " +
      s"AS cnt_v, count(*) AS n_rows FROM graft.`$src` GROUP BY g")
    def converged(deadlineMs: Long = 20000): Boolean = {
      val stop = System.currentTimeMillis + deadlineMs
      var ok = false
      while (!ok && System.currentTimeMillis < stop) {
        ok = graft.sources.DerivedTable
          .refreshState(spark, dstAbs).exists(_._3 == 0)
        if (!ok) Thread.sleep(100)
      }
      ok
    }
    // SQL spelling starts the follower; source commits land and the
    // view converges with NO manual refresh call
    val f = spark.sql(s"CALL graft.system.follow_mv('$dstAbs', " +
      "poll_interval_ms => 100)").head()
    assert(f.getString(0) == dstAbs)
    Versioned.append((31L to 40L).map(i => (i, "gX", i * 100L))
      .toDF("id", "g", "v"), src)
    assert(converged(), "follower did not converge on the append")
    assert(graft.sources.DerivedTable.bagEqual(
      Versioned.read(spark, dstAbs), expect))
    // duplicate followers refuse; unfollow drains and reports
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.follow_mv('$dstAbs')"))
    assert(e.getMessage.contains("already running"))
    assert(spark.sql(s"CALL graft.system.unfollow_mv('$dstAbs')")
      .head().getBoolean(0))
    // while NO follower runs, more source commits pile up…
    Versioned.applyChanges(spark, src,
      upserts = Seq((1L, "gX", 9999L)).toDF("id", "g", "v"),
      deleteKeys = Seq(30L).toDF("id"), key = "id")
    Versioned.append(Seq((41L, "g1", 7L)).toDF("id", "g", "v"), src)
    // …and a RESTARTED follower resumes from the view's own pin (no
    // checkpoint to restore) and applies the missed ranges exactly
    // once: the algebraic sums match the recompute, which a replay
    // or a skip would both break
    val h = graft.streaming.MvFollower.follow(spark, dstAbs, 100L)
    try {
      assert(converged(), "restarted follower did not converge")
      assert(graft.sources.DerivedTable.bagEqual(
        Versioned.read(spark, dstAbs), expect))
    } finally h.stop()
    assert(!graft.streaming.MvFollower.unfollow(dstAbs))
    // a follower on a plain table refuses at the call site
    val e2 = intercept[Exception](spark.sql(
      s"CALL graft.system.follow_mv('$src')"))
    assert(e2.getMessage.contains("not a materialized view"))
  }

  test("durable follow: the interval persists in the view's " +
      "properties, a crashed follower re-arms at the next catalog " +
      "read with NO follow_mv call, and unfollow_mv ends it durably") {
    import spark.implicits._
    val src = new java.io.File(s"$work/dur-src").getAbsolutePath
    val dst = new java.io.File(s"$work/dur-dst").getAbsolutePath
    Seq(src, dst).foreach(d => org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    Versioned.commit((1L to 20L).map(i => (i, s"g${i % 2}", i))
      .toDF("id", "g", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$dst` ROW KEY (id) " +
      s"AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v, count(*) " +
      s"AS n_rows FROM graft.`$src` GROUP BY g")
    spark.sql(s"CALL graft.system.follow_mv('$dst', " +
      "poll_interval_ms => 100)")
    assert(Versioned.properties(spark, dst)
      .get(graft.sources.DerivedTable.MvFollowProp).contains("100"))
    // CRASH the follower (stop without unfollow_mv — the durable
    // property stays) while commits pile up
    assert(graft.streaming.MvFollower.unfollow(dst))
    Versioned.append(Seq((21L, "gX", 777L)).toDF("id", "g", "v"), src)
    assert(!graft.streaming.MvFollower.following().contains(dst))
    // the "restarted session": the first catalog read of the view
    // re-arms the follower from the persisted spec — no follow call
    spark.sql(s"SELECT count(*) FROM graft.`$dst`").collect()
    val stop = System.currentTimeMillis + 20000
    var ok = false
    while (!ok && System.currentTimeMillis < stop) {
      ok = graft.sources.DerivedTable.refreshState(spark, dst)
        .exists(_._3 == 0) &&
        spark.sql(s"SELECT sum(n_rows) FROM graft.`$dst`")
          .head().getLong(0) == 21L
      if (!ok) Thread.sleep(100)
    }
    assert(ok, "re-armed follower did not converge")
    assert(graft.streaming.MvFollower.following().contains(dst))
    // unfollow_mv unsets the property — later reads re-arm nothing
    assert(spark.sql(s"CALL graft.system.unfollow_mv('$dst')")
      .head().getBoolean(0))
    assert(!Versioned.properties(spark, dst)
      .contains(graft.sources.DerivedTable.MvFollowProp))
    spark.sql(s"SELECT count(*) FROM graft.`$dst`").collect()
    Thread.sleep(300)
    assert(!graft.streaming.MvFollower.following().contains(dst))
  }

  test("an idle refresh tick on a fresh chain reads no properties " +
      "(memoized fast path), and a fatal tick error kills the " +
      "follower instead of spinning") {
    import spark.implicits._
    val src = new java.io.File(s"$work/idle-src").getAbsolutePath
    val silver = new java.io.File(s"$work/idle-silver").getAbsolutePath
    val gold = new java.io.File(s"$work/idle-gold").getAbsolutePath
    Seq(src, silver, gold).foreach(d => org.apache.commons.io
      .FileUtils.deleteQuietly(new java.io.File(d)))
    Versioned.commit((1L to 20L).map(i => (i, s"g${i % 2}", i))
      .toDF("id", "g", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$silver` KEY (id) " +
      s"AS SELECT id, g, v * 2 AS w FROM graft.`$src`")
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$gold` ROW KEY (id) " +
      s"AS SELECT g, sum(w) AS sum_w, count(w) AS cnt_w, count(*) " +
      s"AS n_rows FROM graft.`$silver` GROUP BY g")
    // warm: the first idle tick fills the memo (one properties read
    // per lineage dir), the second is fully warm
    graft.sources.DerivedTable.refreshMv(spark, gold, cascade = true)
    graft.sources.DerivedTable.refreshMv(spark, gold, cascade = true)
    val before = Versioned.propReads.get()
    val r = graft.sources.DerivedTable
      .refreshMv(spark, gold, cascade = true)
    assert(r._1 == "agg" && r._2 == r._3)
    assert(Versioned.propReads.get() == before,
      s"idle cascade tick read properties " +
        s"${Versioned.propReads.get() - before} time(s)")
    // a stale chain still refreshes through the fast path's
    // fall-through — a source commit propagates to the gold
    Versioned.append(Seq((21L, "g1", 21L)).toDF("id", "g", "v"), src)
    graft.sources.DerivedTable.refreshMv(spark, gold, cascade = true)
    assert(graft.sources.DerivedTable.bagEqual(
      Versioned.read(spark, gold),
      spark.sql(s"SELECT g, sum(v * 2) AS sum_w, count(v * 2) AS " +
        s"cnt_w, count(*) AS n_rows FROM graft.`$src` GROUP BY g")))
    // FATAL tick error: the daemon dies (retrying an OOM/linkage
    // error at poll interval only repeats it) and the failure
    // surfaces through checkFailed — NonFatal errors keep retrying
    // (covered by the convergence test's stale-refusal ticks)
    val fatal = new NoClassDefFoundError("injected-fatal")
    val h = graft.streaming.MvFollower.followWith(spark, gold, 50L,
      () => throw fatal)
    val stop = System.currentTimeMillis + 10000
    while (graft.streaming.MvFollower.following().contains(gold) &&
        System.currentTimeMillis < stop) Thread.sleep(50)
    assert(!graft.streaming.MvFollower.following().contains(gold),
      "fatal tick error did not kill the follower")
    assert(h.checkFailed().exists(_ eq fatal))
  }
}
