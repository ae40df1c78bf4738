package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/time-travel table — the Spark-native emulation of the
  * Iceberg capability the reference's data model is built on
  * (csv_to_ice.py:58's createOrReplace publishes a new snapshot;
  * README.md:94's allow_moved_paths reads one): each commit writes an
  * immutable `v=N` directory, then publishes it with a `_commit_N` marker
  * file created atomically (`create(overwrite=false)`). Readers resolve
  * `max(N)` over the markers and scan an immutable snapshot.
  *
  * Commit protocol properties (mirrors Iceberg's optimistic metadata
  * commit):
  *  - the data write happens entirely before the publish point; a crash
  *    anywhere before the marker create leaves the table at version N
  *    with no partial state visible;
  *  - there is never a moment with no readable version (markers are only
  *    added, never deleted until vacuum);
  *  - two concurrent committers write private staging directories and
  *    race on the atomic rename to `v=N+1`; the loser fails cleanly
  *    before anything becomes visible — optimistic concurrency, the
  *    Iceberg behavior.
  *
  * Layout:  tableDir/_commit_1, _commit_2, ...  -> publish markers
  *          tableDir/v=1, v=2, ...              -> immutable parquet snapshots
  *          tableDir/.stage-v*-<uuid>           -> in-flight commit staging
  */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val MarkerPrefix = "_commit_"

  /** Age before an unpublished v=N directory counts as crash debris and
    * may be reclaimed by a committer (see [[commit]]). */
  val ReclaimGraceMs: Long = 60 * 1000L

  private def committedVersions(spark: SparkSession,
      tableDir: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val dir = new Path(tableDir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith(MarkerPrefix) =>
        s.stripPrefix(MarkerPrefix).toInt }
      .sorted
  }

  /** Current committed version, or 0 when the table doesn't exist. */
  def currentVersion(spark: SparkSession, tableDir: String): Int =
    committedVersions(spark, tableDir).lastOption.getOrElse(0)

  private def ownerToken(uuid: String) = s"_owner_$uuid"

  /** Commit a new snapshot: write the data (plus an `_owner_<uuid>`
    * token file) to a committer-private staging directory, claim the
    * version by renaming it to `v=N+1`, verify ownership via the token,
    * then publish with the `_commit_N+1` marker. Two committers racing
    * the same parent version collide at the claim: on filesystems whose
    * rename fails against an existing destination the loser's rename
    * returns false; on LocalFileSystem/HDFS — whose rename "succeeds"
    * by MOVING THE SOURCE INSIDE the existing destination — the loser
    * detects the nesting because its owner token is not at the
    * directory root, removes its nested copy, and fails cleanly. Either
    * way the loser never tears the winner's published files and the
    * table stays at N for it to retry. (The naive shared-v=N+1 write
    * this replaces let the loser clobber the winner's already-published
    * snapshot; the EtlSpec race test caught it.)
    *
    * `note` is recorded inside the marker at the commit point — an
    * atomic per-version annotation ([[commitNotes]]), used by the
    * streaming sink to make micro-batch replays idempotent.
    *
    * A committer that crashes after the rename but before the marker
    * leaves an unpublished `v=N+1` directory that blocks that version
    * slot; [[vacuum]] reclaims unpublished version directories (run it
    * as maintenance, not concurrently with writers). */
  def commit(df: DataFrame, tableDir: String,
      partitionCol: Option[String] = None,
      note: Option[String] = None): Int = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val next = currentVersion(spark, tableDir) + 1
    val uuid = java.util.UUID.randomUUID().toString
    val stage = new Path(tableDir, s".stage-v$next-$uuid")
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(stage.toString)
    f.create(new Path(stage, ownerToken(uuid)), false).close()
    val snapDir = new Path(tableDir, s"v=$next")
    def loserExit(cleanup: => Unit): Nothing = {
      cleanup
      throw new IllegalStateException(
        s"concurrent commit raced to version $next at $tableDir; " +
          "table unchanged, retry from the new current version")
    }
    val marker0 = new Path(tableDir, s"$MarkerPrefix$next")
    // Age of a pre-existing claim, captured BEFORE our rename attempt —
    // the attempt itself nests into the directory and refreshes its
    // modification time.
    val preClaimAge: Option[Long] =
      if (f.exists(snapDir)) Some(f.getFileStatus(snapDir).getModificationTime)
      else None
    // One ownership attempt. Handles both rename semantics: a
    // fails-on-existing-destination filesystem returns false (stage
    // intact); LocalFS/HDFS "succeed" by nesting the stage inside the
    // occupant — detected by the owner token missing from the root, and
    // the nested copy is pulled back out (or dropped if even that
    // fails). Never touches the occupant's files.
    def attempt(): Boolean = {
      if (!f.rename(stage, snapDir)) return false
      if (f.exists(new Path(snapDir, ownerToken(uuid)))) return true
      val nested = new Path(snapDir, stage.getName)
      if (!f.rename(nested, stage)) f.delete(nested, true)
      false
    }
    // Self-healing: an UNPUBLISHED v=N older than the grace period is a
    // committer that crashed between rename and marker — without
    // reclaim it wedges version N forever. A live committer publishes
    // its marker within microseconds of claiming, so the age gate keeps
    // the reclaim from racing one (the Iceberg orphan-cleanup pattern).
    // The age is read from the OCCUPANT'S OWNER TOKEN FILE, not the
    // directory: nest attempts refresh the directory's mtime (including
    // ours, and a racing committer's), but nobody touches the token —
    // so a fresh claim that replaced old debris after our first look is
    // correctly seen as live, never reclaimed. The directory pre-age is
    // only the fallback for tokenless (pre-protocol) debris.
    // The debris itself is claimed by atomically renaming it ASIDE: the
    // rename succeeds for exactly one reclaimer (the source vanishes
    // for the rest), so two committers can never both proceed to
    // re-claim the slot — and nobody ever deletes a directory another
    // committer may have just claimed.
    def staleDebris: Boolean = {
      if (f.exists(marker0)) return false
      val cutoff = System.currentTimeMillis() - ReclaimGraceMs
      // a concurrent reclaimer may rename the debris aside between any
      // two of these calls — treat a vanished directory as not-debris
      // (we then lose the claim race and exit as a clean loser)
      val tokens =
        try f.listStatus(snapDir).toSeq
          .filter(_.getPath.getName.startsWith("_owner_"))
        catch { case _: java.io.FileNotFoundException => return false }
      if (tokens.nonEmpty) tokens.map(_.getModificationTime).max < cutoff
      else preClaimAge.exists(_ < cutoff)
    }
    def reclaim(): Boolean = {
      val aside = new Path(tableDir, s".reclaim-v$next-$uuid")
      f.rename(snapDir, aside) && { f.delete(aside, true); true }
    }
    var owned = attempt()
    if (!owned && f.exists(stage) && staleDebris && reclaim())
      owned = attempt()
    if (!owned)
      loserExit(if (f.exists(stage)) f.delete(stage, true) else ())
    val out = f.create(marker0, /*overwrite=*/ false) // the commit point
    try note.foreach(n => out.write(n.getBytes("UTF-8"))) finally out.close()
    next
  }

  /** Per-version marker annotations (empty string when none). */
  def commitNotes(spark: SparkSession, tableDir: String): Map[Int, String] = {
    val f = fs(spark, tableDir)
    committedVersions(spark, tableDir).map { v =>
      val in = f.open(new Path(tableDir, s"$MarkerPrefix$v"))
      try v -> new String(in.readAllBytes(), "UTF-8") finally in.close()
    }.toMap
  }

  private val AppliedPrefix = "_applied_"

  private def checkStreamId(streamId: String): Unit =
    require(streamId.matches("[A-Za-z0-9_-]+"),
      s"streamId must be [A-Za-z0-9_-]+, got '$streamId'")

  /** Record that external stream `streamId` has applied its batch
    * `batchId` (a create-only watermark file; `=` separates the id from
    * the batch because `_` is legal INSIDE stream ids). Unlike the
    * in-marker note, these survive [[compact]] and [[vacuum]], so a
    * replayed batch is still detected after maintenance rewrote or
    * expired the commit that carried it. Batch ids are monotone per
    * stream, so only the newest watermark matters — older ones are
    * swept here, keeping the table at O(streams) watermark files.
    * Idempotent; real filesystem failures propagate (swallowing them
    * would silently strip the batch of its durable replay guard). */
  def recordApplied(spark: SparkSession, tableDir: String,
      streamId: String, batchId: Long): Unit = {
    checkStreamId(streamId)
    val f = fs(spark, tableDir)
    val p = new Path(tableDir, s"$AppliedPrefix$streamId=$batchId")
    if (!f.exists(p)) {
      try f.create(p, false).close()
      catch { case e: java.io.IOException =>
        if (!f.exists(p)) throw e } // concurrent duplicate create is fine
    }
    appliedIds(f, tableDir, streamId).filter(_ < batchId).foreach { old =>
      f.delete(new Path(tableDir, s"$AppliedPrefix$streamId=$old"), false)
    }
  }

  private def appliedIds(f: org.apache.hadoop.fs.FileSystem,
      tableDir: String, streamId: String): Seq[Long] = {
    val dir = new Path(tableDir)
    if (!f.exists(dir)) Nil
    else {
      val pre = s"$AppliedPrefix$streamId="
      f.listStatus(dir).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith(pre) =>
          s.stripPrefix(pre).toLong }
    }
  }

  /** Highest batch id recorded for `streamId`, if any. */
  def lastApplied(spark: SparkSession, tableDir: String,
      streamId: String): Option[Long] = {
    checkStreamId(streamId)
    val ids = appliedIds(fs(spark, tableDir), tableDir, streamId)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Read a snapshot: the current one, or any retained version (time
    * travel). */
  def read(spark: SparkSession, tableDir: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, tableDir))
    require(v > 0, s"no committed version at $tableDir")
    spark.read.parquet(new Path(tableDir, s"v=$v").toString)
  }

  /** All retained committed snapshot versions (ascending). */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] =
    committedVersions(spark, tableDir)

  /** APPEND as a new snapshot: the published version holds the previous
    * snapshot's rows plus `df` — Iceberg's append semantics, where every
    * snapshot is a consistent prefix of the ingested data and time
    * travel walks ingestion history. Copy-on-write here (the new
    * version rewrites the union); a manifest-based layout that links
    * the previous version's files instead of rewriting them is the
    * Iceberg-scale upgrade and would slot into this method without
    * changing its contract. */
  def append(df: DataFrame, tableDir: String,
      partitionCol: Option[String] = None,
      note: Option[String] = None): Int = {
    val spark = df.sparkSession
    if (currentVersion(spark, tableDir) == 0)
      commit(df, tableDir, partitionCol, note)
    else commit(
      read(spark, tableDir).unionByName(df, allowMissingColumns = true),
      tableDir, partitionCol, note)
  }

  /** Row-level MERGE (upsert) by key, copy-on-write: rows of the current
    * snapshot whose key appears in `updates` are replaced, new keys are
    * appended, and the result publishes as one atomic commit — the
    * Iceberg `MERGE INTO` analog. The anti-join keeps untouched rows
    * (one shuffle on the key; with the table and updates bucketed on the
    * key it is exchange-free, see Tables.writeBucketed); unionByName
    * tolerates updates that add columns (schema evolution, missing
    * columns null-fill). Pre-merge versions stay time-travelable. */
  def upsert(spark: SparkSession, tableDir: String, updates: DataFrame,
      key: String, partitionCol: Option[String] = None): Int = {
    // MERGE INTO semantics: multiple source rows per key is an error
    // (Iceberg/Delta reject it); silently appending both would break
    // the table's key-uniqueness invariant forever.
    val dup = updates.groupBy(org.apache.spark.sql.functions.col(key))
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .limit(1).count()
    require(dup == 0,
      s"upsert updates contain duplicate values of key '$key'")
    val cur = read(spark, tableDir)
    val merged = cur
      .join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    commit(merged, tableDir, partitionCol)
  }

  /** Row-level DELETE, copy-on-write: publish a new snapshot without the
    * rows matching `pred` — the Iceberg `DELETE FROM` analog. SQL
    * semantics: only rows where `pred` is TRUE are deleted; rows where
    * it evaluates NULL are kept (a bare `filter(!pred)` would silently
    * drop them too). */
  def delete(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      partitionCol: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    commit(read(spark, tableDir).filter(not(coalesce(pred, lit(false)))),
      tableDir, partitionCol)
  }

  /** Number of data files in a snapshot (maintenance introspection). */
  def dataFileCount(spark: SparkSession, tableDir: String,
      version: Option[Int] = None): Int = {
    val v = version.getOrElse(currentVersion(spark, tableDir))
    val f = fs(spark, tableDir)
    val it = f.listFiles(new Path(tableDir, s"v=$v"), /*recursive=*/ true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Small-file maintenance — the `rewrite_data_files` analog of the
    * Iceberg tables the reference builds on: rewrite the current
    * snapshot into ~`targetFileBytes`-sized files and publish the result
    * as a NEW commit through the same marker protocol. Readers never see
    * an in-progress rewrite, concurrent committers conflict cleanly on
    * the marker, and every pre-compaction version stays time-travelable
    * until [[vacuum]]. File count is sized from the snapshot's on-disk
    * bytes, so a drip-fed table of thousands of tiny files comes back as
    * a handful of scan-efficient ones. */
  def compact(spark: SparkSession, tableDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCol: Option[String] = None): Int = {
    val cur = currentVersion(spark, tableDir)
    require(cur > 0, s"no committed version at $tableDir")
    val bytes = fs(spark, tableDir)
      .getContentSummary(new Path(tableDir, s"v=$cur")).getLength
    val nFiles =
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    commit(read(spark, tableDir).repartition(nFiles), tableDir, partitionCol)
  }

  /** Expire old snapshots, keeping the most recent `keep` (the current
    * version is always retained). The marker is removed first so a crash
    * mid-vacuum never leaves a published-but-deleted version.
    *
    * Also reclaims commit debris: unpublished `v=K` directories (a
    * committer crashed between its rename and its marker — they block
    * version slot K) and orphaned `.stage-*` directories. Maintenance
    * only — do not run concurrently with active committers, whose
    * in-flight claims look identical to debris. */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 1): Unit = {
    val f = fs(spark, tableDir)
    if (!f.exists(new Path(tableDir))) return // never-committed table: no-op
    val cur = currentVersion(spark, tableDir)
    versions(spark, tableDir)
      .filter(v => v != cur)
      .dropRight(math.max(0, keep - 1))
      .foreach { v =>
        f.delete(new Path(tableDir, s"$MarkerPrefix$v"), false)
        f.delete(new Path(tableDir, s"v=$v"), true)
      }
    val published = committedVersions(spark, tableDir).toSet
    f.listStatus(new Path(tableDir)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(".stage-") || name.startsWith(".reclaim-"))
        f.delete(st.getPath, true) // incl. reclaimers that crashed mid-sweep
      else if (name.startsWith("v=") &&
        !published.contains(name.stripPrefix("v=").toInt))
        f.delete(st.getPath, true)
    }
  }
}
