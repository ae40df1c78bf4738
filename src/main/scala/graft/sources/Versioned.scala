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

  /** Commit a new snapshot: write the data to a committer-private
    * staging directory, claim the version by atomically renaming it to
    * `v=N+1` (rename fails if the directory exists — two committers
    * racing the same parent version collide HERE, before anything is
    * visible), then publish with the `_commit_N+1` marker. The loser
    * fails cleanly with the table still at N and its staging directory
    * removed. Without the staging step, racing committers would both
    * write into the same v=N+1 path and the loser could tear the
    * winner's already-published files (caught by the EtlSpec race test).
    *
    * A committer that crashed after rename but before marker leaves an
    * unpublished v=N+1 directory; the next committer detects it (no
    * marker) and reclaims the version by replacing it. */
  def commit(df: DataFrame, tableDir: String,
      partitionCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val next = currentVersion(spark, tableDir) + 1
    val stage = new Path(tableDir,
      s".stage-v$next-${java.util.UUID.randomUUID()}")
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(stage.toString)
    val snapDir = new Path(tableDir, s"v=$next")
    val marker = new Path(tableDir, s"$MarkerPrefix$next")
    var claimed = f.rename(stage, snapDir)
    if (!claimed && !f.exists(marker) && f.exists(snapDir)) {
      // leftover of a committer that crashed pre-publish: reclaim
      f.delete(snapDir, true)
      claimed = f.rename(stage, snapDir)
    }
    if (!claimed) {
      f.delete(stage, true)
      throw new IllegalStateException(
        s"concurrent commit raced to version $next at $tableDir; " +
          "table unchanged, retry from the new current version")
    }
    f.create(marker, /*overwrite=*/ false).close() // the commit point
    next
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
      partitionCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    if (currentVersion(spark, tableDir) == 0) commit(df, tableDir, partitionCol)
    else commit(read(spark, tableDir).unionByName(df, allowMissingColumns = true),
      tableDir, partitionCol)
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
    val cur = read(spark, tableDir)
    val merged = cur
      .join(updates.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    commit(merged, tableDir, partitionCol)
  }

  /** Row-level DELETE, copy-on-write: publish a new snapshot without the
    * rows matching `pred` — the Iceberg `DELETE FROM` analog. */
  def delete(spark: SparkSession, tableDir: String,
      pred: org.apache.spark.sql.Column,
      partitionCol: Option[String] = None): Int =
    commit(read(spark, tableDir).filter(!pred), tableDir, partitionCol)

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
    * mid-vacuum never leaves a published-but-deleted version. */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 1): Unit = {
    val f = fs(spark, tableDir)
    val cur = currentVersion(spark, tableDir)
    versions(spark, tableDir)
      .filter(v => v != cur)
      .dropRight(math.max(0, keep - 1))
      .foreach { v =>
        f.delete(new Path(tableDir, s"$MarkerPrefix$v"), false)
        f.delete(new Path(tableDir, s"v=$v"), true)
      }
  }
}
