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
  *  - two concurrent committers race on the same `_commit_N+1` marker and
  *    the loser's atomic create fails cleanly — optimistic concurrency,
  *    the Iceberg behavior.
  *
  * Layout:  tableDir/_commit_1, _commit_2, ...  -> publish markers
  *          tableDir/v=1, v=2, ...              -> immutable parquet snapshots
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

  /** Commit a new snapshot: write v=N+1, then publish it by atomically
    * creating the `_commit_N+1` marker. Fails (cleanly, with the table
    * still at N) if a concurrent committer published N+1 first. */
  def commit(df: DataFrame, tableDir: String,
      partitionCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val next = currentVersion(spark, tableDir) + 1
    val snapDir = new Path(tableDir, s"v=$next")
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(snapDir.toString)
    val marker = new Path(tableDir, s"$MarkerPrefix$next")
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
