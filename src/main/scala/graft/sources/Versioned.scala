package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/time-travel table — the Spark-native emulation of the
  * Iceberg capability the reference's data model is built on
  * (csv_to_ice.py:58's createOrReplace publishes a new snapshot;
  * README.md:94's allow_moved_paths reads one): each commit writes an
  * immutable `v=N` directory, then atomically swaps a `_VERSION` pointer
  * file (write-temp + rename). Readers resolve the pointer once and scan
  * an immutable snapshot — concurrent commits never disturb a running
  * read, which is the demo's observable atomicity property.
  *
  * Layout:  tableDir/_VERSION        -> "N"
  *          tableDir/v=1, v=2, ...   -> immutable parquet snapshots
  */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_VERSION")

  /** Current committed version, or 0 when the table doesn't exist. */
  def currentVersion(spark: SparkSession, tableDir: String): Int = {
    val f = fs(spark, tableDir)
    val p = pointer(tableDir)
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** Commit a new snapshot: write v=N+1, then atomically advance the
    * pointer. The data write happens entirely before the commit point;
    * a failure before the rename leaves the table at version N. */
  def commit(df: DataFrame, tableDir: String,
      partitionCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    val f = fs(spark, tableDir)
    val next = currentVersion(spark, tableDir) + 1
    val snapDir = new Path(tableDir, s"v=$next")
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(snapDir.toString)
    val tmp = new Path(tableDir, s"_VERSION.tmp-$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(pointer(tableDir))) f.delete(pointer(tableDir), false)
    f.rename(tmp, pointer(tableDir)) // the commit point
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

  /** All retained snapshot versions (ascending). */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val dir = new Path(tableDir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .sorted
  }

  /** Expire old snapshots, keeping the most recent `keep` (the current
    * version is always retained). */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 1): Unit = {
    val f = fs(spark, tableDir)
    val cur = currentVersion(spark, tableDir)
    versions(spark, tableDir)
      .filter(v => v != cur)
      .dropRight(math.max(0, keep - 1))
      .foreach(v => f.delete(new Path(tableDir, s"v=$v"), true))
  }
}
