package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** ETL pipeline — Spark-native re-expression of the reference's ingest job
  * (reference scripts/csv_to_ice.py, the repo's only data-processing
  * code): CSV glob scan with header + schema inference (:17), explicit
  * column casts (:19-22), a derived date partition column (:25), a global
  * sort (:27), and a partitioned create-or-replace table write (:58).
  *
  * The Iceberg snapshot commit becomes a staged-directory atomic swap
  * (SURVEY.md §7.2): readers never observe a half-written table, which is
  * the observable property the demo's two query engines rely on.
  */
object Etl {

  /** Declarative ingest spec (the csv_to_ice.py transform chain). */
  case class IngestSpec(
      casts: Map[String, DataType] = Map.empty,
      deriveDate: Option[(String, String)] = None, // (tsCol, newCol)
      sortCols: Seq[String] = Nil,
      partitionCol: Option[String] = None)

  /** S1 — CSV scan with header + inferSchema (csv_to_ice.py:17). Schema
    * inference costs one extra pass; production paths should pin an
    * explicit StructType (SURVEY.md §7.4 risk 3). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)

  /** P1+P2+O1 — casts, derived yyyy-MM-dd date string, global sort.
    * The sort is a range-partition shuffle; it exists (as in the
    * reference) to cluster rows so the partitioned writer emits one file
    * per partition value per task instead of |tasks| x |values| files. */
  def transform(df: DataFrame, spec: IngestSpec): DataFrame = {
    val casted = spec.casts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
    val derived = spec.deriveDate match {
      case Some((src, dst)) =>
        casted.withColumn(dst, date_format(col(src), "yyyy-MM-dd"))
      case None => casted
    }
    if (spec.sortCols.nonEmpty)
      derived.sort(spec.sortCols.map(col): _*)
    else derived
  }

  /** S3+S4 — partitioned create-or-replace write with staged swap
    * (csv_to_ice.py:58 `createOrReplace()`): write to a staging dir,
    * then swap it in; the destination is either the old table or the new
    * one, never a mix.
    *
    * Caveat — the swap is staged, not atomic: a plain filesystem has no
    * atomic directory exchange, so between the two renames `tableDir`
    * briefly does not exist (a concurrent reader would fail to resolve
    * the path; a crash in the window leaves the data intact under
    * `tableDir.old` but requires a manual rename back). Readers that need
    * a no-gap guarantee should use [[Versioned]], whose marker-file
    * commit never unpublishes the previous snapshot. */
  def createOrReplace(df: DataFrame, tableDir: String,
      partitionCol: Option[String]): Unit = {
    val spark = df.sparkSession
    val dest = new Path(tableDir)
    val staging = new Path(tableDir + ".staging")
    val old = new Path(tableDir + ".old")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(staging.toString)
    fs.delete(old, true)
    if (fs.exists(dest)) fs.rename(dest, old)
    fs.rename(staging, dest)
    fs.delete(old, true)
  }

  /** Full pipeline: CSV -> transform -> partitioned table. */
  def ingestCsv(spark: SparkSession, csvPath: String, tableDir: String,
      spec: IngestSpec): Unit =
    createOrReplace(transform(readCsv(spark, csvPath), spec), tableDir,
      spec.partitionCol)

  /** S5 — table scan over the written layout; partition pruning on the
    * derived date column comes from the directory structure. */
  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)
}
