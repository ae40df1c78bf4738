package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional file-skip
  * layout behind Iceberg's `rewrite_data_files(strategy => 'sort',
  * sort_order => 'zorder(...)')` maintenance. A single-column sort
  * gives parquet row-group min/max stats that prune scans on THAT
  * column only; interleaving the bits of two range-normalized columns
  * orders rows along a space-filling curve, so every row group covers a
  * small rectangle of (a, b) space and predicates on EITHER column skip
  * most groups. All bit math is codegen'd Column algebra (the classic
  * magic-number spread), no UDFs.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions. */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Range-normalize a numeric column to 0..65535. */
  private def norm16(c: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - lo) / (hi - lo) * 65536.0).cast("long"))

  /** 32-bit Morton value interleaving two range-normalized columns. */
  def zValue(a: Column, aLo: Double, aHi: Double,
      b: Column, bLo: Double, bHi: Double): Column =
    spread16(norm16(a, aLo, aHi))
      .bitwiseOR(shiftleft(spread16(norm16(b, bLo, bHi)), 1))

  /** Rewrite `df` clustered along the z-order of two numeric columns:
    * range-partition on the Morton value (each output file covers a
    * z-range) and sort within partitions (each ROW GROUP covers a tight
    * (a, b) rectangle). `rowGroupBytes` sizes the parquet block — at
    * fixture scale a small value forces enough row groups to make the
    * stats-skipping measurable (ZOrderSpec); production leaves the
    * default 128 MB. The min/max normalization bounds are one tiny
    * aggregate (4 scalars to the driver). */
  /** The clustered FORM of `df` (range-partitioned + sorted along the
    * Morton value, curve column dropped): write it anywhere — e.g.
    * [[Versioned.commit]] with `statsCols` on both dimensions, so the
    * manifest sidecar records each FILE's tight (a, b) rectangle and
    * [[Versioned.readWhereAll]] box queries prune at the manifest level
    * before parquet row-group stats even apply. */
  def clustered(df: DataFrame, a: String, b: String,
      files: Int = 4): DataFrame = {
    val Array(st) = df.agg(
      min(col(a)).cast("double"), max(col(a)).cast("double"),
      min(col(b)).cast("double"), max(col(b)).cast("double")).collect()
    val z = zValue(col(a), st.getDouble(0), st.getDouble(1),
      col(b), st.getDouble(2), st.getDouble(3))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  def writeClustered(df: DataFrame, a: String, b: String, outDir: String,
      files: Int = 4, rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    clustered(df, a, b, files)
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .option("parquet.page.size", math.max(1024L, rowGroupBytes / 8))
      .parquet(outDir)
  }
}
