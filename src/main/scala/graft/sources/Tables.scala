package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Minimal filesystem table registry.
  *
  * Replaces the reference's Iceberg hadoop catalog (reference
  * csv_to_ice.py:11-13: catalog `taxi_catalog` over an S3 warehouse) with a
  * `name -> dir/name.parquet` mapping — every observable capability of the
  * demo's catalog (schema, partition pruning, pushdown, replace semantics)
  * comes from the parquet source itself; see SURVEY.md §7.2.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Load one table. The `events` fixture has shipped `ts` in two
    * layouts across testdata generations: parquet TIMESTAMP(NANOS),
    * which Spark surfaces as Long (nanosAsLong) and is converted here
    * to a microsecond TimestampType; and tz-less TIMESTAMP(MICROS),
    * which Spark surfaces as TIMESTAMP_NTZ and passes through
    * UNCHANGED — DuckDB reads the same file as a naive TIMESTAMP, so
    * keeping NTZ end-to-end is what makes oracle values and output
    * schemas agree (downstream epoch arithmetic handles both flavors,
    * see [[graft.operators.Events]]).
    *
    * The nanos conversion must be integral (`div`), not `/`: double
    * division loses exactness (the double ULP at 2024-epoch nanos is
    * 256 ns), so boundary-adjacent rows would land 1 us off the DuckDB
    * truncation.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** [[load]] + round-robin spread across the default shuffle
    * parallelism. The sf fixtures are single-row-group parquet files, so
    * their scans are ONE partition — which serializes per-row CPU-heavy
    * operators (regex scoring, shingle hashing, per-pair vector math). A
    * real 100 TB table scans as thousands of row-group splits and gets
    * this parallelism for free from the file layout; the explicit
    * exchange reproduces that property on the fixture for a few MB of
    * shuffle. Use for CPU-bound per-row paths; plain [[load]] where an
    * extra exchange would only add cost (scan->aggregate shapes). */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    df.repartition(spark.sessionState.conf.numShufflePartitions)
  }

  /** Persist a table bucketed (and sorted) by a join key — the layout
    * that removes the shuffle from every repeated large-large join on
    * that key (the SCALING.md answer for lineitem x orders at 100 TB):
    * both sides pre-hashed into the same bucket count means the join's
    * ClusteredDistribution is satisfied straight off the scan, so the
    * plan carries no Exchange (BucketedJoinSpec asserts it). Bucketing
    * metadata lives in the session catalog (`saveAsTable`); the data is
    * external parquet at `dir`. */
  def writeBucketed(df: DataFrame, table: String, dir: String,
      key: String, buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", dir)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every fixture table as a temp view (SQL entry point).
    * Memoized per session+dir: re-registering reads 10 parquet footers
    * for schemas, so repeated SQL-API calls against the same warehouse
    * skip it (a new sfDir re-registers). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
