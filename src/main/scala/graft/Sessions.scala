package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Mirrors the reference's session wiring (reference csv_to_ice.py:4-14
  * configures S3 + Iceberg catalog; here the warehouse is the local
  * filesystem and the catalog is [[graft.sources.Tables]]).
  *
  * Scale notes: `spark.sql.shuffle.partitions` is sized to the local core
  * count (32) rather than the 200 default; on a real cluster this is the
  * one knob that must track `executors * cores` (or be left to AQE
  * coalescing, which is enabled).
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** AQE toggle (default on). Sub-second scan->agg queries pay a
    * measurable stage-replanning floor under AQE; flipping this off is
    * the A/B knob for that trade — at real scale AQE's coalescing and
    * skew-splitting win, so on stays the default. */
  def aqe: String = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")

  /** @param hadoopConf Hadoop configuration overrides (each key is
    *   published as `spark.hadoop.<key>`) — the seam where an
    *   object-store deployment supplies its `fs.s3a.*` settings
    *   (endpoint, path-style access, credentials provider), mirroring
    *   the reference's session wiring (csv_to_ice.py:6-10). The
    *   zero-egress environment only exercises `file:` paths, so this
    *   stays a config surface here; every table read already routes
    *   through `Path.getFileSystem`, which picks the scheme from the
    *   path + this configuration. */
  def builder(appName: String = "graft",
      hadoopConf: Map[String, String] = Map.empty): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      // Write-path constants (measured r18, WriteProfile: a 10-row
      // parquet write pays ~90 ms over the bare job floor; these three
      // recover ~45 ms of it — ~30% of every commit's write job, and
      // the versioned-lifecycle gates run hundreds of such writes):
      // commit algorithm v2 renames task output at task commit instead
      // of re-walking it at job commit (the standard HDFS/filesystem
      // production setting; graft's own atomic-marker publish sits
      // ABOVE the committer, so torn task output is never visible to
      // readers either way); _SUCCESS markers are metadata no reader
      // here (or any manifest-based table format) consults; 1 MiB
      // checksum chunks cut the per-file .crc bookkeeping on small
      // commit files. All three sit BEFORE the hadoopConf fold so an
      // object-store deployment's committer settings override them.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
        "false")
      .config("spark.hadoop.file.bytes-per-checksum", "1048576")
    hadoopConf.foldLeft(b) { case (bb, (k, v)) =>
      bb.config(s"spark.hadoop.$k", v)
    }
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let AQE coalesce CACHED plans too (off by default): the
      // refresh/CDC paths persist small intermediate frames around
      // multi-action fan-outs, and without this each cached frame
      // keeps all spark.sql.shuffle.partitions partitions — every
      // downstream action then pays one task launch per (mostly
      // empty) cached partition, which measured as the single
      // largest constant in the MV gate wall (43-task jobs over
      // ~300-row frames). At real scale the setting is strictly
      // better for the same reason AQE coalescing is.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // Versioned tables as SQL-addressable catalog tables with native
      // VERSION/TIMESTAMP AS OF (the reference resolves its Iceberg
      // tables the same way, presto/etc/catalog/iceberg.properties:1-3).
      // The root is per-query configurable; absolute-path idents
      // (graft.`/dir`) need none.
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Wide plans (the q32 window battery, multi-column text scoring)
      // must stay inside whole-stage codegen; the default maxFields=100
      // silently drops them out (measured ~3x slower interpreted).
      .config("spark.sql.codegen.maxFields", "256")
      // Generated-class cache (STATIC conf, must be set before the
      // session exists). The default 100 entries thrashes under any
      // workload with more than ~100 live codegen sources — a single
      // MV-refresh gate runs ~120 jobs whose stages each compile a
      // distinct source, so by the time a shape repeats its class has
      // been evicted and Janino recompiles it: measured 40-55% of the
      // warm task time of every metadata-scale protocol gate (q60 warm
      // wall 11.7 s -> 5.4 s with the cache sized to the workload).
      // The same applies to any long-lived production driver (an MV
      // maintenance service replays the same plan shapes per commit) —
      // this is a workload-size knob, not a local[32] tweak. Entries
      // are weak-referenced class objects; 2000 bounds metaspace while
      // covering the largest gate's working set with headroom.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      // The `events` fixture carries parquet TIMESTAMP(NANOS); Spark has no
      // nanosecond timestamp type, so read them as raw Long nanos and let
      // Tables.load convert to microsecond timestamps.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
