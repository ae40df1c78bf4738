package graft.examples

import org.apache.spark.sql.functions._

import graft.sources.{Tables, Versioned}

/** Runnable tour of the snapshot-table surface — the engine-side
  * equivalent of the reference's Iceberg lifecycle (create → append →
  * merge → inspect → expire), driven end to end on the `region`
  * fixture: atomic commit, O(delta) append, hidden `days(ts)`
  * partitioning, copy-on-write upsert, merge-on-read delete, one
  * atomic CDC batch, SQL time travel, tags, compaction, vacuum.
  * Prints SNAPSHOT_* markers for each leg. */
object SnapshotDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.get("graft-snapshot-demo")
    import spark.implicits._
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-snapshot-demo").toString
    val t = s"$dir/region_versioned"

    val region = Tables.load(spark, sf, "region")
      .select(col("r_regionkey"), col("r_name"))
      .withColumn("ts",
        date_add(to_date(lit("2024-01-01")),
          pmod(col("r_regionkey"), lit(3)).cast("int")).cast("timestamp"))
    val days = Some(Versioned.Transform.Days("ts"))

    // v1 commit + v2 O(delta) append, hidden day partitioning
    Versioned.commit(region.filter(col("r_regionkey") < 3), t,
      transform = days, statsCols = Seq("r_regionkey"))
    Versioned.append(region.filter(col("r_regionkey") >= 3), t,
      transform = days, statsCols = Seq("r_regionkey"))
    println(s"SNAPSHOT_V2_ROWS=${Versioned.read(spark, t).count()}")

    // copy-on-write upsert (v3), then merge-on-read delete (v4)
    Versioned.upsert(spark, t,
      region.filter(col("r_regionkey") === 0)
        .withColumn("r_name", lit("UPDATED")), "r_regionkey",
      transform = days)
    Versioned.deleteRows(spark, t, Seq(1).toDF("r_regionkey"))
    println(s"SNAPSHOT_AFTER_DELETE=${Versioned.read(spark, t).count()}")

    // one atomic CDC batch (v5): upsert key 2 + delete key 3 together
    Versioned.applyChanges(spark, t,
      upserts = region.filter(col("r_regionkey") === 2)
        .withColumn("r_name", lit("CDC")),
      deleteKeys = Seq(3).toDF("r_regionkey"),
      key = "r_regionkey", transform = days)
    println(s"SNAPSHOT_AFTER_CDC=${Versioned.read(spark, t).count()}")

    // SQL time travel through the native catalog — no registration
    val tt = spark.sql(
      s"""SELECT (SELECT count(*) FROM graft.`$t` VERSION AS OF 2) AS v2,
                 (SELECT count(*) FROM graft.`$t`) AS cur""").head()
    println(s"SNAPSHOT_SQL_TT=v2:${tt.getLong(0)},cur:${tt.getLong(1)}")

    // write-audit-publish: stage on a branch, audit, fast-forward
    Versioned.createBranch(spark, t, "staging")
    Versioned.append(
      Seq((90, "STAGED",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
        .toDF("r_regionkey", "r_name", "ts"),
      t, transform = days, branch = Some("staging"))
    val audit = spark.sql(
      s"""SELECT (SELECT count(*) FROM graft.`$t`) AS main,
                 (SELECT count(*) FROM graft.`$t`
                    VERSION AS OF 'staging') AS staged""").head()
    Versioned.fastForward(spark, t, from = "staging")
    println(s"SNAPSHOT_WAP=main:${audit.getLong(0)}," +
      s"staged:${audit.getLong(1)}," +
      s"published:${Versioned.read(spark, t).count()}")

    // metadata-only rename: old files resolve under the new name
    Versioned.renameColumn(spark, t, "r_name", "region_name")
    println("SNAPSHOT_RENAMED=" + Versioned.read(spark, t)
      .filter(col("region_name") === "STAGED").count())

    // tag the audited snapshot, compact, expire everything untagged
    Versioned.tag(spark, t, "audited", Some(2))
    Versioned.compact(spark, t, transform = days)
    Versioned.vacuum(spark, t, keep = 1)
    println(s"SNAPSHOT_TAGGED_ROWS=" +
      s"${Versioned.readTag(spark, t, "audited").count()}")
    println(s"SNAPSHOT_HISTORY=${Versioned.history(spark, t).count()}")

    // derived table: an incrementally maintained projection — full
    // build once, then a source delete propagates through ONE
    // O(changed files) refresh instead of a recompute
    val dt = s"$dir/region_derived"
    val proj = (d: org.apache.spark.sql.DataFrame) =>
      d.select(col("r_regionkey"),
        upper(col("region_name")).as("region_name"))
    graft.sources.DerivedTable.refresh(spark, t, dt, "r_regionkey", proj)
    println(s"SNAPSHOT_DERIVED_BOOT=${Versioned.read(spark, dt).count()}")
    Versioned.deleteRows(spark, t, Seq(0).toDF("r_regionkey"))
    val (rf, rt2) = graft.sources.DerivedTable.refresh(
      spark, t, dt, "r_regionkey", proj)
    println(s"SNAPSHOT_DERIVED_REFRESH=${Versioned.read(spark, dt).count()}" +
      s" range=$rf..$rt2")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
