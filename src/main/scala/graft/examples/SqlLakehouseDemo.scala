package graft.examples

import graft.Sessions

/** The catalog-SQL tour — every lakehouse verb a reference user runs,
  * issued ONLY through `spark.sql` (no programmatic engine calls):
  * DDL with schema evolution, writes, row-level DML, time travel,
  * metadata tables, and CALL maintenance procedures.
  *
  * Run: `sbt "runMain graft.examples.SqlLakehouseDemo [workDir]"`.
  * Prints SQL_DEMO_* lines for smoke checking.
  */
object SqlLakehouseDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/tmp/sql-lakehouse-demo")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val spark = Sessions.get("graft-sql-demo")
    val abs = new java.io.File(s"$out/users").getAbsolutePath
    val g = s"graft.`$abs`"
    def one(sql: String): Long =
      spark.sql(sql).collect().headOption.map(_.getLong(0)).getOrElse(0L)

    // —— DDL + writes ——
    spark.sql(s"CREATE TABLE $g (id INT, name STRING)")
    spark.sql(s"INSERT INTO $g VALUES (1, 'ada'), (2, 'bob'), (3, 'cyd')")
    spark.sql(s"ALTER TABLE $g ADD COLUMN score BIGINT")
    spark.sql(s"INSERT INTO $g VALUES (4, 'dee', 40)")
    println(s"SQL_DEMO_ROWS=${one(s"SELECT count(*) FROM $g")}")

    // —— row-level DML ——
    spark.sql(s"DELETE FROM $g WHERE id = 2")
    spark.sql(s"UPDATE $g SET score = 0 WHERE score IS NULL")
    spark.sql(s"""
      MERGE INTO $g USING (SELECT 3 AS id, 300 AS s UNION ALL
                           SELECT 9 AS id, 900 AS s) src
      ON $g.id = src.id
      WHEN MATCHED THEN UPDATE SET score = src.s
      WHEN NOT MATCHED THEN INSERT (id, name, score)
        VALUES (src.id, 'new', src.s)
    """)
    println("SQL_DEMO_SCORED=" +
      one(s"SELECT count(*) FROM $g WHERE score > 0"))

    // —— time travel + metadata tables ——
    println("SQL_DEMO_V1_ROWS=" +
      one(s"SELECT count(*) FROM $g VERSION AS OF 2")) // first INSERT
    println("SQL_DEMO_COMMITS=" +
      one(s"SELECT count(*) FROM $g.history"))
    println("SQL_DEMO_FILES=" + one(s"SELECT count(*) FROM $g.files"))

    // —— maintenance procedures ——
    val compacted = spark.sql(
      s"CALL graft.system.compact(table => '$abs')").head().getInt(0)
    println(s"SQL_DEMO_COMPACTED_V=$compacted")
    val kept = spark.sql(
      s"CALL graft.system.vacuum(table => '$abs', keep => 1)")
      .head().getInt(0)
    println(s"SQL_DEMO_RETAINED=$kept")
    println("SQL_DEMO_FINAL=" + one(s"SELECT count(*) FROM $g"))

    // —— DDL-declared partitioning (the reference's csv_to_ice.py:54
    //    shape: a bare column is identity) + spec evolution + the
    //    .partitions skew rollup ——
    val absT = new java.io.File(s"$out/trips").getAbsolutePath
    val t = s"graft.`$absT`"
    spark.sql(s"CREATE TABLE $t (trip_id INT, pickup_date DATE, " +
      "fare DOUBLE) PARTITIONED BY (pickup_date)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, DATE'2024-01-01', 10.5), (2, DATE'2024-01-01', 7.25), " +
      "(3, DATE'2024-01-02', 22.0), (4, DATE'2024-01-03', 5.75)")
    println("SQL_DEMO_PARTITIONS=" + one(
      s"SELECT count(*) FROM $t.partitions WHERE partition IS NOT NULL"))
    println("SQL_DEMO_PART_ROWS=" + one(
      s"SELECT sum(row_count) FROM $t.partitions"))
    // evolve the default spec for future writes; old files keep theirs
    spark.sql(s"CALL graft.system.set_spec(table => '$absT', " +
      "spec => 'bucket(4,trip_id)')")
    spark.sql(s"INSERT INTO $t VALUES (100, DATE'2024-02-01', 9.99)")
    println("SQL_DEMO_EVOLVED=" + one(s"SELECT count(*) FROM $t"))

    // —— the Iceberg DDL spellings (parser extension): partition-spec
    //    evolution, branches/tags, surfaced via SHOW CREATE TABLE ——
    spark.sql(s"ALTER TABLE $t REPLACE PARTITION FIELD " +
      "bucket(4, trip_id) WITH days(pickup_date)")
    val show = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
    println("SQL_DEMO_SHOW_SPEC=" +
      (if (show.contains("days(pickup_date)")) 1 else 0))
    spark.sql(s"ALTER TABLE $t CREATE TAG audited AS OF VERSION 2")
    println("SQL_DEMO_TAG_ROWS=" +
      one(s"SELECT count(*) FROM $t VERSION AS OF 'audited'"))
    spark.sql(s"ALTER TABLE $t CREATE BRANCH wip")
    spark.sql(s"ALTER TABLE $t DROP BRANCH wip")
    println("SQL_DEMO_DDL_VERSIONS=" +
      one(s"SELECT count(*) FROM $t.history"))

    // —— declared write order: the table says HOW its files are
    //    internally sorted once; maintenance maintains it ——
    spark.sql(s"ALTER TABLE $t WRITE ORDERED BY (trip_id)")
    spark.sql(s"CALL graft.system.compact(table => '$absT')")
    println("SQL_DEMO_WRITE_ORDER=" + spark.sql(s"SHOW TBLPROPERTIES $t")
      .collect().count(r => r.getString(0) == "write.sort-order"))

    // —— clustering + stats maintenance: z-order rewrite and a stats
    //    backfill over whatever roots predate their sidecars ——
    spark.sql(s"CALL graft.system.rewrite_zorder(table => '$absT', " +
      "col_a => 'trip_id', col_b => 'fare')")
    println("SQL_DEMO_ZORDERED=" + one(s"SELECT count(*) FROM $t"))
    val backfilled = spark.sql(
      s"CALL graft.system.collect_stats(table => '$absT')")
      .head().getInt(0)
    println(s"SQL_DEMO_STATS_BACKFILL_OK=${if (backfilled >= 0) 1 else 0}")
    // CDC as SQL: register a change range and query it like any view
    val chg = spark.sql("CALL graft.system.create_changelog_view(" +
      s"table => '$absT', from_version => 1, view_name => 'demo_chg')")
      .head()
    println(s"SQL_DEMO_CHANGELOG_ROWS=${chg.getLong(1)}")
    // retention + debris maintenance through SQL
    println("SQL_DEMO_VACUUM_RETAINED=" +
      spark.sql(s"VACUUM $t RETAIN 2 VERSIONS").head().getInt(0))
    println("SQL_DEMO_ORPHANS=" + spark.sql(
      s"CALL graft.system.remove_orphan_files(table => '$absT')")
      .head().getInt(0))
    println("SQL_DEMO_FINAL_T=" + one(s"SELECT count(*) FROM $t"))
    // per-commit summaries + per-entry manifest inventory
    println("SQL_DEMO_SNAPSHOTS=" +
      one(s"SELECT count(*) FROM $g.snapshots"))
    println("SQL_DEMO_MANIFESTS=" +
      one(s"SELECT count(*) FROM $g.manifests"))
    // per-file lifecycle: the compact that produced the current head
    // both added its rewrite and deleted its inputs
    println("SQL_DEMO_ENTRIES_ADDED=" + one(
      s"SELECT count(*) FROM $g.entries WHERE status = 'added'"))
    // cross-engine ingest: add_files links foreign parquet in place
    val foreign = s"$out/foreign_src"
    spark.sql(s"SELECT id, name, score FROM $g").limit(2)
      .write.parquet(foreign)
    val impV = spark.sql("CALL graft.system.add_files(" +
      s"table => '$abs', source_path => '$foreign')").head().getInt(0)
    println(s"SQL_DEMO_ADD_FILES_V=$impV")
    println("SQL_DEMO_AFTER_IMPORT=" + one(s"SELECT count(*) FROM $g"))
    // incremental materialized view, pure SQL: bootstrap, mutate the
    // source, and advance the derived table by one O(delta) refresh
    val dvDir = new java.io.File(s"$out/sql_derived").getAbsolutePath
    def refreshMv() = spark.sql("CALL graft.system.refresh_derived(" +
      s"source => '$abs', dest => '$dvDir', key => 'id', " +
      "query => 'SELECT id, upper(name) AS name FROM __source__')")
      .head()
    refreshMv()
    println("SQL_DEMO_MV_BOOT=" +
      one(s"SELECT count(*) FROM graft.`$dvDir`"))
    spark.sql(s"DELETE FROM $g WHERE id = 1")
    val mv = refreshMv()
    println("SQL_DEMO_MV_REFRESH=" +
      one(s"SELECT count(*) FROM graft.`$dvDir`") +
      s" range=${mv.getInt(0)}..${mv.getInt(1)}")
    // metadata-only aggregate: a bare global count answers from the
    // stats sidecars with NO parquet scan — but only when the manifest
    // provably carries it: the MV leg's DELETE left a live MoR
    // tombstone, so the first probe correctly falls back to the scan;
    // compaction absorbs the tombstone and the same SQL goes scan-free
    def maggProbe(): (Long, Boolean) = {
      val q = spark.sql(s"SELECT count(*) AS n FROM $g")
      (q.head().getLong(0),
        !q.queryExecution.executedPlan.toString.contains("Scan parquet"))
    }
    val (n1, free1) = maggProbe()
    println(s"SQL_DEMO_META_AGG_ROWS=$n1 scan_free_with_tombstone=$free1")
    spark.sql(s"CALL graft.system.compact(table => '$abs')")
    val (n2, free2) = maggProbe()
    println(s"SQL_DEMO_META_AGG_COMPACTED=$n2 scan_free=$free2")
    // incremental AGGREGATE view: sum/count per score-group maintained
    // by algebraic deltas, pure SQL
    val avDir = new java.io.File(s"$out/sql_aggmv").getAbsolutePath
    def refreshAv() = spark.sql("CALL graft.system.refresh_agg(" +
      s"source => '$abs', dest => '$avDir', row_key => 'id', " +
      "group_by => 'name', value => 'score')").head()
    refreshAv()
    println("SQL_DEMO_AGGMV_BOOT=" +
      one(s"SELECT count(*) FROM graft.`$avDir`"))
    val victim = spark.sql(s"SELECT max(id) FROM $g").head().get(0)
    spark.sql(s"DELETE FROM $g WHERE id = $victim")
    val av = refreshAv()
    println("SQL_DEMO_AGGMV_REFRESH=" +
      one(s"SELECT count(*) FROM graft.`$avDir`") +
      s" range=${av.getInt(0)}..${av.getInt(1)}")
    // the full MATERIALIZED VIEW lifecycle: CREATE persists the spec
    // in the view's own properties, refresh_mv advances it
    // argument-free, DROP removes it
    val mvDir = new java.io.File(s"$out/sql_mv").getAbsolutePath
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mvDir` KEY (id) " +
      s"AS SELECT id, upper(name) AS uname, score FROM $g " +
      "WHERE score >= 0")
    println("SQL_DEMO_MVDDL_BOOT=" +
      one(s"SELECT count(*) FROM graft.`$mvDir`"))
    spark.sql(s"INSERT INTO $g VALUES (777, 'omega', 7.5)")
    val mvr = spark.sql(
      s"CALL graft.system.refresh_mv('$mvDir')").head()
    println("SQL_DEMO_MVDDL_REFRESH=" +
      one(s"SELECT count(*) FROM graft.`$mvDir`") +
      s" kind=${mvr.getString(0)} " +
      s"range=${mvr.getInt(1)}..${mvr.getInt(2)}")
    println("SQL_DEMO_MVDDL_SPEC=" +
      spark.sql(s"SHOW TBLPROPERTIES graft.`$mvDir`").collect()
        .count(_.getString(0).startsWith("graft.mv.")))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mvDir`")
    println("SQL_DEMO_MVDDL_DROPPED=" +
      (if (new java.io.File(mvDir).exists()) 0 else 1))
    // JOIN materialized view: an enrichment view over fact⋈dim
    // maintained from BOTH changelogs — a dim-only relabel re-derives
    // exactly the affected fact rows (the fact range no-ops)
    val dimDir = new java.io.File(s"$out/sql_dim").getAbsolutePath
    val jmvDir = new java.io.File(s"$out/sql_jmv").getAbsolutePath
    graft.sources.Versioned.commit(
      spark.sql(s"SELECT DISTINCT name AS dk, upper(name) AS label " +
        s"FROM $g"), dimDir)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$jmvDir` KEY (id) " +
      s"AS SELECT f.id, d.label, f.score FROM $g f " +
      s"JOIN graft.`$dimDir` d ON f.name = d.dk")
    println("SQL_DEMO_JOINMV_BOOT=" +
      one(s"SELECT count(*) FROM graft.`$jmvDir`"))
    spark.sql(s"UPDATE graft.`$dimDir` SET label = 'RELABELED' " +
      "WHERE dk = 'omega'")
    val jr = spark.sql(
      s"CALL graft.system.refresh_mv('$jmvDir')").head()
    println("SQL_DEMO_JOINMV_RELABELED=" +
      one(s"SELECT count(*) FROM graft.`$jmvDir` " +
        "WHERE label = 'RELABELED'") +
      s" kind=${jr.getString(0)}")
    // aggregate-over-join: one name — invertible shapes (sum/cnt/
    // avg) maintain the gold DIRECTLY since r18 (no hidden silver,
    // one commit per refresh); extrema/distinct shapes still chain
    // a hidden silver at <view>.silver
    val gjDir = new java.io.File(s"$out/sql_aggjoin").getAbsolutePath
    val cgj = spark.sql(s"CREATE MATERIALIZED VIEW graft.`$gjDir` " +
      s"ROW KEY (id) AS SELECT d.label, sum(f.score) AS sum_score, " +
      s"count(f.score) AS cnt_score, count(*) AS n_rows FROM $g f " +
      s"JOIN graft.`$dimDir` d ON f.name = d.dk GROUP BY d.label")
      .head()
    spark.sql(s"INSERT INTO $g VALUES (888, 'omega', 2.5)")
    val gjr = spark.sql(
      s"CALL graft.system.refresh_mv('$gjDir')").head()
    println("SQL_DEMO_AGGJOIN=" +
      one(s"SELECT count(*) FROM graft.`$gjDir`") +
      s" kind=${cgj.getString(0)} refreshed=${gjr.getString(0)} " +
      "silver_absent=" + (if (new java.io.File(gjDir + ".silver")
        .exists()) 0 else 1))
    // continuous maintenance (r17): follow_mv converges the view on
    // source commits with no manual refresh; exactly-once by the pin
    spark.sql(s"CALL graft.system.follow_mv('$gjDir', " +
      "poll_interval_ms => 100)")
    val rowsBefore = spark.sql(
      s"SELECT sum(n_rows) FROM graft.`$gjDir`").head().getLong(0)
    // 'omega' has a dim match (relabels notwithstanding) — an
    // unmatched name would be dropped by the INNER join and the
    // convergence check could never see it
    spark.sql(s"INSERT INTO $g VALUES (889, 'omega', 1.0)")
    // converged = the NEW ROW reached the gold (its n_rows total
    // grew) AND the own-leg lag reads 0 — the direct gold's legs ARE
    // the fact and dim (no hidden silver, so no transitive lineage)
    val deadline = System.currentTimeMillis + 20000
    var converged = false
    while (!converged && System.currentTimeMillis < deadline) {
      val shown = spark.sql(s"SHOW TBLPROPERTIES graft.`$gjDir`")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      converged = shown
        .get("graft.mv.staleness_versions").contains("0") &&
        spark.sql(s"SELECT sum(n_rows) FROM graft.`$gjDir`")
          .head().getLong(0) == rowsBefore + 1
      if (!converged) Thread.sleep(100)
    }
    spark.sql(s"CALL graft.system.unfollow_mv('$gjDir')")
    println(s"SQL_DEMO_FOLLOW_CONVERGED=${if (converged) 1 else 0}")
    // r18: EXPRESSION measures (exact cents via floor), EXACT
    // distinct counts, both in one aggregate MV — the equality
    // against a full recompute is exact arithmetic, not tolerance
    val xmvDir = new java.io.File(s"$out/sql_xmv").getAbsolutePath
    val xmvSel = s"SELECT name, sum(floor(score * 100)) AS " +
      "sum_cents, count(floor(score * 100)) AS cnt_cents, " +
      "count(*) AS n_rows, count(DISTINCT score) AS cd_score " +
      s"FROM $g GROUP BY name"
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$xmvDir` ROW KEY " +
      s"(id) AS $xmvSel")
    spark.sql(s"INSERT INTO $g VALUES (890, 'omega', 3.25)")
    spark.sql(s"CALL graft.system.refresh_mv('$xmvDir')")
    val xeq = graft.sources.DerivedTable.bagEqual(
      spark.sql(s"SELECT * FROM graft.`$xmvDir`"),
      spark.sql(xmvSel))
    println("SQL_DEMO_EXPR_MV_EQ=" + (if (xeq) 1 else 0))
    // r18: aggregate-over-SNOWFLAKE — the fact⋈d1 hop hides at
    // <view>.snow and the gold rewrites onto the resulting star;
    // refresh_mv cascades through every hidden hop
    val d2Dir = new java.io.File(s"$out/sql_dim2").getAbsolutePath
    graft.sources.Versioned.commit(
      spark.sql(s"SELECT DISTINCT label AS lk, concat('R_', label) " +
        s"AS region FROM graft.`$dimDir`"), d2Dir)
    val snowDir =
      new java.io.File(s"$out/sql_snowagg").getAbsolutePath
    val snowSel = "SELECT d2.region, sum(floor(f.score * 100)) AS " +
      "sum_cents, count(floor(f.score * 100)) AS cnt_cents, " +
      s"count(*) AS n_rows FROM $g f JOIN graft.`$dimDir` d1 ON " +
      s"f.name = d1.dk JOIN graft.`$d2Dir` d2 ON d1.label = d2.lk"
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$snowDir` ROW KEY " +
      s"(id) AS $snowSel GROUP BY d2.region")
    spark.sql(s"INSERT INTO $g VALUES (891, 'omega', 4.0)")
    spark.sql(s"CALL graft.system.refresh_mv('$snowDir')")
    val snowEq = graft.sources.DerivedTable.bagEqual(
      spark.sql(s"SELECT * FROM graft.`$snowDir`"),
      spark.sql(s"$snowSel GROUP BY d2.region"))
    println("SQL_DEMO_SNOWAGG_EQ=" + (if (snowEq) 1 else 0) +
      " snow_present=" + (if (new java.io.File(snowDir + ".snow")
        .exists()) 1 else 0))
    // r18: AUTOMATIC QUERY REWRITE — a registered aggregate view
    // answers the matching rollup over its SOURCE (the physical
    // plan's scan locations name the view's directory); a source
    // commit stales the pin and the same query falls back to the
    // scan, counting the new row
    val rwDir = new java.io.File(s"$out/sql_rwmv").getAbsolutePath
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$rwDir` ROW KEY " +
      "(id) AS SELECT name, sum(score) AS sum_score, count(score) " +
      s"AS cnt_score, count(*) AS n_rows FROM $g GROUP BY name")
    spark.sql(s"CALL graft.system.enable_rewrite('$rwDir')")
    def rwRollup() = spark.sql(
      s"SELECT name, count(*) AS n FROM $g GROUP BY name")
    val rwServed = rwRollup().queryExecution.executedPlan.toString
      .contains(rwDir)
    val rwRowsV1 = rwRollup().agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    spark.sql(s"INSERT INTO $g VALUES (892, 'omega', 1.0)")
    val rwStaleScan = !rwRollup().queryExecution.executedPlan
      .toString.contains(rwDir)
    val rwRowsV2 = rwRollup().agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    println("SQL_DEMO_REWRITE_SERVED=" + (if (rwServed) 1 else 0) +
      " stale_scan=" + (if (rwStaleScan) 1 else 0) +
      " rows_delta=" + (rwRowsV2 - rwRowsV1))
    spark.stop()
  }
}
