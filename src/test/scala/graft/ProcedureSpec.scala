package graft

import org.apache.spark.sql.functions._
import graft.sources.Versioned

/** `CALL graft.system.<proc>(...)` — the Iceberg maintenance-procedure
  * surface over the engine's table-maintenance API. */
class ProcedureSpec extends SparkSpec {
  private val work = "target/tmp/proc-spec"

  private def fresh(name: String): (String, String) = {
    val t = s"$work/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    (t, new java.io.File(t).getAbsolutePath)
  }

  test("compact procedure rewrites a fragmented table") {
    import spark.implicits._
    val (t, abs) = fresh("proc_compact")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    Versioned.append(Seq((2, "b")).toDF("id", "v"), t)
    Versioned.append(Seq((3, "c")).toDF("id", "v"), t)
    val out = spark.sql(
      s"CALL graft.system.compact(table => '$abs')").collect()
    assert(out.length == 1 && out.head.getInt(0) == 4)
    assert(Versioned.read(spark, t).count() == 3)
    // self-contained after compact: no linked files remain
    assert(Versioned.files(spark, t).collect()
      .forall(!_.getBoolean(3)))
  }

  test("rollback and vacuum procedures") {
    import spark.implicits._
    val (t, abs) = fresh("proc_rb")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(3)).toDF("x"), t)
    val rb = spark.sql(
      s"CALL graft.system.rollback(table => '$abs', version => 2)")
      .head().getInt(0)
    assert(rb == 4)
    assert(Versioned.read(spark, t).count() == 2)
    // dry_run predicts the retained count and expires NOTHING
    val predicted = spark.sql(s"CALL graft.system.vacuum(" +
      s"table => '$abs', keep => 2, dry_run => true)").head().getInt(0)
    assert(predicted == 2)
    assert(Versioned.versions(spark, t) == Seq(1, 2, 3, 4))
    // positional args work too; vacuum returns the retained count —
    // matching the dry run's prediction
    val kept = spark.sql(s"CALL graft.system.vacuum('$abs', 2)")
      .head().getInt(0)
    assert(kept == predicted)
    // newest two versions survive; the rollback target's FILES stay
    // referenced through v4's links even though v2 itself expired
    assert(Versioned.versions(spark, t) == Seq(3, 4))
    assert(Versioned.read(spark, t).count() == 2)
  }

  test("expire_snapshots with an age cutoff keeps fresh versions") {
    import spark.implicits._
    val (t, abs) = fresh("proc_expire")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    // a cutoff far in the past expires nothing
    val kept = spark.sql(s"CALL graft.system.expire_snapshots(" +
      s"table => '$abs', " +
      "older_than => TIMESTAMP '2000-01-01 00:00:00')")
      .head().getInt(0)
    assert(kept == 2)
    // a future cutoff keeps only the minimum
    val kept2 = spark.sql(s"CALL graft.system.expire_snapshots(" +
      s"table => '$abs', " +
      "older_than => TIMESTAMP '2100-01-01 00:00:00', " +
      "keep_min => 1)").head().getInt(0)
    assert(kept2 == 1)
    assert(Versioned.read(spark, t).count() == 2)
  }

  test("branch procedures run write-audit-publish end to end") {
    import spark.implicits._
    val (t, abs) = fresh("proc_branch")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    spark.sql(s"CALL graft.system.create_branch(" +
      s"table => '$abs', name => 'staging')")
    Versioned.append(Seq((2, "staged")).toDF("id", "v"), t,
      branch = Some("staging"))
    // main still reads 1 row; the branch reads 2
    assert(Versioned.read(spark, t).count() == 1)
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$abs` VERSION AS OF 'staging'")
      .head().getLong(0) == 2)
    spark.sql(s"CALL graft.system.fast_forward(" +
      s"table => '$abs', from => 'staging')")
    assert(Versioned.read(spark, t).count() == 2)
    assert(spark.sql(s"CALL graft.system.drop_branch(" +
      s"table => '$abs', name => 'staging')").head().getBoolean(0))
  }

  test("create_tag pins a snapshot for SQL time travel") {
    import spark.implicits._
    val (t, abs) = fresh("proc_tag")
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    spark.sql(s"CALL graft.system.create_tag(" +
      s"table => '$abs', name => 'v1pin', version => 1)")
    assert(spark.sql(
      s"SELECT count(*) FROM graft.`$abs` VERSION AS OF 'v1pin'")
      .head().getLong(0) == 1)
  }

  test("ALTER TABLE CREATE/DROP BRANCH and TAG DDL spellings") {
    import spark.implicits._
    val (t, abs) = fresh("ddl_refs")
    val g = s"graft.`$abs`"
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    Versioned.append(Seq((2, "b")).toDF("id", "v"), t)
    // tags: AS OF VERSION pins, bare CREATE refuses an existing name,
    // OR REPLACE moves it, IF NOT EXISTS no-ops
    spark.sql(s"ALTER TABLE $g CREATE TAG golden AS OF VERSION 1")
    assert(spark.sql(s"SELECT count(*) FROM $g VERSION AS OF 'golden'")
      .head().getLong(0) == 1)
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g CREATE TAG golden")
    }
    assert(dup.getMessage.contains("OR REPLACE"))
    spark.sql(s"ALTER TABLE $g CREATE TAG IF NOT EXISTS golden") // no-op
    spark.sql(s"ALTER TABLE $g CREATE OR REPLACE TAG golden AS OF VERSION 2")
    assert(spark.sql(s"SELECT count(*) FROM $g VERSION AS OF 'golden'")
      .head().getLong(0) == 2)
    // branches: create + branch write + WAP publish path stays intact
    spark.sql(s"ALTER TABLE $g CREATE BRANCH audit")
    Versioned.append(Seq((3, "staged")).toDF("id", "v"), t,
      branch = Some("audit"))
    assert(Versioned.read(spark, t).count() == 2) // main untouched
    assert(spark.sql(s"SELECT count(*) FROM $g VERSION AS OF 'audit'")
      .head().getLong(0) == 3)
    // drops: bare DROP refuses a missing name, IF EXISTS no-ops
    val miss = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g DROP BRANCH nope")
    }
    assert(miss.getMessage.contains("IF EXISTS"))
    spark.sql(s"ALTER TABLE $g DROP BRANCH IF EXISTS nope") // no-op
    spark.sql(s"ALTER TABLE $g DROP BRANCH audit")
    assert(!Versioned.branches(spark, t).contains("audit"))
    spark.sql(s"ALTER TABLE $g DROP TAG golden")
    assert(!Versioned.tags(spark, t).contains("golden"))
    // the expired pin releases the version for vacuum again
    spark.sql(s"ALTER TABLE $g DROP TAG IF EXISTS golden") // no-op
  }

  test("collect_stats backfills sidecars: counts, pruning cols, idempotence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (t, abs) = fresh("proc_stats")
    Versioned.commit((1 to 40).map(i => (i, s"v$i")).toDF("id", "v"), t)
    Versioned.append((41 to 80).map(i => (i, s"v$i")).toDF("id", "v"), t)
    // simulate a legacy table: strip the commit-time sidecars
    Seq(1, 2).foreach { v =>
      val p = new java.io.File(s"$t/v=$v/_stats.tsv")
      assert(p.exists); assert(p.delete())
    }
    val before = Versioned.footerOpenCount.get()
    Versioned.partitions(spark, t).collect()
    assert(Versioned.footerOpenCount.get() > before,
      "a stripped table must be falling back to footer opens")
    // counts backfill: both roots gain sidecars, .partitions goes O(versions)
    val updated = spark.sql(s"CALL graft.system.collect_stats(" +
      s"table => '$abs')").head().getInt(0)
    assert(updated == 2)
    val mid = Versioned.footerOpenCount.get()
    val rows = Versioned.partitions(spark, t)
      .agg(org.apache.spark.sql.functions.sum("row_count"))
      .head().getLong(0)
    assert(rows == 80L)
    assert(Versioned.footerOpenCount.get() == mid,
      "backfilled sidecars must serve .partitions without footer opens")
    // column backfill enables min/max pruning on the old roots
    assert(spark.sql(s"CALL graft.system.collect_stats(" +
      s"table => '$abs', cols => 'id')").head().getInt(0) == 2)
    val rw = Versioned.readWhere(spark, t, "id", 5, 10)
    assert(rw.count() == 6)
    assert(rw.inputFiles.length <
      Versioned.read(spark, t).inputFiles.length,
      "backfilled id stats must prune files")
    // already covered -> untouched
    assert(spark.sql(s"CALL graft.system.collect_stats(" +
      s"table => '$abs', cols => 'id')").head().getInt(0) == 0)
  }

  test("TBLPROPERTIES persist, survive commits, and drive compact sizing") {
    import spark.implicits._
    val (t, abs) = fresh("proc_props")
    val g = s"graft.`$abs`"
    spark.sql(s"CREATE TABLE $g (id INT, v STRING) " +
      "TBLPROPERTIES ('owner.team' = 'data-eng')")
    def props() = spark.sql(s"SHOW TBLPROPERTIES $g").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("owner.team").contains("data-eng"))
    // properties survive ordinary commits
    spark.sql(s"INSERT INTO $g VALUES (1, 'a'), (2, 'b')")
    (3 to 6).foreach(i =>
      Versioned.append(Seq((i, "x")).toDF("id", "v"), t))
    assert(props().get("owner.team").contains("data-eng"))
    // SET merges; UNSET drops only its keys
    spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
      "'write.target-file-size-bytes' = '1024', 'note' = 'tmp')")
    assert(props().get("write.target-file-size-bytes").contains("1024"))
    spark.sql(s"ALTER TABLE $g UNSET TBLPROPERTIES ('note')")
    val afterUnset = props()
    assert(!afterUnset.contains("note") &&
      afterUnset.get("owner.team").contains("data-eng"))
    // the property drives maintenance sizing: 1 KB target over a
    // multi-KB table compacts into MULTIPLE files; an explicit CALL
    // argument overrides it back to one
    spark.sql(s"CALL graft.system.compact(table => '$abs')")
    assert(Versioned.read(spark, t).inputFiles.length > 1,
      "write.target-file-size-bytes=1024 must split the rewrite")
    spark.sql(s"CALL graft.system.compact(table => '$abs', " +
      "target_file_mb => 128)")
    assert(Versioned.read(spark, t).inputFiles.length == 1)
    assert(Versioned.read(spark, t).count() == 6)
    // FULL commits must carry properties forward — a compact or
    // INSERT OVERWRITE whose manifest references only its own root
    // would otherwise silently erase them (Iceberg properties survive
    // rewrite_data_files)
    assert(props().get("owner.team").contains("data-eng"),
      "compact erased the table properties")
    spark.sql(s"INSERT OVERWRITE $g VALUES (9, 'z')")
    assert(props().get("owner.team").contains("data-eng"),
      "INSERT OVERWRITE erased the table properties")
    // CTAS persists declared properties; REPLACE's declaration RESETS
    // the map (Iceberg's CREATE OR REPLACE contract)
    val (t2, abs2) = fresh("proc_props_ctas")
    val g2 = s"graft.`$abs2`"
    spark.sql(s"CREATE TABLE $g2 TBLPROPERTIES ('a' = '1') " +
      s"AS SELECT * FROM $g")
    def props2() = spark.sql(s"SHOW TBLPROPERTIES $g2").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2().get("a").contains("1"), "CTAS dropped TBLPROPERTIES")
    spark.sql(s"REPLACE TABLE $g2 (id INT) TBLPROPERTIES ('b' = '2')")
    val afterReplace = props2()
    assert(afterReplace.get("b").contains("2") &&
      !afterReplace.contains("a"),
      s"REPLACE must reset the declared property set, got $afterReplace")
  }

  test("SHOW PARTITIONS serves the manifest rollup, Spark format") {
    import spark.implicits._
    val (t, abs) = fresh("proc_showparts")
    Versioned.commit((1 to 9).map(i => (i, s"p${i % 3}"))
      .toDF("id", "pk"), t, partitionCol = Some("pk"))
    val rows = spark.sql(s"SHOW PARTITIONS graft.`$abs`").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("pk=p0", "pk=p1", "pk=p2"))
    assert(spark.sql(s"SHOW PARTITIONS graft.`$abs`").columns.toSeq ==
      Seq("partition"))
    // another catalog's table falls through to the delegate untouched
    val e = intercept[Exception](
      spark.sql("SHOW PARTITIONS spark_catalog.default.nope").collect())
    assert(!e.getMessage.contains("graft"))
    // an UNPARTITIONED table refuses cleanly (Spark's native behavior;
    // the rollup's null partition value can't fill a non-null column)
    val (t2, abs2) = fresh("proc_showparts_flat")
    Versioned.commit((1 to 3).map(i => (i, s"v$i")).toDF("id", "v"), t2)
    val flat = intercept[UnsupportedOperationException](
      spark.sql(s"SHOW PARTITIONS graft.`$abs2`").collect())
    assert(flat.getMessage.contains("not partitioned"))
    // and a MIXED layout (partitioned + layout-less roots) refuses
    // with the compact advice instead of NPEing in the sort
    Versioned.append(Seq((10, "px", "x")).toDF("id", "pk", "v")
      .select("id", "pk"), t) // no partitionCol: a layout-less root
    val mixed = intercept[UnsupportedOperationException](
      spark.sql(s"SHOW PARTITIONS graft.`$abs`").collect())
    assert(mixed.getMessage.contains("mixes partitioned"))
  }

  test("ANALYZE TABLE COMPUTE STATISTICS spells the stats backfill") {
    import spark.implicits._
    val (t, abs) = fresh("proc_analyze")
    val g = s"graft.`$abs`"
    // commits without statsCols carry count-only sidecars; ANALYZE
    // FOR COLUMNS adds min/max, and the backfill reports its work
    Versioned.commit(Seq((1, "a"), (9, "z")).toDF("id", "v"), t)
    val updated = spark.sql(
      s"ANALYZE TABLE $g COMPUTE STATISTICS FOR COLUMNS id")
      .head().getInt(0)
    assert(updated >= 1, "backfill must touch the stats-less root")
    // the backfilled min/max actually prune
    val rw = Versioned.readWhere(spark, t, "id", 100, 200)
    assert(rw.count() == 0 && rw.inputFiles.isEmpty,
      "backfilled stats must prune a provably-missing range")
    // a second run is idempotent (nothing left to backfill)
    assert(spark.sql(s"ANALYZE TABLE $g COMPUTE STATISTICS FOR " +
      "COLUMNS id").head().getInt(0) == 0)
    // a typo'd column fails the statement
    val err = intercept[Exception](spark.sql(
      s"ANALYZE TABLE $g COMPUTE STATISTICS FOR COLUMNS nope"))
    assert(err.getMessage.contains("nope"))
    // a non-graft ANALYZE falls through to the delegate's semantics
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite")
      .saveAsTable("analyze_fallthrough")
    try spark.sql(
      "ANALYZE TABLE analyze_fallthrough COMPUTE STATISTICS")
    finally spark.sql("DROP TABLE IF EXISTS analyze_fallthrough")
    // interception follows the PARSED identifier, not a string prefix:
    // a backtick-quoted catalog and `USE graft` shorthand both reach
    // the backfill, while an explicit other-catalog name under a graft
    // current catalog still falls through to the delegate
    assert(spark.sql(s"ANALYZE TABLE `graft`.`$abs` COMPUTE STATISTICS")
      .head().getInt(0) == 0) // idempotent: already backfilled
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite")
      .saveAsTable("analyze_ft2")
    try {
      spark.sql("USE graft")
      assert(spark.sql(s"ANALYZE TABLE `$abs` COMPUTE STATISTICS")
        .head().getInt(0) == 0)
      // the explicit other-catalog name must reach the DELEGATE's
      // semantics (Spark's V1 ANALYZE can't resolve cross-catalog
      // here and says so in its own words) — never our interceptor's
      // "needs a graft versioned table"
      val ft = intercept[Exception](spark.sql(
        "ANALYZE TABLE spark_catalog.default.analyze_ft2 " +
          "COMPUTE STATISTICS"))
      assert(!ft.getMessage.contains("graft versioned table"))
      // under USE graft, a bare name resolving as a TEMP VIEW names
      // the view (Spark's resolution order) — the delegate's ANALYZE
      // must answer (its own view refusal), never our backfill
      spark.range(3).createOrReplaceTempView("analyze_tv")
      try {
        val tv = intercept[Exception](spark.sql(
          "ANALYZE TABLE analyze_tv COMPUTE STATISTICS"))
        assert(!tv.getMessage.contains("graft versioned table"))
      } finally spark.catalog.dropTempView("analyze_tv")
      // same for a GLOBAL temp view's two-part spelling — global_temp
      // is not a registered catalog, so only the isTempView probe can
      // route it to the delegate
      spark.range(3).createGlobalTempView("analyze_gtv")
      try {
        val gtv = intercept[Exception](spark.sql(
          "ANALYZE TABLE global_temp.analyze_gtv COMPUTE STATISTICS"))
        assert(!gtv.getMessage.contains("graft versioned table"))
      } finally spark.catalog
        .dropGlobalTempView("analyze_gtv")
      // the catalog head resolves case-insensitively, like Spark's
      // own catalog references: GRAFT.t intercepts same as graft.t
      assert(spark.sql(s"ANALYZE TABLE GRAFT.`$abs` COMPUTE STATISTICS")
        .head().getInt(0) == 0) // idempotent: already backfilled
    } finally {
      spark.sql(s"USE $prevCat")
      spark.sql("DROP TABLE IF EXISTS analyze_ft2")
    }
  }

  test("properties survive a binpack that rewrites EVERY base file") {
    import spark.implicits._
    // the reachability case the commit-shape rule missed: compactSmall
    // commits with linkEntries = surviving; when the binpack packs
    // every file, surviving is empty, the new manifest references only
    // the packed root — which must then inherit the _props sidecar or
    // the very property that CONFIGURED the binpack silently vanishes
    val (t, abs) = fresh("proc_props_binpack")
    val g = s"graft.`$abs`"
    spark.sql(s"CREATE TABLE $g (id INT, v STRING)")
    spark.sql(s"INSERT INTO $g VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $g VALUES (2, 'b')")
    spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
      "'write.target-file-size-bytes' = '134217728')")
    // every data file is tiny -> the binpack rewrites all of them
    Versioned.compactSmall(spark, t, minFileBytes = 1024 * 1024)
    val props = spark.sql(s"SHOW TBLPROPERTIES $g").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.target-file-size-bytes")
      .contains("134217728"),
      s"full-rewrite binpack erased the table properties: $props")
    assert(Versioned.read(spark, t).count() == 2)
  }

  test("CREATE OR REPLACE BRANCH with a bad version leaves the branch intact") {
    import spark.implicits._
    val (t, abs) = fresh("replace_branch_bad")
    val g = s"graft.`$abs`"
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    spark.sql(s"ALTER TABLE $g CREATE BRANCH audit")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g CREATE OR REPLACE BRANCH audit " +
        "AS OF VERSION 99")
    }
    assert(e.getMessage.contains("99"))
    assert(Versioned.branches(spark, t).contains("audit"),
      "a failed replace must not destroy the branch it was moving")
  }

  test("VACUUM SQL spelling expires history, honors RETAIN and pins") {
    import spark.implicits._
    val (t, abs) = fresh("sql_vacuum")
    val g = s"graft.`$abs`"
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    (2 to 5).foreach(i => Versioned.append(Seq(Tuple1(i)).toDF("x"), t))
    assert(Versioned.versions(spark, t).size == 5)
    // RETAIN keeps the newest N unpinned snapshots
    val kept = spark.sql(s"VACUUM $g RETAIN 3 VERSIONS")
      .head().getInt(0)
    assert(kept == 3 && Versioned.versions(spark, t) == Seq(3, 4, 5))
    // a tag pins its snapshot through the default full vacuum
    spark.sql(s"ALTER TABLE $g CREATE TAG keepme AS OF VERSION 3")
    assert(spark.sql(s"VACUUM $g").head().getInt(0) == 2)
    assert(Versioned.versions(spark, t) == Seq(3, 5))
    assert(spark.sql(s"SELECT count(*) FROM $g VERSION AS OF 'keepme'")
      .head().getLong(0) == 3)
    assert(spark.table(g).count() == 5)
  }

  test("remove_orphan_files sweeps aged debris, spares live and fresh") {
    import spark.implicits._
    val (t, abs) = fresh("proc_orphans")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    Versioned.append(Seq((3, "c")).toDF("id", "v"), t)
    // fabricate crash debris: a loser's stage dir, a reclaim dir, a
    // torn tmp at root and inside a published root — all AGED
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    def aged(path: String, isDir: Boolean): java.io.File = {
      val fl = new java.io.File(path)
      if (isDir) { fl.mkdirs()
        val inner = new java.io.File(fl, "part-000.parquet")
        inner.createNewFile(); inner.setLastModified(old)
      } else { fl.getParentFile.mkdirs(); fl.createNewFile() }
      fl.setLastModified(old); fl
    }
    val s1 = aged(s"$t/.stage-v9-deadbeef", isDir = true)
    val r1 = aged(s"$t/.reclaim-v9-cafe", isDir = true)
    val t1 = aged(s"$t/._changefeed_cursor.tmp-1", isDir = false)
    val t2 = aged(s"$t/v=1/._stats.tsv.tmp-2", isDir = false)
    // fresh debris must survive (could be a live commit)
    val freshStage = new java.io.File(s"$t/.stage-v9-fresh")
    freshStage.mkdirs()
    // dry_run counts the sweep without touching anything
    val wouldRemove = spark.sql(s"CALL graft.system.remove_orphan_files(" +
      s"table => '$abs', older_than_hours => 24, dry_run => true)")
      .head().getInt(0)
    assert(wouldRemove == 4, s"expected 4 counted, got $wouldRemove")
    assert(s1.exists && r1.exists && t1.exists && t2.exists,
      "dry run must delete nothing")
    val removed = spark.sql(s"CALL graft.system.remove_orphan_files(" +
      s"table => '$abs', older_than_hours => 24)").head().getInt(0)
    assert(removed == 4, s"expected 4 swept, got $removed")
    assert(!s1.exists && !r1.exists && !t1.exists && !t2.exists)
    assert(freshStage.exists, "fresh debris must not be swept")
    // the table is untouched and fully readable
    assert(Versioned.read(spark, t).count() == 3)
    assert(Versioned.read(spark, t, Some(1)).count() == 2)
    // idempotent
    assert(spark.sql(s"CALL graft.system.remove_orphan_files(" +
      s"table => '$abs', older_than_hours => 24)").head().getInt(0) == 0)
    org.apache.commons.io.FileUtils.deleteQuietly(freshStage)
  }

  test("clone_table: independent bytes, properties and spec carry, " +
      "refusals inherited from the export path") {
    import spark.implicits._
    val (src, srcAbs) = fresh("clone_src")
    val (dst, dstAbs) = fresh("clone_dst")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), src)
    Versioned.append(Seq((3, "c")).toDF("id", "v"), src)
    Versioned.setProperties(spark, src,
      set = Map("write.target-file-size-bytes" -> "1048576"))
    val v = spark.sql(s"CALL graft.system.clone_table(" +
      s"source => '$srcAbs', dest => '$dstAbs')").head().getInt(0)
    assert(v >= 1)
    // same rows, independent lineage
    assert(Versioned.read(spark, dst).orderBy("id").collect().toSeq ==
      Versioned.read(spark, src, Some(3)).orderBy("id").collect().toSeq)
    // properties carried
    assert(Versioned.properties(spark, dst)
      .get("write.target-file-size-bytes").contains("1048576"))
    // the clone OWNS its bytes: vacuuming the source to nothing and
    // deleting its directory leaves the clone fully readable
    Versioned.append(Seq((4, "d")).toDF("id", "v"), src)
    Versioned.vacuum(spark, src, keep = 1)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    assert(Versioned.read(spark, dst).count() == 3)
    // divergence after clone: writes to one never touch the other
    Versioned.append(Seq((9, "z")).toDF("id", "v"), dst)
    assert(Versioned.read(spark, dst).count() == 4)
    // clone target must be empty
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.clone_table(" +
        s"source => '$dstAbs', dest => '$dstAbs')") }
    assert(e.getMessage.contains("already has commits") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("already has commits")))
    // a source with live MoR tombstones refuses (the export contract)
    val (src2, src2Abs) = fresh("clone_src_mor")
    val (dst2, dst2Abs) = fresh("clone_dst_mor")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), src2)
    Versioned.deleteRows(spark, src2, Seq(Tuple1(1)).toDF("id"))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graft.system.clone_table(" +
        s"source => '$src2Abs', dest => '$dst2Abs')") }
    assert(e2.getMessage.contains("tombstone") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("tombstone")))
  }

  test("create_changelog_view registers a SQL-queryable change view") {
    import spark.implicits._
    val (t, abs) = fresh("proc_changelog")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    Versioned.append(Seq((2, "b")).toDF("id", "v"), t)
    Versioned.applyChanges(spark, t,
      upserts = Seq((3, "c")).toDF("id", "v"),
      deleteKeys = Seq(Tuple1(1)).toDF("id"), key = "id")
    val row = spark.sql("CALL graft.system.create_changelog_view(" +
      s"table => '$abs', from_version => 1, view_name => 'chg_v')")
      .head()
    assert(row.getString(0) == "chg_v")
    assert(row.getLong(1) == 3L) // inserts 2,3 + delete of key 1
    // the registered view answers plain SQL over the change columns
    val byType = spark.sql("SELECT _change_type, count(*) FROM chg_v " +
      "GROUP BY 1 ORDER BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 1L, "insert" -> 2L))
    // default to_version = current; default view name derives from
    // the table directory
    val auto = spark.sql("CALL graft.system.create_changelog_view(" +
      s"table => '$abs', from_version => 2)").head()
    assert(auto.getString(0).endsWith("_changes_2_3"))
    assert(spark.table(auto.getString(0)).count() == auto.getLong(1))
  }

  test("refresh_derived: pure-SQL incremental materialized view") {
    import spark.implicits._
    val (src, srcAbs) = fresh("proc_refresh_src")
    val (dst, dstAbs) = fresh("proc_refresh_dst")
    Versioned.commit(Seq((1L, 20L), (2L, 5L), (3L, 30L))
      .toDF("k", "v"), src)
    val q = "SELECT k, v * 2 AS w FROM __source__ WHERE v >= 10"
    def call() = spark.sql("CALL graft.system.refresh_derived(" +
      s"source => '$srcAbs', dest => '$dstAbs', key => 'k', " +
      s"query => '$q')").head()
    // bootstrap = full build through the SQL transform
    val boot = call()
    assert((boot.getInt(0), boot.getInt(1)) == ((0, 1)))
    assert(Versioned.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 40L), (3L, 60L)))
    // source advances: one CDC batch crossing the WHERE boundary both
    // ways (2 rises, 3 falls) and deleting key 1 — one refresh lands it
    Versioned.applyChanges(spark, src,
      upserts = Seq((2L, 50L), (3L, 4L)).toDF("k", "v"),
      deleteKeys = Seq(Tuple1(1L)).toDF("k"), key = "k")
    val adv = call()
    assert((adv.getInt(0), adv.getInt(1)) == ((1, 2)))
    assert(Versioned.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 100L)))
    // a query without the __source__ placeholder refuses
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.refresh_derived(" +
        s"source => '$srcAbs', dest => '$dstAbs', key => 'k', " +
        "query => 'SELECT 1 AS k')").collect())
    assert(e.getMessage.contains("__source__"))
  }

  test("refresh_agg: pure-SQL incremental aggregate view") {
    import spark.implicits._
    val (src, srcAbs) = fresh("proc_aggmv_src")
    val (dst, dstAbs) = fresh("proc_aggmv_dst")
    Versioned.commit(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "g", "v"), src)
    def call() = spark.sql("CALL graft.system.refresh_agg(" +
      s"source => '$srcAbs', dest => '$dstAbs', row_key => 'id', " +
      "group_by => 'g', value => 'v')").head()
    val boot = call()
    assert((boot.getInt(0), boot.getInt(1)) == ((0, 1)))
    assert(Versioned.read(spark, dst).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq(("a", 30L, 2L), ("b", 5L, 1L)))
    // group migration + death in one batch, advanced through SQL
    Versioned.applyChanges(spark, src,
      upserts = Seq((1L, "c", 10L)).toDF("id", "g", "v"),
      deleteKeys = Seq(Tuple1(3L)).toDF("id"), key = "id")
    val adv = call()
    assert((adv.getInt(0), adv.getInt(1)) == ((1, 2)))
    assert(Versioned.read(spark, dst).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq ==
      Seq(("a", 20L, 1L), ("c", 10L, 1L)))
    // the exact-distinct measure family through pure SQL: cd_u is
    // maintained by affected-group recompute — a duplicate insert
    // must not inflate it
    val (src2, src2Abs) = fresh("proc_aggmv_src2")
    val (dst2, dst2Abs) = fresh("proc_aggmv_dst2")
    Versioned.commit(Seq((1L, "a", "u1", 10L), (2L, "a", "u1", 20L),
      (3L, "b", "u2", 5L)).toDF("id", "g", "u", "v"), src2)
    def call2() = spark.sql("CALL graft.system.refresh_agg(" +
      s"source => '$src2Abs', dest => '$dst2Abs', row_key => 'id', " +
      "group_by => 'g', value => 'v', exact_distinct => 'u')").head()
    call2()
    assert(Versioned.read(spark, dst2).columns.toSeq ==
      Seq("g", "sum_v", "cnt_v", "n_rows", "cd_u"))
    Versioned.append(Seq((4L, "a", "u1", 1L), (5L, "a", "u3", 2L))
      .toDF("id", "g", "u", "v"), src2)
    call2()
    assert(Versioned.read(spark, dst2).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(4))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
  }

  test("refresh_join: pure-SQL incremental join view over " +
      "__fact__/__dim__ placeholders, both changelogs propagate") {
    import spark.implicits._
    val (fact, factAbs) = fresh("proc_jmv_fact")
    val (dim, dimAbs) = fresh("proc_jmv_dim")
    val (dst, dstAbs) = fresh("proc_jmv_dst")
    Versioned.commit(Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("id", "fk", "v"), fact)
    Versioned.commit(Seq(("a", "A!"), ("b", "B!")).toDF("dk", "label"),
      dim)
    def call() = spark.sql("CALL graft.system.refresh_join(" +
      s"fact => '$factAbs', dim => '$dimAbs', dest => '$dstAbs', " +
      "key => 'id', fk => 'fk', dim_key => 'dk', " +
      "query => 'SELECT f.id, d.label, f.v FROM __fact__ f JOIN " +
      "__dim__ d ON f.fk = d.dk')").head()
    val boot = call()
    assert(boot.toSeq == Seq(0, 1, 0, 1))
    assert(Versioned.read(spark, dst).count() == 2)
    // a fact insert AND a dim relabel advance in one call
    Versioned.append(Seq((3L, "b", 30L)).toDF("id", "fk", "v"), fact)
    Versioned.upsert(spark, dim,
      Seq(("a", "A2")).toDF("dk", "label"), "dk")
    val adv = call()
    assert(adv.toSeq == Seq(1, 2, 1, 2))
    val got = Versioned.read(spark, dst).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "A2"), (2L, "B!"), (3L, "B!")))
    // the placeholder contract refuses a query missing either marker
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.refresh_join(" +
        s"fact => '$factAbs', dim => '$dimAbs', dest => '$dstAbs', " +
        "key => 'id', fk => 'fk', dim_key => 'dk', " +
        "query => 'SELECT 1')").collect())
    assert(e.getMessage.contains("__fact__"))
    // nondeterministic queries refuse on the PROC spelling too — the
    // same silent-divergence contract CREATE MATERIALIZED VIEW gates
    val (_, dst2Abs) = fresh("proc_jmv_dst2")
    val e2 = intercept[Exception](spark.sql(
      "CALL graft.system.refresh_join(" +
        s"fact => '$factAbs', dim => '$dimAbs', dest => '$dst2Abs', " +
        "key => 'id', fk => 'fk', dim_key => 'dk', " +
        "query => 'SELECT f.id, d.label FROM __fact__ f JOIN " +
        "__dim__ d ON f.fk = d.dk WHERE rand() < 0.5')").collect())
    assert(e2.getMessage.contains("nondeterministic"))
    val (_, dst3Abs) = fresh("proc_jmv_dst3")
    val e3 = intercept[Exception](spark.sql(
      "CALL graft.system.refresh_derived(" +
        s"source => '$factAbs', dest => '$dst3Abs', key => 'id', " +
        "query => 'SELECT id, rand() AS r FROM __source__')")
      .collect())
    assert(e3.getMessage.contains("nondeterministic"))
  }

  test("ingest_vectors: the vector crawl loop from pure SQL; " +
      "ingest_dedup allow_reingest replays idempotently") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.Similarity
    val idx = "target/tmp/proc-ivf-ingest"
    val batchT = "target/tmp/proc-ivf-batch"
    Seq(idx, s"$idx.centroids", s"$idx.tombs", batchT).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    Similarity.buildIvfIndex(spark, sf, idx, quantized = true)
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val cid = emb.filter(col("vec_id") >= Similarity.NumQueries)
      .select("vec_id").orderBy("vec_id").limit(1).collect()
      .map(_.getLong(0))
    // one twin of a standing corpus vector (drops) + one novel
    // vector (query 0's embedding, far from the corpus — kept)
    def reId(src: Long, id: Long) = emb.filter(col("vec_id") === src)
      .select(lit(id).as("vec_id"), col("embedding"))
    Versioned.commit(
      reId(cid(0), 8000000L).unionAll(reId(0L, 8100000L)), batchT)
    val idxAbs = new java.io.File(idx).getAbsolutePath
    val bAbs = new java.io.File(batchT).getAbsolutePath
    val r = spark.sql("CALL graft.system.ingest_vectors(" +
      s"index => '$idxAbs', batch => '$bAbs')").head()
    assert((r.getLong(0), r.getLong(1)) == ((1L, 1L)), s"got $r")
    // replay: identity drops BOTH (the novel one is now standing)
    val r2 = spark.sql("CALL graft.system.ingest_vectors(" +
      s"index => '$idxAbs', batch => '$bAbs')").head()
    assert((r2.getLong(0), r2.getLong(1)) == ((0L, 2L)), s"got $r2")
    // — the text twin: allow_reingest replays a landed batch as
    // kept-by-identity instead of refusing
    val didx = "target/tmp/proc-dedup-re"
    val dbatch = "target/tmp/proc-dedup-re-batch"
    Seq(didx, s"$didx.sigs", s"$didx.tombs", dbatch).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    graft.operators.Dedup.buildDedupIndexOf(
      graft.sources.Tables.load(spark, sf, "documents")
        .filter(col("doc_id") < 300), didx)
    Versioned.commit(
      Seq((9000000L, "wholly novel replay fixture text abc def"))
        .toDF("doc_id", "text"), dbatch)
    val diAbs = new java.io.File(didx).getAbsolutePath
    val dbAbs = new java.io.File(dbatch).getAbsolutePath
    val d1 = spark.sql("CALL graft.system.ingest_dedup(" +
      s"index => '$diAbs', batch => '$dbAbs')").head()
    assert((d1.getLong(0), d1.getLong(1)) == ((1L, 0L)))
    val refuse = intercept[Exception](spark.sql(
      "CALL graft.system.ingest_dedup(" +
        s"index => '$diAbs', batch => '$dbAbs')").head())
    assert(refuse.getMessage.contains("allowReingest"))
    val d2 = spark.sql("CALL graft.system.ingest_dedup(" +
      s"index => '$diAbs', batch => '$dbAbs', " +
      "allow_reingest => 'true')").head()
    assert((d2.getLong(0), d2.getLong(1)) == ((1L, 0L)),
      "kept-by-identity: the replayed doc reports kept, appends nothing")
  }

  test("unknown procedures and namespaces refuse with the catalog list") {
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.nonsense()")
    }
    assert(e.getMessage.contains("unknown procedure") ||
      e.getMessage.contains("nonsense"))
    intercept[Exception] {
      spark.sql("CALL graft.other.compact(table => '/tmp/x')")
    }
  }
}
