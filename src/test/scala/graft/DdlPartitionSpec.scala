package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.sources.Versioned

/** DDL-declared partitioning (`CREATE TABLE … PARTITIONED BY`), the
  * default-spec inheritance it seeds, partition-spec evolution
  * ([[Versioned.setSpec]] / `CALL graft.system.set_spec`), and the
  * `.partitions` metadata table. The reference's own DDL is exactly
  * this shape (csv_to_ice.py:54 `PARTITIONED BY (pickup_date)`). */
class DdlPartitionSpec extends SparkSpec {
  private val work = "target/tmp/ddl-partition-spec"

  private def fresh(name: String): (String, String) = {
    val t = s"$work/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    (t, s"graft.`${new java.io.File(t).getAbsolutePath}`")
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: inner.flatMap(nodes)
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    nodes(df.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
  }

  test("CREATE TABLE PARTITIONED BY days() seeds the default spec") {
    import spark.implicits._
    val (t, g) = fresh("create_days")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    // the empty create committed the spec, not data
    assert(Versioned.currentVersion(spark, t) == 1)
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Days("ts")))
    // plain INSERT INTO inherits the declared layout
    (0 until 96).map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("ddl_days_src")
    spark.sql(s"INSERT INTO $g SELECT id, ts FROM ddl_days_src")
    assert(spark.table(g).columns.toSeq == Seq("id", "ts"))
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 96)
    // physically day-partitioned under the hidden column
    assert(new java.io.File(s"$t/v=2/gpart_days_ts=2024-06-02")
      .isDirectory)
    // readWhere on the SOURCE column prunes whole day directories
    val rw = Versioned.readWhere(spark, t,
      "ts", "2024-06-02 03:00:00", "2024-06-02 20:00:00")
    assert(rw.select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      (27 to 44))
    val plan = rw.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("gpart_days_ts"))
    assert(scannedFiles(rw) < scannedFiles(Versioned.read(spark, t)),
      "expected day-directory pruning from the DDL-declared spec")
  }

  test("identity partitioning: the reference's PARTITIONED BY (col) DDL") {
    import spark.implicits._
    val (t, g) = fresh("create_identity")
    // csv_to_ice.py:54: PARTITIONED BY (pickup_date) — a bare column
    spark.sql(s"CREATE TABLE $g (trip_id INT, pickup_date DATE, " +
      s"fare DOUBLE) PARTITIONED BY (pickup_date)")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Identity("pickup_date")))
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    days.zipWithIndex.flatMap { case (d, i) =>
      (0 until 10).map(j =>
        (i * 10 + j, java.sql.Date.valueOf(d), 10.0 + j))
    }.toDF("trip_id", "pickup_date", "fare")
      .createOrReplaceTempView("ddl_id_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_id_src")
    // the source column survives as a NORMAL data column
    assert(spark.table(g).columns.toSeq ==
      Seq("trip_id", "pickup_date", "fare"))
    assert(spark.sql(s"SELECT count(*) FROM $g " +
      "WHERE pickup_date = DATE'2024-01-02'").head().getLong(0) == 10)
    // hive layout on the hidden identity copy
    assert(new java.io.File(s"$t/v=2/gpart_id_pickup_date=2024-01-02")
      .isDirectory)
    val rw = Versioned.readWhere(spark, t, "pickup_date",
      java.sql.Date.valueOf("2024-01-02"),
      java.sql.Date.valueOf("2024-01-02"))
    assert(rw.count() == 10)
    assert(scannedFiles(rw) < scannedFiles(Versioned.read(spark, t)),
      "expected identity partition pruning")
    // identity on a timestamp refuses at DDL time (zone-ambiguous)
    val (_, g2) = fresh("create_identity_ts")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g2 (id INT, ts TIMESTAMP) " +
        "PARTITIONED BY (ts)")
    }
    assert(e.getMessage.contains("zone-ambiguous") ||
      e.getMessage.contains("days()"))
  }

  test("CTAS with PARTITIONED BY partitions the write and persists the spec") {
    import spark.implicits._
    val (t, g) = fresh("ctas_bucket")
    (1 to 400).map(i => (i, s"r$i")).toDF("k", "v")
      .createOrReplaceTempView("ddl_ctas_src")
    spark.sql(s"CREATE TABLE $g PARTITIONED BY (bucket(8, k)) " +
      "AS SELECT k, v FROM ddl_ctas_src")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Bucket(8, "k")))
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 400)
    // point lookups prune to one bucket
    val point = Versioned.readWhere(spark, t, "k", 37, 37)
    assert(point.select("v").collect().map(_.getString(0)).toSeq ==
      Seq("r37"))
    assert(scannedFiles(point) < scannedFiles(Versioned.read(spark, t)))
    // an INSERT keeps bucketing without restating the transform
    Seq((401, "r401")).toDF("k", "v")
      .createOrReplaceTempView("ddl_ctas_more")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_ctas_more")
    assert(Versioned.readWhere(spark, t, "k", 401, 401).count() == 1)
    // an empty CTAS result with a declared spec still publishes a
    // readable (schema-bearing) table
    val (t2, g2) = fresh("ctas_empty")
    spark.sql(s"CREATE TABLE $g2 PARTITIONED BY (bucket(4, k)) " +
      "AS SELECT k, v FROM ddl_ctas_src WHERE k < 0")
    assert(spark.sql(s"SELECT count(*) FROM $g2").head().getLong(0) == 0)
    assert(Versioned.currentTransform(spark, t2)
      .contains(Versioned.Transform.Bucket(4, "k")))
  }

  test("REPLACE declares the new spec; absence means unpartitioned") {
    import spark.implicits._
    val (t, g) = fresh("replace_spec")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    assert(Versioned.currentTransform(spark, t).isDefined)
    Seq((1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("ddl_rep_src")
    // REPLACE without PARTITIONED BY → unpartitioned (Iceberg REPLACE
    // semantics: the declaration IS the spec)
    spark.sql(s"CREATE OR REPLACE TABLE $g " +
      "AS SELECT id, ts FROM ddl_rep_src")
    assert(Versioned.currentTransform(spark, t).isEmpty)
    // …and REPLACE with one installs it
    spark.sql(s"CREATE OR REPLACE TABLE $g PARTITIONED BY (days(ts)) " +
      "AS SELECT id, ts FROM ddl_rep_src")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Days("ts")))
    // prior snapshots stayed time-travelable through both replaces
    assert(spark.sql(s"SELECT count(*) FROM $g VERSION AS OF 1")
      .head().getLong(0) == 0)
    // multi-field specs refuse loudly (single-transform engine spec)
    val (_, g3) = fresh("replace_multi")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g3 (a INT, ts TIMESTAMP_NTZ) " +
        "PARTITIONED BY (days(ts), bucket(4, a))")
    }
    assert(e.getMessage.contains("one partition field"))
  }

  test("spec evolution: old files keep their layout, future writes adopt the new") {
    import spark.implicits._
    val (t, g) = fresh("evolve_spec")
    def batch(r: Range) = r.map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00"))).toDF("id", "ts")
    // epoch 1: day-partitioned
    Versioned.commit(batch(0 until 48), t,
      transform = Some(Versioned.Transform.Days("ts")))
    // evolve to bucket(4, id) — metadata-only commit
    val v2 = Versioned.setSpec(spark, t,
      Some(Versioned.Transform.Bucket(4, "id")))
    assert(v2 == 2)
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Bucket(4, "id")))
    // content unchanged by the evolution commit
    assert(Versioned.read(spark, t).count() == 48)
    // epoch 2: a plain SQL INSERT adopts the NEW spec
    batch(48 until 96).createOrReplaceTempView("ddl_evo_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_evo_src")
    val v3 = Versioned.currentVersion(spark, t)
    assert(new java.io.File(s"$t/v=$v3").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_bucket4_id=")))
    // pre-evolution files still day-prune; post-evolution files still
    // bucket-prune — one table, mixed layouts, both honest
    val dayQ = Versioned.readWhere(spark, t,
      "ts", "2024-06-01 03:00:00", "2024-06-01 05:00:00")
    assert(dayQ.select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      (3 to 5))
    val pointQ = Versioned.readWhere(spark, t, "id", 60, 60)
    assert(pointQ.count() == 1)
    assert(scannedFiles(pointQ) < scannedFiles(Versioned.read(spark, t)),
      "expected bucket pruning on post-evolution files")
    // clearing the spec stops inheritance (and does NOT resurrect the
    // older days(ts) spec buried deeper in the manifest)
    Versioned.setSpec(spark, t, None)
    assert(Versioned.currentTransform(spark, t).isEmpty)
    Seq((999, java.sql.Timestamp.valueOf("2024-06-09 00:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("ddl_evo_tail")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_evo_tail")
    val v6 = Versioned.currentVersion(spark, t)
    assert(!new java.io.File(s"$t/v=$v6").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_")))
    assert(Versioned.read(spark, t).count() == 97)
  }

  test("programmatic append inherits the declared spec like SQL INSERT") {
    import spark.implicits._
    val (t, g) = fresh("append_inherit")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    // a plain append (no transform argument) adopts the table's spec
    Versioned.append((0 until 48).map(h => (h, java.sql.Timestamp
      .valueOf(f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts"), t)
    assert(new java.io.File(s"$t/v=2/gpart_days_ts=2024-06-02")
      .isDirectory)
    // a frame MISSING the spec's source column appends unpartitioned
    // after a column-compatible evolution — degrade, never fail: here
    // just assert the explicit override still wins
    Versioned.append(Seq((99, java.sql.Timestamp
      .valueOf("2024-06-05 00:00:00"))).toDF("id", "ts"), t,
      transform = Some(Versioned.Transform.Bucket(2, "id")))
    val v3 = Versioned.currentVersion(spark, t)
    assert(new java.io.File(s"$t/v=$v3").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_bucket2_id=")))
    assert(Versioned.read(spark, t).count() == 49)
  }

  test("bare compact keeps the declared layout; calendar specs refuse non-temporal sources") {
    import spark.implicits._
    val (t, g) = fresh("compact_inherit")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    (0 until 48).map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("ddl_cmp_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_cmp_src")
    // a BARE programmatic compact must not flatten the table or
    // erase the declared spec for future writes
    val v3 = Versioned.compact(spark, t)
    assert(new java.io.File(s"$t/v=$v3").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_days_ts=")))
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Days("ts")))
    assert(Versioned.read(spark, t).count() == 48)
    // post-compact pruning still fires on the rewritten files
    val rw = Versioned.readWhere(spark, t,
      "ts", "2024-06-01 03:00:00", "2024-06-01 05:00:00")
    assert(rw.select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      (3 to 5))
    // bare compactSmall (binpack) keeps the layout and the spec too —
    // packing the drip-fed files must not write them flat, even when
    // the packed output replaces every _tspec-carrying entry
    val (t2b, _) = fresh("binpack_inherit")
    def tiny(r: Range) = r.map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00"))).toDF("id", "ts")
    Versioned.commit(tiny(0 until 24), t2b,
      transform = Some(Versioned.Transform.Days("ts")))
    Versioned.append(tiny(24 until 48), t2b) // inherits
    val vPack = Versioned.compactSmall(spark, t2b)
    assert(vPack > 2)
    assert(new java.io.File(s"$t2b/v=$vPack").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_days_ts=")))
    assert(Versioned.currentTransform(spark, t2b)
      .contains(Versioned.Transform.Days("ts")))
    assert(Versioned.read(spark, t2b).count() == 48)
    // calendar transforms on a non-temporal source refuse at DDL time
    // (an INT would silently land every row in 1970 via epoch cast)
    val (_, g2) = fresh("days_on_int")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $g2 (id INT, v STRING) " +
        "PARTITIONED BY (days(id))")
    }
    assert(e.getMessage.contains("DATE/TIMESTAMP"))
    // PARTITIONED BY resolves the source case-insensitively, like
    // every other identifier in the statement
    val (t3, g3) = fresh("case_insensitive")
    spark.sql(s"CREATE TABLE $g3 (Trip_Id INT, Pickup_Date DATE) " +
      "PARTITIONED BY (pickup_date)")
    assert(Versioned.currentTransform(spark, t3)
      .contains(Versioned.Transform.Identity("Pickup_Date")))
  }

  test("CALL graft.system.set_spec drives evolution from SQL") {
    import spark.implicits._
    val (t, g) = fresh("call_set_spec")
    Versioned.commit((1 to 100).map(i => (i, s"v$i")).toDF("k", "v"), t)
    val abs = new java.io.File(t).getAbsolutePath
    val out = spark.sql(
      s"CALL graft.system.set_spec(table => '$abs', spec => 'bucket(4,k)')")
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2))
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Bucket(4, "k")))
    spark.sql(s"INSERT INTO $g VALUES (101, 'v101')")
    assert(new java.io.File(s"$t/v=3").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("gpart_bucket4_k=")))
    // clear via the sentinel
    spark.sql(
      s"CALL graft.system.set_spec(table => '$abs', spec => 'none')")
    assert(Versioned.currentTransform(spark, t).isEmpty)
    // a bad spec string refuses loudly
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.set_spec(table => '$abs', " +
        "spec => 'wibble(ts)')")
    }
    assert(e.getMessage.contains("unknown transform"))
  }

  test("identity on numeric-looking strings never drops rows to type inference") {
    import spark.implicits._
    val (t, _) = fresh("identity_lossy")
    // all-numeric path values ('01', '1', '20') make hive inference
    // type the partition column INT; '01' then renders back as '1',
    // so a naive cast-through predicate would silently drop the row
    Versioned.commit(
      Seq(("01", "a"), ("1", "b"), ("20", "c")).toDF("k", "v"), t,
      transform = Some(Versioned.Transform.Identity("k")))
    val hit = Versioned.readWhere(spark, t, "k", "01", "01")
      .select("v").collect().map(_.getString(0)).toSeq
    assert(hit == Seq("a"),
      "identity readWhere must match the written string exactly")
    // and the sibling value "1" is still distinct
    assert(Versioned.readWhere(spark, t, "k", "1", "1")
      .select("v").collect().map(_.getString(0)).toSeq == Seq("b"))
    // a NON-numeric mix infers string and keeps real pruning: the
    // predicate still applies (and stays correct)
    val t2 = s"$work/identity_lossy2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t2))
    Versioned.commit(
      Seq(("01", "a"), ("x9", "b")).toDF("k", "v"), t2,
      transform = Some(Versioned.Transform.Identity("k")))
    val rw = Versioned.readWhere(spark, t2, "k", "01", "01")
    assert(rw.select("v").collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(rw.queryExecution.executedPlan.toString
      .contains("gpart_id_k"), "string-inferred identity roots keep " +
        "their partition-pruning predicate")
  }

  test("ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD drives evolution") {
    import spark.implicits._
    val (t, g) = fresh("alter_field")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ)")
    assert(Versioned.currentTransform(spark, t).isEmpty)
    // ADD: the Iceberg spelling, lowered onto setSpec
    spark.sql(s"ALTER TABLE $g ADD PARTITION FIELD days(ts)")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Days("ts")))
    (0 until 48).map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("alter_field_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM alter_field_src")
    assert(new java.io.File(s"$t/v=3/gpart_days_ts=2024-06-02")
      .isDirectory)
    // single-field specs: a second ADD refuses with the REPLACE hint
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g ADD PARTITION FIELD months(ts)")
    }
    assert(dup.getMessage.contains("REPLACE"))
    // REPLACE names the current field and swaps in one commit;
    // internal whitespace is legal (`bucket(8, id)`)
    spark.sql(
      s"ALTER TABLE $g REPLACE PARTITION FIELD days(ts) WITH bucket(8, id)")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Bucket(8, "id")))
    // DROP must name the live field (Iceberg's cannot-find contract)
    val miss = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g DROP PARTITION FIELD days(ts)")
    }
    assert(miss.getMessage.contains("bucket"))
    spark.sql(s"ALTER TABLE $g DROP PARTITION FIELD bucket(8,id)")
    assert(Versioned.currentTransform(spark, t).isEmpty)
    // old files kept their day layout; new writes land unpartitioned
    spark.sql(s"INSERT INTO $g VALUES (99, TIMESTAMP_NTZ'2024-06-09 01:00:00')")
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 49)
    // a bare column is identity shorthand
    spark.sql(s"ALTER TABLE $g ADD PARTITION FIELD id")
    assert(Versioned.currentTransform(spark, t)
      .contains(Versioned.Transform.Identity("id")))
    // Spark's own ALTER TABLE grammar still reaches the delegate
    spark.sql(s"ALTER TABLE $g ADD COLUMNS (note STRING)")
    assert(spark.table(g).columns.contains("note"))
  }

  test("DESCRIBE and SHOW CREATE TABLE surface the declared spec") {
    import spark.implicits._
    val (t, g) = fresh("describe_spec")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    val show = spark.sql(s"SHOW CREATE TABLE $g").head().getString(0)
    assert(show.contains("PARTITIONED BY") && show.contains("days(ts)"),
      s"SHOW CREATE TABLE must print the declared spec, got:\n$show")
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $g").collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)}").mkString("\n")
    assert(desc.contains("days(ts)"),
      s"DESCRIBE EXTENDED must print the declared spec, got:\n$desc")
    // spec evolution updates the surfaced declaration
    spark.sql(
      s"ALTER TABLE $g REPLACE PARTITION FIELD days(ts) WITH bucket(4, id)")
    val show2 = spark.sql(s"SHOW CREATE TABLE $g").head().getString(0)
    assert(show2.contains("bucket(4, id)"),
      s"evolved spec must surface, got:\n$show2")
    spark.sql(s"ALTER TABLE $g DROP PARTITION FIELD bucket(4, id)")
    val show3 = spark.sql(s"SHOW CREATE TABLE $g").head().getString(0)
    assert(!show3.contains("PARTITIONED BY"),
      s"a cleared spec must not print PARTITIONED BY, got:\n$show3")
    assert(Versioned.currentVersion(spark, t) == 3)
  }

  test(".partitions metadata table rolls up rows/files/bytes per value") {
    import spark.implicits._
    val (t, g) = fresh("partitions_meta")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    (0 until 72).map(h => (h, java.sql.Timestamp.valueOf(
      f"2024-06-${1 + h / 24}%02d ${h % 24}%02d:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("ddl_pmeta_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM ddl_pmeta_src")
    // row counts must come from the commit-time count sidecars —
    // O(versions) driver I/O — not from per-file footer opens, which
    // would be O(files) sequential driver reads at warehouse scale
    val footerOpens0 = Versioned.footerOpenCount.get()
    val allRows = spark.sql(
        s"SELECT * FROM $g.partitions ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the empty CREATE's schema-bearing file rolls up under NULL with
    // zero rows — an honest dead-file indicator for compaction
    assert(allRows.head._1 == null && allRows.head._3 == 0L)
    // three days, 24 rows each; partition renders prefix-stripped
    val rows = allRows.filter(_._1 != null)
    assert(rows.map(_._1).toSeq == Seq(
      "days_ts=2024-06-01", "days_ts=2024-06-02", "days_ts=2024-06-03"))
    assert(rows.map(_._3).toSeq == Seq(24L, 24L, 24L))
    assert(rows.forall(_._2 >= 1L)) // at least one file per day
    // the rollup agrees with a groupBy over the actual read
    val byDay = spark.table(g)
      .groupBy(to_date(col("ts")).as("d")).count()
      .orderBy("d").collect().map(_.getLong(1)).toSeq
    assert(rows.map(_._3).toSeq == byDay)
    // bytes are positive and sum to the data file inventory
    val metaBytes = spark.sql(
      s"SELECT sum(total_bytes) FROM $g.partitions").head().getLong(0)
    val fileBytes = Versioned.files(spark, t).filter(col("kind") === "data")
      .agg(sum("size_bytes")).head().getLong(0)
    assert(metaBytes == fileBytes)
    // VERSION AS OF pins the inventory: v1 (empty create) has no
    // partition values, only the (possibly empty) unpartitioned root
    val v1 = spark.sql(s"SELECT * FROM $g.partitions VERSION AS OF 1")
      .collect()
    assert(v1.forall(_.getString(0) == null))
    // mixed layouts surface side by side after an unpartitioned append
    Versioned.setSpec(spark, t, None)
    spark.sql(s"INSERT INTO $g VALUES " +
      "(999, TIMESTAMP_NTZ'2024-06-09 00:00:00')")
    val mixed = spark.sql(s"SELECT partition, row_count " +
        s"FROM $g.partitions ORDER BY partition NULLS FIRST")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(mixed.head._1 == null)
    assert(mixed.map(_._2).sum == 73L)
    assert(Versioned.footerOpenCount.get() == footerOpens0,
      "stats-carrying snapshots must serve .partitions row counts " +
        "from the sidecar, never from driver-side footer opens")
  }

  test("bloom-filter table property writes parquet footer blooms " +
      "for exactly the declared columns") {
    val (t, g) = fresh("bloom_prop")
    spark.sql(s"CREATE TABLE $g (id BIGINT, v STRING) TBLPROPERTIES (" +
      "'write.parquet.bloom-filter-enabled.column.id' = 'true', " +
      "'write.parquet.bloom-filter-fpp.column.id' = '0.05')")
    spark.sql(s"INSERT INTO $g VALUES " +
      (1 to 200).map(i => s"($i, 'x$i')").mkString(", "))
    val vN = Versioned.currentVersion(spark, t)
    import scala.jdk.CollectionConverters._
    def bloomOffsets(dir: String): Seq[(String, Long)] = {
      val files = new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.flatMap { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          new org.apache.parquet.io.LocalInputFile(f.toPath))
        try r.getRowGroups.get(0).getColumns.asScala.toSeq.map(c =>
          c.getPath.toDotString -> c.getBloomFilterOffset)
        finally r.close()
      }
    }
    val offs = bloomOffsets(s"$t/v=$vN")
    // the declared column carries a bloom in every file; others don't
    assert(offs.filter(_._1 == "id").forall(_._2 >= 0),
      s"id must carry a footer bloom: $offs")
    assert(offs.filter(_._1 == "v").forall(_._2 < 0),
      s"undeclared column must not: $offs")
    // the property rides APPENDS and rewrites, not just the create
    spark.sql(s"INSERT INTO $g VALUES (1000, 'y')")
    val v2 = Versioned.currentVersion(spark, t)
    assert(bloomOffsets(s"$t/v=$v2").filter(_._1 == "id")
      .forall(_._2 >= 0))
    // probes through the bloom'd files stay correct
    assert(spark.sql(s"SELECT count(*) FROM $g WHERE id IN (5, 50, 1000)")
      .head().getLong(0) == 3)
    // a table without the property writes no blooms
    val (t2, g2) = fresh("bloom_none")
    spark.sql(s"CREATE TABLE $g2 (id BIGINT)")
    spark.sql(s"INSERT INTO $g2 VALUES (1), (2)")
    val vP = Versioned.currentVersion(spark, t2)
    assert(bloomOffsets(s"$t2/v=$vP").forall(_._2 < 0))
    // the written bloom actually SKIPS: probe the files through
    // parquet's own row-group filtering with stats and dictionary
    // filters disabled, so the bloom is the only pruning evidence —
    // an absent mid-range id must drop every row group, a present id
    // must keep its group's full count
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    def bloomOnlyCount(probe: Long): Long = {
      val files = new java.io.File(s"$t/v=$vN").listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      files.map { f =>
        val opts = org.apache.parquet.ParquetReadOptions.builder()
          .useStatsFilter(false)
          .useDictionaryFilter(false)
          .useColumnIndexFilter(false)
          .useBloomFilter(true)
          .withRecordFilter(FilterCompat.get(FilterApi.eq(
            FilterApi.longColumn("id"), java.lang.Long.valueOf(probe))))
          .build()
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          new org.apache.parquet.io.LocalInputFile(f.toPath), opts)
        try r.getFilteredRecordCount finally r.close()
      }.sum
    }
    // stats filtering is OFF, so the bloom is the only thing that can
    // tell these apart (at ~5% declared fpp a single false positive
    // is possible but deterministic for a fixed probe value; these
    // probes are chosen passing)
    assert(bloomOnlyCount(150L) > 0, "present id must keep its group")
    assert(bloomOnlyCount(100000L) == 0,
      "absent id must be bloom-skipped with stats filtering off")
  }

  test("compression-codec property encodes every data write; compact " +
      "re-encodes after SET TBLPROPERTIES") {
    import scala.jdk.CollectionConverters._
    val (t, g) = fresh("codec_prop")
    def codecs(dir: String): Set[String] = {
      val files = new java.io.File(dir).listFiles().toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.nonEmpty)
      files.flatMap { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          new org.apache.parquet.io.LocalInputFile(f.toPath))
        try r.getRowGroups.get(0).getColumns.asScala.toSeq
          .map(_.getCodec.toString)
        finally r.close()
      }.toSet
    }
    spark.sql(s"CREATE TABLE $g (id BIGINT, v STRING) TBLPROPERTIES (" +
      s"'${Versioned.CompressionProp}' = 'zstd')")
    spark.sql(s"INSERT INTO $g VALUES " +
      (1 to 50).map(i => s"($i, 'x$i')").mkString(", "))
    val v1 = Versioned.currentVersion(spark, t)
    assert(codecs(s"$t/v=$v1") == Set("ZSTD"))
    // appends inherit the property
    spark.sql(s"INSERT INTO $g VALUES (1000, 'y')")
    val v2 = Versioned.currentVersion(spark, t)
    assert(codecs(s"$t/v=$v2") == Set("ZSTD"))
    // reads are codec-transparent
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 51)
    // flip the property and compact: the table re-encodes
    spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
      s"'${Versioned.CompressionProp}' = 'gzip')")
    val vC = Versioned.compact(spark, t)
    assert(codecs(s"$t/v=$vC") == Set("GZIP"))
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 51)
    // an unknown codec fails loudly — already at SET time (the
    // property commit republishes through the write path's options)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
        s"'${Versioned.CompressionProp}' = 'tar')") }
    assert(e.getMessage.contains("unknown codec"))
    // the failed SET never landed; the table still reads
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 51)
  }

  test("partition-scoped binpack packs one day, links the rest untouched") {
    import spark.implicits._
    val (t, g) = fresh("scoped_binpack")
    spark.sql(s"CREATE TABLE $g (id INT, ts TIMESTAMP_NTZ) " +
      "PARTITIONED BY (days(ts))")
    // three inserts -> three small files per day directory
    (1 to 3).foreach { i =>
      spark.sql(s"INSERT INTO $g VALUES " +
        s"($i, TIMESTAMP_NTZ'2024-06-01 0$i:00:00'), " +
        s"(${i + 10}, TIMESTAMP_NTZ'2024-06-02 0$i:00:00')")
    }
    val before = Versioned.read(spark, t).orderBy("id")
      .collect().map(_.getInt(0)).toSeq
    def dayFiles(day: String): Seq[(String, Long)] =
      graft.sources.FsFast.walkFiles(
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(s"$t")).filter(e =>
          e.name.endsWith(".parquet") &&
          e.path.toString.contains(s"=$day"))
        .map(e => (e.path.toString, e.mtime))
    val d2Before = dayFiles("2024-06-02").toSet
    assert(dayFiles("2024-06-01").size == 3)
    // scoped sweep: only day 1 packs
    val v = spark.sql("CALL graft.system.compact_small(" +
      s"table => '${new java.io.File(t).getAbsolutePath}', " +
      "where_partition => 'days_ts=2024-06-01')").head().getInt(0)
    assert(v == 5) // empty CREATE = v1, three inserts, pack publishes
    // day 1 collapsed into the new version; day 2's files byte-
    // untouched and still linked
    val d1Linked = Versioned.files(spark, t)
      .filter(col("kind") === "data" &&
        col("file").contains("=2024-06-01"))
      .select("file").collect().map(_.getString(0)).toSeq
    assert(d1Linked.size == 1 && d1Linked.head.startsWith("v=5/"),
      s"day-1 should be one packed v5 file, got $d1Linked")
    assert(dayFiles("2024-06-02").toSet == d2Before)
    // rows identical, partition pruning intact
    assert(Versioned.read(spark, t).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == before)
    val pruned = Versioned.readWhere(spark, t, "ts",
      "2024-06-02 00:00:00", "2024-06-02 23:00:00")
    assert(pruned.count() == 3)
    // a scope matching NO partition directory is a misspelled segment,
    // not a clean sweep — it must refuse, never report success
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.compact_small(" +
        s"table => '${new java.io.File(t).getAbsolutePath}', " +
        "where_partition => 'days_ts=2099-01-01')") }
    assert(e.getMessage.contains("matches no partition") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("matches no partition")),
      s"wanted the no-match refusal, got: ${e.getMessage}")
  }

  test("write.distribution-mode clusters partitioned writes") {
    import spark.implicits._
    val (t, g) = fresh("dist_mode")
    spark.sql(s"CREATE TABLE $g (k INT, grp STRING) PARTITIONED BY (grp)")
    val rows = (1 to 120).map(i => (i, s"g${i % 3}"))
    rows.toDF("k", "grp").repartition(8)
      .createOrReplaceTempView("dist_src")
    def filesPerValue(v: Int): Map[String, Int] =
      graft.sources.FsFast.walkFiles(
        org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(s"$t/v=$v"))
        .filter(_.name.endsWith(".parquet"))
        .groupBy(_.path.getParent.getName).map { case (k, fs) =>
          k -> fs.size
        }
    // default none: each of the 8 tasks fans into every value — up to
    // 8 files per partition directory (the small-files shape)
    spark.sql(s"INSERT INTO $g SELECT * FROM dist_src")
    val none = filesPerValue(Versioned.currentVersion(spark, t))
    assert(none.values.max > 1, s"precondition: unclustered write " +
      s"should emit several files per value, got $none")
    // hash: each value lands in exactly ONE task -> one file
    spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
      "'write.distribution-mode' = 'hash')")
    spark.sql(s"INSERT INTO $g SELECT * FROM dist_src")
    val hash = filesPerValue(Versioned.currentVersion(spark, t))
    assert(hash.values.forall(_ == 1), s"hash mode must emit one " +
      s"file per partition value, got $hash")
    // range + declared order: clustered AND each file internally
    // sorted (the writer injects no tie-breaking re-sort)
    spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
      "'write.distribution-mode' = 'range')")
    spark.sql(s"ALTER TABLE $g WRITE ORDERED BY k")
    spark.sql(s"INSERT INTO $g SELECT * FROM dist_src")
    val vR = Versioned.currentVersion(spark, t)
    val rFiles = graft.sources.FsFast.walkFiles(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$t/v=$vR"))
      .filter(_.name.endsWith(".parquet"))
    assert(rFiles.nonEmpty)
    rFiles.foreach { fl =>
      val ks = spark.read.parquet(fl.path.toString).select("k")
        .collect().map(_.getInt(0)).toSeq
      assert(ks == ks.sorted, s"range-mode file not sorted: $ks")
    }
    // rows all arrived in every mode
    assert(spark.table(g).count() == 360L)
    // a bad value fails at SET time (the property commit's own write
    // applies the mode), never silently poisoning later inserts
    val err = intercept[Exception](
      spark.sql(s"ALTER TABLE $g SET TBLPROPERTIES (" +
        "'write.distribution-mode' = 'zigzag')"))
    assert(err.getMessage.contains("zigzag") ||
      Option(err.getCause).exists(_.getMessage.contains("zigzag")))
    assert(Versioned.properties(spark, t)
      .get(Versioned.DistributionModeProp).contains("range"),
      "a refused SET must leave the prior value standing")
  }

  test(".all_files spans retained snapshots; current slice equals " +
      ".files; refuses VERSION AS OF") {
    val (t, g) = fresh("all_files_meta")
    spark.sql(s"CREATE TABLE $g (id INT)")            // v1: no files
    spark.sql(s"INSERT INTO $g VALUES (1), (2)")      // v2
    spark.sql(s"INSERT INTO $g VALUES (3)")           // v3 links v2's
    val af = spark.sql(
      s"SELECT snapshot, file, kind FROM $g.all_files").collect()
    val bySnap = af.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    // every retained snapshot contributes its slice, and append-only
    // history makes each slice a superset of its parent's
    assert(bySnap.keySet == Set(1, 2, 3), bySnap)
    assert(bySnap(1).subsetOf(bySnap(2)) && bySnap(2).subsetOf(bySnap(3)),
      bySnap)
    assert(bySnap(2).size > bySnap(1).size &&
      bySnap(3).size > bySnap(2).size, bySnap)
    // the newest snapshot's slice is exactly .files
    val cur = spark.sql(s"SELECT file FROM $g.files")
      .collect().map(_.getString(0)).toSet
    assert(bySnap(3) == cur)
    // a file linked by several snapshots appears once per snapshot
    bySnap(1).foreach { f =>
      assert(af.count(_.getString(1) == f) == 3, f) }
    // whole-table metadata: VERSION AS OF refuses like .history
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $g.all_files VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("whole-table metadata"))
  }

  test(".all_manifests and .metadata_log span retained snapshots; " +
      "both refuse VERSION AS OF like .all_files") {
    val (t, g) = fresh("all_manifests_meta")
    spark.sql(s"CREATE TABLE $g (id INT)")            // v1
    spark.sql(s"INSERT INTO $g VALUES (1), (2)")      // v2
    spark.sql(s"INSERT INTO $g VALUES (3)")           // v3 links v2's
    val am = spark.sql(s"SELECT snapshot, entry, version, linked " +
      s"FROM $g.all_manifests").collect()
    val bySnap = am.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert(bySnap.keySet == Set(1, 2, 3), bySnap)
    // v3's manifest reaches v2's entry (the O(delta) append link),
    // and the linked flag marks it
    assert(bySnap(3).exists(_.startsWith("v=2")))
    assert(am.exists(r => r.getInt(0) == 3 && r.getInt(2) == 2 &&
      r.getBoolean(3)))
    // the newest slice is exactly .manifests
    val cur = spark.sql(s"SELECT entry FROM $g.manifests")
      .collect().map(_.getString(0)).toSet
    assert(bySnap(3) == cur)
    // metadata_log: one marker row per retained version, paths are
    // the protocol's commit markers, timestamps non-decreasing
    val ml = spark.sql(s"SELECT committed_at, file, version FROM " +
      s"$g.metadata_log ORDER BY version").collect()
    assert(ml.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(ml.forall(r => r.getString(1)
      .contains(s"_commit_${r.getInt(2)}")))
    val ts = ml.map(_.getTimestamp(0).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    // vacuum prunes the log with the snapshots it expires
    graft.sources.Versioned.vacuum(spark, t)
    assert(spark.sql(s"SELECT version FROM $g.metadata_log")
      .collect().map(_.getInt(0)).toSeq == Seq(3))
    // whole-table metadata: VERSION AS OF refuses like .all_files
    Seq("all_manifests", "metadata_log").foreach { k =>
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM $g.$k VERSION AS OF 2").collect()
      }
      assert(e.getMessage.contains("whole-table metadata"), k)
    }
  }

  test(".snapshots metadata table summarizes each commit") {
    import spark.implicits._
    val (t, g) = fresh("snapshots_meta")
    spark.sql(s"CREATE TABLE $g (id INT, v STRING)")           // v1
    spark.sql(s"INSERT INTO $g VALUES (1,'a'),(2,'b'),(3,'c')") // v2
    spark.sql(s"DELETE FROM $g WHERE id = 2")                   // v3 MoR
    Versioned.compact(spark, t)                                 // v4
    val rows = spark.sql(s"SELECT * FROM $g.snapshots ORDER BY version")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val ops = rows.map(_.getString(3)).toSeq
    assert(ops == Seq("commit", "append", "delete", "replace"), ops)
    // parent chain is linear; commit notes surface
    assert(rows.map(r => if (r.isNullAt(2)) 0 else r.getInt(2)).toSeq ==
      Seq(0, 1, 2, 3))
    assert(rows(0).getString(4).contains("CREATE TABLE"))
    // the INSERT added its rows (from the write-metrics sidecar) and
    // at least one file, removing none
    assert(rows(1).getLong(7) == 3L)
    assert(rows(1).getLong(5) >= 1L && rows(1).getLong(6) == 0L)
    // the compact rewrote: files added AND removed, 2 surviving rows
    assert(rows(3).getLong(5) >= 1L && rows(3).getLong(6) >= 1L)
    assert(rows(3).getLong(7) == 2L)
    // VERSION AS OF pins the upper bound
    assert(spark.sql(
      s"SELECT max(version) FROM $g.snapshots VERSION AS OF 2")
      .head().getInt(0) == 2)
    // timestamps are monotone over versions
    val ts = rows.map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted)
    // .manifests: the compacted head is ONE self-contained data entry;
    // the pre-compact pin shows the delete entry and v2's linked data
    val head = spark.sql(s"SELECT * FROM $g.manifests").collect()
    assert(head.map(r => (r.getString(2), r.getBoolean(3))).toSeq ==
      Seq(("data", false)))
    assert(head.head.getLong(4) >= 1L && head.head.getLong(5) > 0L)
    val pinned = spark.sql(
      s"SELECT kind, linked FROM $g.manifests VERSION AS OF 3")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(pinned.contains(("delete", false)) &&
      pinned.contains(("data", true)))
  }

  test(".entries metadata table: added/existing/deleted per file, " +
      "VERSION AS OF pins the diff") {
    val (t, g) = fresh("entries_meta")
    spark.sql(s"CREATE TABLE $g (id INT, v STRING)")            // v1
    spark.sql(s"INSERT INTO $g VALUES (1,'a'),(2,'b'),(3,'c')") // v2
    spark.sql(s"INSERT INTO $g VALUES (4,'d')")                 // v3
    spark.sql(s"DELETE FROM $g WHERE id = 2")                   // v4 MoR
    Versioned.compact(spark, t)                                 // v5
    def st(v: Int) = spark.sql(
      s"SELECT file, kind, status FROM $g.entries VERSION AS OF $v")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)))
    // v3: its own file added, v2's linked as existing, nothing deleted
    val s3 = st(3)
    assert(s3.exists(r => r._3 == "added" && r._1.startsWith("v=3/")))
    assert(s3.exists(r => r._3 == "existing" && r._1.startsWith("v=2/")))
    assert(!s3.exists(_._3 == "deleted"))
    // v4: the MoR tombstone's key file is an added delete-kind entry;
    // all data files persist as existing
    val s4 = st(4)
    assert(s4.exists(r => r._2 == "delete" && r._3 == "added"))
    assert(s4.filter(_._2 == "data").forall(_._3 == "existing"))
    // v5 (compact): one added rewrite, every prior data file AND the
    // absorbed tombstone key surface as deleted
    val s5 = st(5)
    assert(s5.filter(_._3 != "deleted").forall(r =>
      r._3 == "added" && r._1.startsWith("v=5/")), s5.toSeq)
    assert(s5.exists(r => r._3 == "deleted" && r._2 == "delete"))
    assert(s5.count(r => r._3 == "deleted" && r._2 == "data") >= 2)
    // the head's non-deleted slice is exactly .files
    val cur = spark.sql(s"SELECT file FROM $g.files")
      .collect().map(_.getString(0)).toSet
    assert(s5.filter(_._3 != "deleted").map(_._1).toSet == cur)
  }

  test(".position_deletes metadata table: live positional coordinates, " +
      "empty after compaction absorbs them") {
    val (t, g) = fresh("posdel_meta")
    spark.sql(s"CREATE TABLE $g (id INT, v STRING)")
    spark.sql(s"INSERT INTO $g VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql(s"DELETE FROM $g WHERE id IN (2, 4)")   // v3: positional
    val pd = spark.sql(s"SELECT * FROM $g.position_deletes").collect()
    assert(pd.length == 2)
    // coordinates bind to a REAL data file of the snapshot, the
    // tombstone file lives under the delete commit's _posdeletes dir
    val dataFiles = spark.sql(s"SELECT file FROM $g.files " +
      "WHERE kind = 'data'").collect().map(_.getString(0)).toSet
    pd.foreach { r =>
      assert(dataFiles.exists(df => r.getString(0).endsWith(df)))
      assert(r.getInt(2) == 3)
      assert(r.getString(3).contains("_posdeletes"))
    }
    // distinct coordinates (a multi-file insert puts each deleted row
    // at ordinal 0 of its own file — the pair is the identity)
    assert(pd.map(r => (r.getString(0), r.getLong(1))).toSet.size == 2)
    // pre-delete pin: no tombstones existed at v2
    assert(spark.sql(
      s"SELECT count(*) FROM $g.position_deletes VERSION AS OF 2")
      .head().getLong(0) == 0)
    // the rows are actually hidden, and compaction absorbs the
    // tombstones: the table EMPTIES without losing the delete
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 2)
    Versioned.compact(spark, t)
    assert(spark.sql(s"SELECT count(*) FROM $g.position_deletes")
      .head().getLong(0) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $g").head().getLong(0) == 2)
  }

  test("WRITE ORDERED BY: round-trip, compaction sorts files, " +
      "bad column fails, UNORDERED clears") {
    import spark.implicits._
    val (t, g) = fresh("write_order")
    spark.sql(s"CREATE TABLE $g (k INT, v STRING)")
    spark.sql(s"INSERT INTO $g VALUES (5,'e'),(1,'a'),(3,'c')")
    spark.sql(s"INSERT INTO $g VALUES (4,'d'),(2,'b')")
    // a typo'd column must fail the STATEMENT, not no-op compactions
    val err = intercept[Exception](
      spark.sql(s"ALTER TABLE $g WRITE ORDERED BY (nope)"))
    assert(err.getMessage.contains("nope"))
    // both spellings parse: parenthesized multi-col and bare single
    spark.sql(s"ALTER TABLE $g WRITE ORDERED BY (v ASC, k DESC)")
    assert(Versioned.writeOrder(spark, t) ==
      Seq(("v", false), ("k", true)))
    spark.sql(s"ALTER TABLE $g WRITE ORDERED BY k")
    assert(Versioned.writeOrder(spark, t) == Seq(("k", false)))
    // a plain APPEND honors the declared order too (Iceberg
    // write.sort-order applies to writes, not only maintenance)
    spark.sql(s"INSERT INTO $g VALUES (9,'i'),(7,'g'),(8,'h')")
    val vA = Versioned.currentVersion(spark, t)
    new java.io.File(s"$t/v=$vA").listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .foreach { f =>
        val ks = spark.read.parquet(f.getPath).select("k")
          .collect().map(_.getInt(0)).toSeq
        assert(ks == ks.sorted, s"append ${f.getName} not k-sorted: $ks")
      }
    // binpack honors it: every packed file is internally k-ascending
    Versioned.compactSmall(spark, t, minFileBytes = 1024 * 1024)
    val vN = Versioned.currentVersion(spark, t)
    val files = new java.io.File(s"$t/v=$vN").listFiles().toSeq
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.getPath).select("k")
        .collect().map(_.getInt(0)).toSeq
      assert(ks == ks.sorted, s"${f.getName} not k-sorted: $ks")
    }
    // rows survive the ordered rewrite untouched
    assert(spark.table(g).select("k").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 3, 4, 5, 7, 8, 9))
    // UNORDERED clears; clearing again is a no-op, not an error
    spark.sql(s"ALTER TABLE $g WRITE UNORDERED")
    assert(Versioned.writeOrder(spark, t).isEmpty)
    spark.sql(s"ALTER TABLE $g WRITE UNORDERED")
    assert(Versioned.writeOrder(spark, t).isEmpty)
    // an unbalanced paren is a parse error from the delegate, not a
    // half-parsed order
    intercept[Exception](spark.sql(s"ALTER TABLE $g WRITE ORDERED BY (k"))
    assert(Versioned.writeOrder(spark, t).isEmpty)
  }

  test("WRITE ORDERED BY holds on partitioned tables and case-insensitive props") {
    import spark.implicits._
    val (t, g) = fresh("write_order_part")
    spark.sql(s"CREATE TABLE $g (k INT, grp STRING) " +
      "PARTITIONED BY (grp)")
    spark.sql(s"ALTER TABLE $g WRITE ORDERED BY k")
    // rows land shuffled across two partition values; the write must
    // sort (partition col, k) within tasks so the writer injects no
    // re-sort of its own and each FILE comes back internally k-sorted
    val rows = (1 to 200).map(i => ((i * 37) % 199, if (i % 2 == 0) "a" else "b"))
    rows.toDF("k", "grp").repartition(4)
      .createOrReplaceTempView("wop_src")
    spark.sql(s"INSERT INTO $g SELECT * FROM wop_src")
    val vA = Versioned.currentVersion(spark, t)
    val files = graft.sources.FsFast.walkFiles(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$t/v=$vA"))
      .filter(_.name.endsWith(".parquet"))
    assert(files.nonEmpty &&
      files.forall(_.path.toString.contains("grp=")))
    files.foreach { fl =>
      val ks = spark.read.parquet(fl.path.toString).select("k")
        .collect().map(_.getInt(0)).toSeq
      assert(ks == ks.sorted,
        s"partitioned write file ${fl.name} not k-sorted: $ks")
    }
    // a raw SET TBLPROPERTIES value in a different case must still
    // sort — resolution is case-insensitive like the analyzer's
    Versioned.setProperties(spark, t,
      set = Map(Versioned.WriteOrderProp -> "K desc"))
    spark.sql(s"INSERT INTO $g VALUES (3,'c'),(9,'c'),(6,'c')")
    val vB = Versioned.currentVersion(spark, t)
    val cFiles = graft.sources.FsFast.walkFiles(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$t/v=$vB"))
      .filter(_.name.endsWith(".parquet"))
    assert(cFiles.nonEmpty)
    cFiles.foreach { fl =>
      val ks = spark.read.parquet(fl.path.toString).select("k")
        .collect().map(_.getInt(0)).toSeq
      assert(ks == ks.sorted.reverse,
        s"case-insensitive order file ${fl.name} not k-desc: $ks")
    }
    // an order that mentions the partition column NOT first ("k, grp")
    // must still satisfy the writer's (grp ASC)-prefix requirement —
    // the engine reorders grp to the front (constant within a file, so
    // the per-file contract is unchanged) instead of letting the
    // writer inject its tie-order-free re-sort
    Versioned.setProperties(spark, t,
      set = Map(Versioned.WriteOrderProp -> "k, grp"))
    spark.sql(s"INSERT INTO $g SELECT * FROM wop_src")
    val vC = Versioned.currentVersion(spark, t)
    val dFiles = graft.sources.FsFast.walkFiles(
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$t/v=$vC"))
      .filter(_.name.endsWith(".parquet"))
    assert(dFiles.nonEmpty)
    dFiles.foreach { fl =>
      val ks = spark.read.parquet(fl.path.toString).select("k")
        .collect().map(_.getInt(0)).toSeq
      assert(ks == ks.sorted,
        s"order-mentions-partition-col file ${fl.name} not k-sorted: $ks")
    }
  }
}
