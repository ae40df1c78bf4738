package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Versioned
import graft.sources.Versioned.StatsAgg._

/** The metadata-only aggregate: a global MIN/MAX/COUNT over a graft
  * catalog table answers from the stats sidecars — no parquet scan in
  * the executed plan — and every unprovable shape falls back to the
  * scan plan with the identical answer. */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private val work = "target/tmp/metaagg"
  private def fresh(name: String): (String, String) = {
    val t = s"$work/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    (t, new java.io.File(t).getAbsolutePath)
  }

  private def scanFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Scan parquet")

  test("min/max/count serve from sidecars: no scan, scan-equal values") {
    val (t, abs) = fresh("ma_basic")
    val rows = Seq((3, "b", 2.5), (1, "a", -0.5), (7, null, 9.0))
      .toDF("id", "name", "score")
    Versioned.commit(rows, t, statsCols = Seq("id", "name", "score"))
    Versioned.append(Seq((5, "zz", 0.0)).toDF("id", "name", "score"), t,
      statsCols = Seq("id", "name", "score"))
    val q = spark.sql(s"SELECT min(id) AS mn, max(id) AS mx, " +
      s"count(*) AS n, count(name) AS nn, max(name) AS mxn, " +
      s"min(score) AS mns FROM graft.`$abs`")
    assert(scanFree(q), q.queryExecution.executedPlan.toString.take(800))
    val r = q.head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 7)
    assert(r.getLong(2) == 4L && r.getLong(3) == 3L)
    assert(r.getString(4) == "zz" && r.getDouble(5) == -0.5)
    // the fallback scan plan agrees (same SQL forced through the scan
    // by a vacuous filter that breaks the rewrite shape)
    val full = spark.sql(s"SELECT min(id), max(id), count(*), " +
      s"count(name), max(name), min(score) FROM graft.`$abs` " +
      "WHERE id IS NOT NULL OR id IS NULL").head()
    assert(r.toSeq == full.toSeq)
  }

  test("count(*) serves metadata-only even without declared statsCols") {
    val (t, abs) = fresh("ma_countonly")
    Versioned.commit((1 to 25).map(i => (i, s"v$i")).toDF("id", "v"), t)
    Versioned.append((26 to 40).map(i => (i, s"v$i")).toDF("id", "v"), t)
    val q = spark.sql(s"SELECT count(*) AS n FROM graft.`$abs`")
    assert(scanFree(q))
    assert(q.head().getLong(0) == 40L)
    // the Dataset spelling serves too: spark.table() expands the
    // relation before .count() exists, but the expansion carries the
    // snapshot tag the aggregate pass recovers (the DSv2
    // SupportsPushDownAggregates analog)
    val ds = spark.table(s"graft.`$abs`").groupBy().count()
    assert(scanFree(ds) && ds.head().getLong(0) == 40L)
    // but min has no bounds rows -> falls back to the scan, still right
    val mn = spark.sql(s"SELECT min(id) AS mn FROM graft.`$abs`")
    assert(!scanFree(mn))
    assert(mn.head().getInt(0) == 1)
  }

  test("Dataset API serves from sidecars: agg, count, groupBy, " +
      "pruned select; ineligible shapes keep the scan") {
    val (t, abs) = fresh("ma_dataset")
    val rows = (1 to 30).map(i => (i.toLong, s"p${i % 3}", i * 1.5))
      .toDF("id", "pk", "v")
    Versioned.commit(rows, t, partitionCol = Some("pk"),
      statsCols = Seq("id", "v"))
    val tbl = spark.table(s"graft.`$abs`")
    // global aggregate over the table object
    val g = tbl.agg(min($"id").as("mn"), max($"v").as("mx"),
      count(lit(1)).as("n"), count($"v").as("nv"))
    assert(scanFree(g), g.queryExecution.executedPlan.toString.take(800))
    assert(g.head().toSeq == Seq(1L, 45.0, 30L, 30L))
    // df.count() — the dashboard probe — is scan-free
    val cnt = tbl.groupBy().count()
    assert(scanFree(cnt) && cnt.head().getLong(0) == 30L)
    // a pure column-pruning select in between still serves
    val pruned = tbl.select("id").agg(max($"id").as("mx"))
    assert(scanFree(pruned) && pruned.head().getLong(0) == 30L)
    // the partition-grouped rollup serves through the Dataset API
    val grouped = tbl.groupBy($"pk").agg(count(lit(1)).as("n"),
      max($"v").as("mx"))
    assert(scanFree(grouped),
      grouped.queryExecution.executedPlan.toString.take(800))
    val scanPlan = tbl.filter($"id".isNotNull || $"id".isNull)
      .groupBy($"pk").agg(count(lit(1)).as("n"), max($"v").as("mx"))
    assert(!scanFree(scanPlan))
    assert(grouped.collect().map(_.toSeq).sortBy(_.head.toString).toSeq
      == scanPlan.collect().map(_.toSeq).sortBy(_.head.toString).toSeq)
    // ineligible Dataset shapes keep the scan and stay correct
    val f = tbl.filter($"pk" === "p1").agg(max($"id").as("mx"))
    assert(!scanFree(f) && f.head().getLong(0) == 28L)
    val expr = tbl.agg(max($"id" + 1).as("mx"))
    assert(!scanFree(expr) && expr.head().getLong(0) == 31L)
    val ren = tbl.select($"id".as("renamed"))
      .agg(max($"renamed").as("mx"))
    assert(!scanFree(ren) && ren.head().getLong(0) == 30L)
    // the SQL and Dataset spellings agree value-for-value
    val sqlv = spark.sql(s"SELECT min(id) AS mn, max(v) AS mx, " +
      s"count(*) AS n, count(v) AS nv FROM graft.`$abs`").head()
    assert(sqlv.toSeq == g.head().toSeq)
    // a live tombstone bails the Dataset path to the scan, same as SQL
    Versioned.deleteRows(spark, t, Seq(30L).toDF("id"))
    val afterDel = spark.table(s"graft.`$abs`").groupBy().count()
    assert(!scanFree(afterDel) && afterDel.head().getLong(0) == 29L)
  }

  test("live MoR tombstone bails to the scan; compaction re-enables") {
    val (t, abs) = fresh("ma_tombs")
    Versioned.commit((1 to 20).map(i => (i, s"v$i")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    Versioned.deleteRows(spark, t, Seq(20).toDF("id"))
    val q1 = spark.sql(s"SELECT max(id) AS mx, count(*) AS n " +
      s"FROM graft.`$abs`")
    assert(!scanFree(q1), "a live tombstone must force the scan plan")
    assert(q1.head().toSeq == Seq(19, 19L))
    Versioned.compact(spark, t, statsCols = Seq("id"))
    val q2 = spark.sql(s"SELECT max(id) AS mx, count(*) AS n " +
      s"FROM graft.`$abs`")
    assert(scanFree(q2), "compaction absorbs the tombstone")
    assert(q2.head().toSeq == Seq(19, 19L))
  }

  test("filters, grouping, distinct, expressions all keep the scan") {
    val (t, abs) = fresh("ma_shapes")
    Versioned.commit((1 to 10).map(i => (i, i % 3)).toDF("id", "g"), t,
      statsCols = Seq("id", "g"))
    val shapes = Seq(
      s"SELECT min(id) FROM graft.`$abs` WHERE g = 1",
      s"SELECT g, min(id) FROM graft.`$abs` GROUP BY g",
      s"SELECT count(DISTINCT g) FROM graft.`$abs`",
      s"SELECT min(id + 1) FROM graft.`$abs`",
      s"SELECT avg(id) FROM graft.`$abs`")
    shapes.foreach { sql =>
      assert(!scanFree(spark.sql(sql)), s"must scan: $sql")
    }
    // and the served shape still composes under outer selects AND a
    // REAL HAVING (which resolves by rewriting the child aggregate —
    // the rewrite must wait for the whole plan to resolve)
    val h = spark.sql(s"SELECT n FROM (SELECT count(*) AS n " +
      s"FROM graft.`$abs`) WHERE n > 5")
    assert(scanFree(h) && h.head().getLong(0) == 10L)
    val hv = spark.sql(s"SELECT count(*) AS n FROM graft.`$abs` " +
      "HAVING count(*) > 5")
    assert(scanFree(hv) && hv.head().getLong(0) == 10L)
  }

  test("VERSION AS OF serves the pinned snapshot's answer") {
    val (t, abs) = fresh("ma_pin")
    Versioned.commit((1 to 5).map(i => (i, "a")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    Versioned.append((6 to 9).map(i => (i, "b")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    val pinned = spark.sql(s"SELECT max(id) AS mx, count(*) AS n " +
      s"FROM graft.`$abs` VERSION AS OF 1")
    assert(scanFree(pinned))
    assert(pinned.head().toSeq == Seq(5, 5L))
    val head = spark.sql(s"SELECT max(id) AS mx, count(*) AS n " +
      s"FROM graft.`$abs`").head()
    assert(head.toSeq == Seq(9, 9L))
  }

  test("pending schema steps bail; API surface agrees with the scan") {
    val (t, _) = fresh("ma_steps")
    Versioned.commit((1 to 8).map(i => (i, s"v$i")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    Versioned.renameColumn(spark, t, "id", "ident")
    assert(Versioned.statsAggregate(spark, t,
      Seq(("mx", MaxOf("ident")))).isEmpty,
      "a pending rename applies to older files — must bail")
    // count(*) is name-free but the bail is whole-table by design
    assert(Versioned.statsAggregate(spark, t,
      Seq(("n", CountStar))).isEmpty)
    // direct-API happy path on a clean table
    val (t2, _) = fresh("ma_api")
    Versioned.commit(Seq((1, 2.0), (4, -1.0)).toDF("a", "b"), t2,
      statsCols = Seq("a", "b"))
    val got = Versioned.statsAggregate(spark, t2, Seq(
      ("mn", MinOf("a")), ("mx", MaxOf("b")), ("n", CountStar),
      ("nb", CountOf("b")))).get.head()
    assert(got.toSeq == Seq(1, 2.0, 2L, 2L))
    // unknown column -> None, not a throw
    assert(Versioned.statsAggregate(spark, t2,
      Seq(("x", MinOf("nope")))).isEmpty)
  }

  test("partition-grouped rollup serves from sidecars: no scan, " +
      "scan-equal rows") {
    val (t, abs) = fresh("ma_grouped")
    val rows = (1 to 40).map(i => (i.toLong, s"p${i % 4}", i * 10L))
      .toDF("id", "pk", "v")
    Versioned.commit(rows, t, partitionCol = Some("pk"),
      statsCols = Seq("v"))
    Versioned.append(
      Seq((41L, "p9", null.asInstanceOf[java.lang.Long]))
        .toDF("id", "pk", "v"), t,
      partitionCol = Some("pk"), statsCols = Seq("v"))
    val sql = s"SELECT pk, count(*) AS n, max(v) AS mx, " +
      s"min(v) AS mn, count(v) AS nv FROM graft.`$abs` GROUP BY pk"
    val q = spark.sql(sql)
    assert(scanFree(q), q.queryExecution.executedPlan.toString.take(800))
    val got = q.collect().map(_.toSeq).sortBy(_.head.toString)
    // forced scan plan: a vacuous filter breaks the rewrite shape
    val full = spark.sql(sql.replace("GROUP BY pk",
      "WHERE pk IS NOT NULL OR pk IS NULL GROUP BY pk"))
    assert(!scanFree(full))
    assert(got.toSeq ==
      full.collect().map(_.toSeq).sortBy(_.head.toString).toSeq)
    // the all-null partition p9 stores NULL bounds and count(v)=0
    val p9 = got.find(_.head == "p9").get
    assert(p9 == Seq("p9", 1L, null, null, 0L))
    // grouped HAVING composes over the served plan
    val h = spark.sql(s"SELECT pk, count(*) AS n FROM graft.`$abs` " +
      "GROUP BY pk HAVING count(*) > 5")
    assert(scanFree(h) && h.count() == 4)
    // min/max OF the group column keeps the scan (path-materialized)
    val gself = spark.sql(s"SELECT pk, max(pk) FROM graft.`$abs` " +
      "GROUP BY pk")
    assert(!scanFree(gself))
    assert(gself.count() == 5)
    // the bare distinct-partition-values probe (SHOW PARTITIONS
    // analog) serves from paths alone
    val dp = spark.sql(s"SELECT pk FROM graft.`$abs` GROUP BY pk")
    assert(scanFree(dp))
    assert(dp.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("p0", "p1", "p2", "p3", "p9"))
  }

  test("grouped rollup bails: mixed layouts, escaped values round-trip") {
    // a table with one UNPARTITIONED root in the mix keeps the scan
    val (t, abs) = fresh("ma_grouped_mixed")
    Versioned.commit((1 to 8).map(i => (i, s"g${i % 2}")).toDF("id", "pk"),
      t, partitionCol = Some("pk"))
    Versioned.append(Seq((9, "g0")).toDF("id", "pk"), t) // no layout
    val q = spark.sql(s"SELECT pk, count(*) AS n FROM graft.`$abs` " +
      "GROUP BY pk")
    assert(!scanFree(q))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("g0" -> 5L, "g1" -> 4L))
    // hive-escaped partition values (space, equals, slash) round-trip
    val (t2, abs2) = fresh("ma_grouped_escaped")
    Versioned.commit(Seq((1, "a b=c/d"), (2, "a b=c/d"), (3, "plain"))
      .toDF("id", "pk"), t2, partitionCol = Some("pk"))
    val q2 = spark.sql(s"SELECT pk, count(*) AS n FROM graft.`$abs2` " +
      "GROUP BY pk")
    assert(scanFree(q2))
    assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == Map("a b=c/d" -> 2L, "plain" -> 1L))
  }

  test(".stats metadata table exposes the sidecars SQL-queryably") {
    val (t, abs) = fresh("ma_statstable")
    Versioned.commit(Seq((1, "a"), (9, "b")).toDF("id", "v"), t,
      statsCols = Seq("id"))
    Versioned.append(Seq((5, "c")).toDF("id", "v"), t) // count-only
    val st = spark.sql(s"SELECT * FROM graft.`$abs`.stats")
    assert(st.columns.toSeq == Seq("file", "column", "dtype", "min",
      "max", "null_count", "value_count"))
    val rows = st.collect()
    // the declared column's bounds rows (one PER FILE — fold them)
    val idRows = rows.filter(_.getAs[String]("column") == "id")
    assert(idRows.nonEmpty)
    assert(idRows.map(_.getAs[String]("min").toInt).min == 1 &&
      idRows.map(_.getAs[String]("max").toInt).max == 9 &&
      idRows.map(_.getAs[Long]("value_count")).sum == 2L)
    // the stats-less append contributes its count-only pseudo row
    // (NULL column) — what lets count(*) serve while min(id) scans
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("column")) &&
      r.getAs[Long]("value_count") == 1L))
    // pinned: v1 has no pseudo row for the later append
    val v1 = spark.sql(
      s"SELECT count(*) FROM (SELECT * FROM graft.`$abs`.stats " +
        "VERSION AS OF 1)").head().getLong(0)
    assert(v1 == rows.length - 1)
    // the observability loop: ANALYZE fills the gap the table showed
    spark.sql(s"ANALYZE TABLE graft.`$abs` COMPUTE STATISTICS " +
      "FOR COLUMNS id")
    val after = spark.sql(s"SELECT count(*) FROM graft.`$abs`.stats " +
      "WHERE column = 'id'").head().getLong(0)
    assert(after == idRows.length + 1L) // the append's file gained one
    assert(scanFree(spark.sql(s"SELECT min(id) AS mn FROM graft.`$abs`")))
  }

  test("timestamp bounds round-trip through the epoch-micros sidecar") {
    val (t, abs) = fresh("ma_ts")
    val df = Seq("2021-03-01 10:00:00", "2020-12-31 23:59:59",
      "2021-07-04 00:00:01").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    Versioned.commit(df, t, statsCols = Seq("ts"))
    val q = spark.sql(s"SELECT min(ts) AS mn, max(ts) AS mx " +
      s"FROM graft.`$abs`")
    assert(scanFree(q))
    val full = Versioned.read(spark, t).agg(min("ts"), max("ts")).head()
    assert(q.head().toSeq == full.toSeq)
  }
}
