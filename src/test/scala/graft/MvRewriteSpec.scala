package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DerivedTable, Versioned}

/** Automatic query rewrite over registered aggregate MVs
  * ([[graft.plans.MvRewriteRule]]): a matching GROUP BY query over
  * the SOURCE serves from the view when the view's pin equals the
  * scanned snapshot — plan-asserted (the substituted plan reads the
  * view's directory, not the source's data), result-asserted
  * (identical to the base scan), and freshness-asserted (a stale
  * view never substitutes; the scan proceeds and stays correct). */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val work = "target/tmp/mvrw"
  private def fresh(name: String): String = {
    val t = s"$work/$name"
    val f = new java.io.File(t)
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(name + "."))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    f.getAbsolutePath
  }

  /** Whether the plan was substituted onto `dir`: the physical scan
    * locations name the directory whose files actually feed the
    * query (the view after a rewrite, the source otherwise). */
  private def servedFrom(df: DataFrame, dir: String): Boolean =
    df.queryExecution.executedPlan.toString.contains(dir)

  test("enable_rewrite: a matching rollup serves from the view — " +
      "exact groups, coarser regroup, global, avg/min/max/count — " +
      "and a stale pin falls back to the scan until refresh") {
    val src = fresh("rw_src")
    val mv = fresh("rw_mv")
    Versioned.commit((1L to 40L).map(i =>
        (i, s"g${i % 4}", s"h${i % 2}", i * 10L))
      .toDF("id", "g", "h", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` ROW KEY (id) " +
      s"AS SELECT g, h, sum(v) AS sum_v, count(v) AS cnt_v, " +
      s"count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v " +
      s"FROM graft.`$src` GROUP BY g, h")
    val reg = spark.sql(
      s"CALL graft.system.enable_rewrite('$mv')").head()
    assert(reg.getString(0) == src)
    def q(sql: String) = spark.sql(sql)
    val exact = q(s"SELECT g, h, sum(v) AS s, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g, h")
    assert(servedFrom(exact, mv) && !servedFrom(exact, src + "/"),
      exact.queryExecution.optimizedPlan.toString)
    // values equal the base scan (rewrite changes cost, not results)
    val base = (1L to 40L).map(i => (i, s"g${i % 4}", s"h${i % 2}",
      i * 10L))
    val expExact = base.groupBy(r => (r._2, r._3)).map { case (k, rs)
      => (k._1, k._2, rs.map(_._4).sum, rs.size.toLong) }.toSet
    assert(exact.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSet == expExact)
    // COARSER regroup: GROUP BY a subset re-aggregates the view
    val coarse = q(s"SELECT g, sum(v) AS s, count(v) AS c, " +
      s"avg(v) AS a, min(v) AS mn, max(v) AS mx " +
      s"FROM graft.`$src` GROUP BY g")
    assert(servedFrom(coarse, mv))
    val expCoarse = base.groupBy(_._2).map { case (g, rs) =>
      (g, rs.map(_._4).sum, rs.size.toLong,
        rs.map(_._4).sum.toDouble / rs.size,
        rs.map(_._4).min, rs.map(_._4).max) }.toSet
    assert(coarse.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
      .toSet == expCoarse)
    // GLOBAL rollup (empty GROUP BY) serves too
    val global = q(s"SELECT count(*) AS n, sum(v) AS s " +
      s"FROM graft.`$src`")
    assert(servedFrom(global, mv))
    assert(global.head() == org.apache.spark.sql.Row(40L,
      base.map(_._4).sum))
    // STALE pin: a source commit un-matches the view until refresh —
    // the query falls back to the scan and stays correct
    Versioned.append(Seq((41L, "g1", "h1", 990L))
      .toDF("id", "g", "h", "v"), src)
    val stale = q(s"SELECT g, h, sum(v) AS s, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g, h")
    assert(!servedFrom(stale, mv))
    assert(stale.filter($"g" === "g1" && $"h" === "h1")
      .head().getLong(3) == base.count(r =>
        r._2 == "g1" && r._3 == "h1") + 1)
    spark.sql(s"CALL graft.system.refresh_mv('$mv')")
    val fresh2 = q(s"SELECT g, h, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g, h")
    assert(servedFrom(fresh2, mv))
    assert(fresh2.agg(sum($"n")).head().getLong(0) == 41L)
    // TIME TRAVEL to the pre-append snapshot: pin (v2, post-refresh)
    // != scanned v1, so the rewrite correctly stays out
    val tt = q(s"SELECT g, count(*) AS n " +
      s"FROM graft.`$src` VERSION AS OF 1 GROUP BY g")
    assert(!servedFrom(tt, mv))
    assert(tt.agg(sum($"n")).head().getLong(0) == 40L)
    // non-matching shapes fall back: an unmapped measure column, a
    // WHERE the view does not carry, a non-subset group
    val noV = q(s"SELECT g, sum(id) AS s FROM graft.`$src` GROUP BY g")
    assert(!servedFrom(noV, mv))
    val withWhere = q(s"SELECT g, sum(v) AS s FROM graft.`$src` " +
      "WHERE v >= 100 GROUP BY g")
    assert(!servedFrom(withWhere, mv))
    val otherG = q(s"SELECT id, sum(v) AS s FROM graft.`$src` " +
      "GROUP BY id")
    assert(!servedFrom(otherG, mv))
    // disable_rewrite deregisters; the same query scans again
    assert(spark.sql(s"CALL graft.system.disable_rewrite('$mv')")
      .head().getBoolean(0))
    val off = q(s"SELECT g, h, sum(v) AS s FROM graft.`$src` " +
      "GROUP BY g, h")
    assert(!servedFrom(off, mv))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mv`")
  }

  test("exact group match serves a PURE PROJECTION over the view — " +
      "no re-aggregation, no exchange — and unlocks the " +
      "non-rollupable measures: count(DISTINCT) and default-" +
      "precision approx_count_distinct") {
    val src = fresh("rwp_src")
    val mv = fresh("rwp_mv")
    val rows = (1L to 60L).map(i =>
      (i, s"g${i % 3}", s"u${i % 7}", i * 10L))
    Versioned.commit(rows.toDF("id", "g", "u", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` ROW KEY (id) " +
      s"AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v, " +
      "count(*) AS n_rows, approx_count_distinct(u) AS adc_u, " +
      s"count(DISTINCT u) AS cd_u FROM graft.`$src` " +
      "GROUP BY g")
    spark.sql(s"CALL graft.system.enable_rewrite('$mv')")
    val q = spark.sql(s"SELECT g, sum(v) AS s, count(*) AS n, " +
      "count(DISTINCT u) AS d, approx_count_distinct(u) AS ad, " +
      s"avg(v) AS av FROM graft.`$src` GROUP BY g")
    assert(servedFrom(q, mv))
    // a projection, not an aggregation: the physical plan carries no
    // exchange (the stored row IS the answer per group)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      q.queryExecution.executedPlan.toString)
    // values equal spark's own aggregation of the same rows (the
    // local frame can't rewrite — no graft relation)
    val exp = rows.toDF("id", "g", "u", "v")
      .groupBy($"g").agg(sum($"v").as("s"), count(lit(1)).as("n"),
        countDistinct($"u").as("d"),
        approx_count_distinct($"u").as("ad"), avg($"v").as("av"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(q.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSet == exp)
    // COARSER groups cannot roll distinct counts up — the global
    // distinct query falls back to the scan and stays correct
    val g = spark.sql(s"SELECT count(DISTINCT u) AS d " +
      s"FROM graft.`$src`")
    assert(!servedFrom(g, mv))
    assert(g.head().getLong(0) == 7L)
    // a NON-default-precision approx falls back too (the stored
    // sketch was built at the default)
    val prec = spark.sql(s"SELECT g, approx_count_distinct(u, 0.01) " +
      s"AS ad FROM graft.`$src` GROUP BY g")
    assert(!servedFrom(prec, mv))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mv`")
  }

  test("expression group keys and measures match semantically: the " +
      "day-bucketed revenue rollup serves from the view in both " +
      "exact and coarser shapes") {
    val src = fresh("rwe_src")
    val mv = fresh("rwe_mv")
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      .getTime
    val rows = (1L to 48L).map(i => (i, s"g${i % 2}",
      new java.sql.Timestamp(base + i * 3600L * 1000),
      (i * 7 % 13).toDouble, 0.25 * (i % 3)))
    Versioned.commit(
      rows.toDF("id", "g", "ts", "price", "disc"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` ROW KEY (id) " +
      "AS SELECT g, date_trunc('DAY', ts) AS day, " +
      "sum(price * (1 - disc)) AS sum_rev, " +
      "count(price * (1 - disc)) AS cnt_rev, count(*) AS n_rows " +
      s"FROM graft.`$src` GROUP BY g, date_trunc('DAY', ts)")
    spark.sql(s"CALL graft.system.enable_rewrite('$mv')")
    // EXACT shape: same bucket expression, same measure expression —
    // a pure projection over the view
    val exact = spark.sql("SELECT g, date_trunc('DAY', ts) AS d, " +
      "sum(price * (1 - disc)) AS rev, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g, date_trunc('DAY', ts)")
    assert(servedFrom(exact, mv),
      exact.queryExecution.executedPlan.toString.take(500))
    assert(!exact.queryExecution.executedPlan.toString
      .contains("Exchange"))
    // values equal spark's own aggregation of a local frame
    val exp = rows.toDF("id", "g", "ts", "price", "disc")
      .groupBy($"g", date_trunc("DAY", $"ts").as("d"))
      .agg(sum($"price" * (lit(1) - $"disc")).as("rev"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(exact.collect().map(r => (r.getString(0),
      r.getTimestamp(1), r.getDouble(2), r.getLong(3))).toSet == exp)
    // COARSER: drop the bucket, keep the expression measure — the
    // per-bucket sums re-aggregate (every product here is exact in
    // binary — integral prices, quarter discounts — so the figures
    // are order-independent hash facts)
    val coarse = spark.sql("SELECT g, count(*) AS n, " +
      "sum(price * (1 - disc)) AS rev " +
      s"FROM graft.`$src` GROUP BY g")
    assert(servedFrom(coarse, mv))
    assert(coarse.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).toSet ==
      rows.groupBy(_._2).map { case (g, rs) =>
        (g, rs.size.toLong,
          rs.map(t => t._4 * (1 - t._5)).sum) }.toSet)
    // a DIFFERENT bucket granularity falls back
    val hourly = spark.sql("SELECT date_trunc('HOUR', ts) AS h, " +
      s"count(*) AS n FROM graft.`$src` " +
      "GROUP BY date_trunc('HOUR', ts)")
    assert(!servedFrom(hourly, mv))
    // a DIFFERENT measure expression falls back
    val other = spark.sql("SELECT g, sum(price * (1 + disc)) AS x " +
      s"FROM graft.`$src` GROUP BY g")
    assert(!servedFrom(other, mv))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mv`")
  }

  test("bounded-staleness rewrite: an opted-in view keeps serving " +
      "while it lags the scan within the bound, stops beyond it, " +
      "and never serves a scan BELOW its pin") {
    val src = fresh("rws_src")
    val mv = fresh("rws_mv")
    Versioned.commit((1L to 20L).map(i => (i, s"g${i % 2}", i))
      .toDF("id", "g", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` ROW KEY (id) " +
      s"AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v, " +
      s"count(*) AS n_rows FROM graft.`$src` GROUP BY g")
    spark.sql(s"CALL graft.system.enable_rewrite('$mv', " +
      "max_staleness_versions => 2)")
    def q() = spark.sql(s"SELECT g, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g")
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum($"n")).head().getLong(0)
    assert(servedFrom(q(), mv) && total(q()) == 20L)
    // lag 1 and 2: still serves, answering from the PINNED snapshot
    // (misses the appended rows — the documented trade)
    Versioned.append(Seq((21L, "g1", 1L)).toDF("id", "g", "v"), src)
    assert(servedFrom(q(), mv) && total(q()) == 20L)
    Versioned.append(Seq((22L, "g0", 1L)).toDF("id", "g", "v"), src)
    assert(servedFrom(q(), mv) && total(q()) == 20L)
    // lag 3 exceeds the bound: the scan resumes and sees every row
    Versioned.append(Seq((23L, "g1", 1L)).toDF("id", "g", "v"), src)
    assert(!servedFrom(q(), mv) && total(q()) == 23L)
    // refresh re-pins: fresh serving with fresh figures
    spark.sql(s"CALL graft.system.refresh_mv('$mv')")
    assert(servedFrom(q(), mv) && total(q()) == 23L)
    // a time-travel scan BELOW the pin never serves — staleness only
    // permits the view to lag, not to lead
    val below = spark.sql(s"SELECT g, count(*) AS n FROM " +
      s"graft.`$src` VERSION AS OF 1 GROUP BY g")
    assert(!servedFrom(below, mv) && total(below) == 20L)
    spark.sql(s"CALL graft.system.disable_rewrite('$mv')")
    // disable also unsets the staleness opt-in
    assert(!Versioned.properties(spark, mv)
      .contains(graft.plans.MvRewriteRule.RewriteStaleProp))
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mv`")
  }

  test("rewrite with a stored WHERE: the query's predicate must " +
      "match semantically; DROP deregisters the pointer; plain " +
      "tables refuse enable_rewrite") {
    val src = fresh("rww_src")
    val mv = fresh("rww_mv")
    Versioned.commit((1L to 30L).map(i => (i, s"g${i % 3}", i * 10L))
      .toDF("id", "g", "v"), src)
    spark.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` ROW KEY (id) " +
      s"AS SELECT g, sum(v) AS sum_v, count(v) AS cnt_v, " +
      s"count(*) AS n_rows FROM graft.`$src` WHERE v >= 100 " +
      "GROUP BY g")
    spark.sql(s"CALL graft.system.enable_rewrite('$mv')")
    // the SAME predicate (any equivalent spelling Catalyst
    // canonicalizes alike) serves from the view
    val hit = spark.sql(s"SELECT g, sum(v) AS s, count(*) AS n " +
      s"FROM graft.`$src` WHERE v >= 100 GROUP BY g")
    assert(servedFrom(hit, mv))
    assert(hit.agg(sum($"n")).head().getLong(0) ==
      (1L to 30L).count(_ * 10 >= 100))
    // a DIFFERENT predicate scans
    val miss = spark.sql(s"SELECT g, sum(v) AS s FROM graft.`$src` " +
      "WHERE v >= 200 GROUP BY g")
    assert(!servedFrom(miss, mv))
    // a WHERE-less query over a WHERE-carrying view scans (the view
    // is missing rows the query needs)
    val all = spark.sql(s"SELECT g, count(*) AS n " +
      s"FROM graft.`$src` GROUP BY g")
    assert(!servedFrom(all, mv))
    assert(all.agg(sum($"n")).head().getLong(0) == 30L)
    // DROP deregisters: the source's pointer property empties
    spark.sql(s"DROP MATERIALIZED VIEW graft.`$mv`")
    assert(!Versioned.properties(spark, src)
      .contains(graft.plans.MvRewriteRule.SourceViewsProp))
    // plain tables refuse registration
    val e = intercept[Exception](spark.sql(
      s"CALL graft.system.enable_rewrite('$src')"))
    assert(e.getMessage.contains("aggregate materialized view"))
  }
}
