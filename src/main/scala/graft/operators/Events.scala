package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.TimestampNTZType
import graft.sources.Tables

/** Event-stream analytics over the `events` fixture (batch mode; the
  * streaming equivalents live in [[graft.streaming.EventStreams]]).
  *
  * The reference has no streaming surface (SURVEY.md §2.9 — its ETL is a
  * one-shot batch job, reference README.md:28); these are north-star
  * extensions for the time-series side of a training-data pipeline.
  */
object Events {

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  /** Epoch micros of a timestamp column regardless of flavor:
    * TIMESTAMP (an instant) directly; TIMESTAMP_NTZ (the fixture's
    * tz-less parquet timestamps) by interpreting the naive wall-clock
    * as UTC — the same convention DuckDB applies to the same files, so
    * oracle arithmetic agrees to the microsecond. The NTZ leg routes
    * through an LTZ cast (which SUBTRACTS the session-zone offset)
    * then from_utc_timestamp ADDS it back, leaving exactly
    * wall-clock-as-UTC in any fixed-offset session zone (the engine
    * pins UTC, [[graft.Sessions.builder]], where both steps are
    * identities); under a DST zone a skipped local hour cannot
    * round-trip the cast — pin a fixed offset for event-time
    * arithmetic. */
  private def epochMicros(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case TimestampNTZType =>
        unix_micros(from_utc_timestamp(col(c).cast("timestamp"),
          current_timezone()))
      case _ => unix_micros(col(c))
    }

  /** Tumbling 1-hour window aggregate. Implemented as a date_trunc
    * group-by (identical semantics to `window(ts, "1 hour")` for tumbling
    * windows, and cheaper: plain hash agg, no window-struct explode). */
  def tumblingHourly(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Hopping (sliding) window aggregation: 1-hour windows advancing
    * every 15 minutes, so each event lands in 4 overlapping windows —
    * the moving-average shape of monitoring pipelines. Spark's `window`
    * expands each row into its windows before a plain hash aggregate
    * (partial -> final, shuffle is one row per (mapper, window, type)),
    * which is also exactly how the streaming engine computes it with a
    * watermark bounding open windows. */
  def hoppingQuarterHour(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Time-series densification (gap filling): per-user hourly counts
    * with zero rows for every silent hour between the user's first and
    * last activity — the resample step before any rolling statistic or
    * forecast. The dense grid is generated distributed (never on the
    * driver) and CHUNKED: months explode first, then the hours within
    * each (user, month) clipped to the active span — so a user active
    * for years materializes at most a 744-slot array per row, not one
    * span-length array (the unchunked `sequence(lo, hi)` row is the
    * thing that OOMs on decade-long histories at 100 TB). */
  def gapFillHourly(s: SparkSession, d: String): DataFrame = {
    val hours = ev(s, d).select(col("user_id"),
      date_trunc("hour", col("ts")).as("hour"))
    val counts = hours.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("cnt"))
    val month = expr("INTERVAL 1 MONTH")
    val hour = expr("INTERVAL 1 HOUR")
    val dense = hours.groupBy(col("user_id"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("user_id"), col("lo"), col("hi"),
        explode(sequence(date_trunc("month", col("lo")),
          date_trunc("month", col("hi")), month)).as("m"))
      .select(col("user_id"),
        explode(sequence(
          greatest(col("m"), col("lo")),
          least(col("m") + month - hour, col("hi")),
          hour)).as("hour"))
    dense.join(counts, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Sessionization (30-minute inactivity gap) per user, gaps-and-islands
    * form: lag -> new-session flag -> sum. One shuffle on user_id; at
    * scale the window state is bounded per user, and the same semantics
    * run incrementally via session_window in the streaming module. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val e = ev(s, d)
    val us = epochMicros(e)
    e.withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          us - col("prev_us") > lit(1800000000L), 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Semi-structured extraction: pull the numeric `k` field out of the
    * JSON-ish `props` string with a regexp (codegen'd, no UDF), then
    * aggregate per event type. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .withColumn("k_val",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("k_val")).as("avg_k"),
        max(col("k_val")).as("max_k"))
      .orderBy(col("event_type"))

  /** As-of (point-in-time) join: each purchase event paired with the
    * same user's most recent strictly-earlier click. Composed from
    * built-ins — a last(ignoreNulls) over an unbounded-preceding-to-
    * previous-row window on the unioned event stream — rather than a
    * custom physical operator: one shuffle on user_id, sorted once,
    * O(1) state per row. This is the standard Spark formulation of what
    * DuckDB/Pandas call ASOF JOIN (the oracle uses DuckDB's native
    * ASOF). */
  def asofJoin(s: SparkSession, d: String): DataFrame =
    asofJoinOn(ev(s, d))

  /** Core of [[asofJoin]] over an arbitrary events frame (testable with
    * constructed timestamp ties). Strictly-earlier semantics (ASOF
    * requires p.ts > c.ts): within a timestamp tie, purchases sort
    * BEFORE clicks, so the up-to-previous-row frame of a purchase can
    * never contain a same-ts click. Among equal-ts clicks the last in
    * frame order (max event_id) wins — a deterministic tie-break. */
  def asofJoinOn(events: DataFrame): DataFrame = {
    val isClick = when(col("event_type") === "click", 1).otherwise(0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), isClick, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Bucketed time-range join: count event pairs within 60 seconds of
    * each other. A naive theta-join (|ta - tb| <= 60s) is a cartesian
    * product; bucketing each event into a 60s epoch bucket and probing
    * bucket-1/bucket/bucket+1 turns it into an equi-join — candidate
    * volume drops from O(n^2) to O(n x events-per-2min), and the plan is
    * a plain shuffled hash join that survives any scale. A bucket-diff
    * of <=1 is necessary for |dt| <= 60s, and each qualifying pair
    * matches on exactly one probe value, so no dedup is needed. */
  def rangeJoinPairs(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val base = e.select(col("event_id"), epochMicros(e).as("us"))
    val bucketLen = 60000000L // 60s in micros
    val left = base
      .withColumn("bucket", floor(col("us") / bucketLen).cast("long"))
    val right = base
      .toDF("b_event_id", "b_us")
      .withColumn("b_bucket", floor(col("b_us") / bucketLen).cast("long"))
      .withColumn("bucket", explode(array(
        col("b_bucket") - 1, col("b_bucket"), col("b_bucket") + 1)))
    left.join(right, Seq("bucket"))
      .filter(col("event_id") < col("b_event_id") &&
        abs(col("us") - col("b_us")) <= bucketLen)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** The naive theta-join formulation of [[rangeJoinPairs]] — written
    * the way a user would (`|ta - tb| <= 60s`), relying on
    * [[graft.plans.RangeJoinRule]] to rewrite it into the bucketed
    * equi-join at optimization time. Same oracle as e06; the spec also
    * asserts the physical plan has no nested-loop/cartesian join. */
  def rangeJoinPairsNaive(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val base = e.select(col("event_id"), epochMicros(e).as("us"))
    val right = base.toDF("b_event_id", "b_us")
    base.join(right,
      col("event_id") < col("b_event_id") &&
        abs(col("us") - col("b_us")) <= lit(60000000L))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Sliding daily-activity rollup: per user, events per day plus a
    * running cumulative count over days (window frame). */
  def dailyCumulative(s: SparkSession, d: String): DataFrame = {
    val daily = ev(s, d)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_cnt", sum(col("cnt")).over(w))
      .orderBy(col("user_id"), col("day"))
  }

  /** Ordered conversion funnel over N stages (default view → click →
    * purchase): a user converts a step only with an event STRICTLY
    * AFTER completing the previous step (min-ts semantics, the
    * standard product-analytics funnel). One per-user min aggregation
    * per stage, chained by strictly-later joins — each is one shuffle
    * on user_id with map-side partial mins, and each stage's frame is
    * one row per surviving user, so the chain's cost is bounded by the
    * user count, not the event count, after the first aggregate.
    * Output is one row per funnel stage (labelled by the cumulative
    * `a>b>c` path) with its surviving-user count. */
  def funnel(s: SparkSession, d: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got ${stages.mkString(", ")}")
    val e = ev(s, d)
    def firstAfter(evType: String, prev: DataFrame,
        prevCol: String, outCol: String): DataFrame =
      e.filter(col("event_type") === evType).as("e")
        .join(prev.as("p"), col("e.user_id") === col("p.user_id") &&
          col("e.ts") > col(s"p.$prevCol"))
        .groupBy(col("e.user_id").as("user_id"))
        .agg(min(col("e.ts")).as(outCol))
    val first = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val frames = stages.tail.zipWithIndex.scanLeft(first) {
      case (prev, (st, i)) => firstAfter(st, prev, s"t${i + 1}", s"t${i + 2}")
    }
    val labels = stages.tail.scanLeft(stages.head)(_ + ">" + _)
    def stage(name: String, df: DataFrame, ord: Int): DataFrame =
      df.agg(count(lit(1)).cast("long").as("users"))
        .select(lit(ord).cast("long").as("step_ord"),
          lit(name).as("step"), col("users"))
    labels.zip(frames).zipWithIndex
      .map { case ((name, df), i) => stage(name, df, i + 1) }
      .reduce(_.unionByName(_))
      .orderBy(col("step_ord"))
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * FIRST event; for each (cohort, week offset) the count of cohort
    * members active that week. Two aggregates — first-touch per user,
    * distinct (user, week) activity — joined on user_id and rolled
    * up; every shuffle is keyed on user_id or the bounded (cohort,
    * offset) pair, and the output is cohorts × offsets, metadata-
    * sized at any event scale. */
  def retentionCohorts(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val weeks = e.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
    val first = weeks.groupBy(col("user_id"))
      .agg(min(col("wk")).as("w0"))
    weeks.join(first, "user_id")
      .groupBy(date_format(col("w0"), "yyyy-MM-dd").as("cohort"),
        (datediff(col("wk"), col("w0")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }
}
