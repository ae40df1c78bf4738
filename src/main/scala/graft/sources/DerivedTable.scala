package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained DERIVED tables — changelog-driven
  * materialized-view refresh, the composition the lakehouse protocol
  * exists to enable (the "medallion" bronze→silver step, Iceberg's
  * incremental-scan consumer, Delta's `MERGE`-from-CDF recipe): a
  * destination table holds `transform(source)` and each refresh
  * advances it by reading ONLY the source commits since the last
  * refresh ([[Versioned.readChanges]] — O(changed files + tombstone
  * keys), never a source rescan), reducing them to final per-key
  * states, and landing ONE atomic [[Versioned.applyChanges]] commit.
  *
  * The processed source version is pinned in the destination's own
  * commit note (`src=vN` — the same pin discipline as the persisted
  * search indexes), so the cursor travels WITH the table: any engine
  * or session resumes from the note, a crashed refresh never
  * half-advances (note and data land in one commit), and time travel
  * over the destination shows which source version each state
  * reflects.
  *
  * Contract on [[Refresh.transform]]: ROW-PURE with respect to `key`
  * — each output row derives from the single input row with the same
  * key value, keys pass through unchanged, and dropping a row
  * (filtering) is allowed. That is exactly the class where row-level
  * deltas propagate without recomputation: an insert event maps to
  * an upsert of its transformed row (or a delete, when the transform
  * filters it out — a row can cross the filter boundary in either
  * direction on update), a delete event maps to a key delete.
  * Aggregating transforms need their own algebra (the persisted text
  * index's stats merge is one hand-built example) and are refused by
  * nothing here — they are simply the caller's responsibility to NOT
  * hand in.
  *
  * Scale shape per refresh: one changelog read over the delta, one
  * per-key last-event reduction (a map-side-combinable max_by keyed
  * on `key`), one CoW/MoR commit touching only files holding changed
  * keys. Nothing scales with the source's total size or history
  * length; a full rebuild happens exactly once, at bootstrap. */
object DerivedTable {

  private def pinnedSrcVersion(s: SparkSession, dstDir: String): Int = {
    val v = Versioned.currentVersion(s, dstDir)
    Versioned.commitNotes(s, dstDir).get(v)
      .flatMap(_.split(";").collectFirst {
        case p if p.trim.startsWith("src=v") =>
          p.trim.stripPrefix("src=v").toInt
      })
      .getOrElse(throw new IllegalStateException(
        s"$dstDir exists but its head commit carries no src=v pin — " +
          "not a derived table (refresh would corrupt it); use a " +
          "fresh destination directory"))
  }

  /** Advance `dstDir` to reflect `transform` applied to `srcDir`'s
    * current snapshot. Bootstraps (full build) when `dstDir` has no
    * committed version; no-ops when the pin already matches the
    * source head. Returns (fromVersion, toVersion) processed —
    * (to, to) for the no-op, (0, to) for the bootstrap. */
  def refresh(s: SparkSession, srcDir: String, dstDir: String,
      key: String, transform: DataFrame => DataFrame,
      partitionCol: Option[String] = None): (Int, Int) = {
    val to = Versioned.currentVersion(s, srcDir)
    require(to > 0, s"no committed source version at $srcDir")
    val dstV = Versioned.currentVersion(s, dstDir)
    if (dstV == 0) {
      val full = transform(Versioned.read(s, srcDir))
      require(full.columns.contains(key),
        s"transform must preserve the key column '$key'")
      // every destination commit declares key stats: applyChanges
      // prunes its touched-file probe with the batch's key range, so
      // an append-mostly source (monotone keys) refreshes WITHOUT
      // scanning the standing destination — O(candidate files)
      Versioned.commit(full, dstDir, partitionCol,
        note = Some(s"src=v$to"), statsCols = Seq(key))
      return (0, to)
    }
    val from = pinnedSrcVersion(s, dstDir)
    require(from <= to, s"$dstDir pins src=v$from beyond the source " +
      s"head v$to — the source was rolled back or replaced; rebuild " +
      "into a fresh destination")
    if (from == to) return (to, to)
    val events = Versioned.readChanges(s, srcDir, from, to)
    // reduce the range to each key's FINAL state. Within one commit a
    // copy-on-write update surfaces as delete(old)+insert(new) at the
    // SAME version, so the tie-break must let the insert win; across
    // commits the version decides.
    val isIns = col(Versioned.ChangeTypeCol) === lit("insert")
    // persisted around the fan-out: applyChanges runs ~6 independent
    // actions (preflight count/range, emptiness probes, the overlap
    // check, the rewrite) and each would otherwise re-execute the
    // changelog read + this shuffle + the transform from scratch
    val last = events.groupBy(col(key))
      .agg(max_by(struct(events.columns.map(col): _*),
        struct(col(Versioned.CommitVersionCol),
          when(isIns, 1).otherwise(0))).as("e"))
      .select(col("e.*"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lastIns = last.filter(isIns)
        .drop(Versioned.ChangeTypeCol, Versioned.CommitVersionCol)
      val transformed = transform(lastIns)
      require(transformed.columns.contains(key),
        s"transform must preserve the key column '$key'")
      // a changed row the transform now FILTERS OUT must leave the
      // destination — it may have passed under its previous values
      val filteredOut = lastIns.select(col(key))
        .join(transformed.select(col(key)), Seq(key), "left_anti")
      val dels = last.filter(!isIns).select(col(key))
        .unionByName(filteredOut).distinct()
      // the pin advances exactly when a commit lands (note and data
      // are one publish). A range of METADATA-ONLY source commits
      // (renames, tags) yields no events and no commit, so the pin
      // holds at `from` — the next refresh re-walks the same range,
      // which is safe (upsert-by-key and delete-by-key are
      // idempotent) and O(that range's deltas), not a recompute.
      Versioned.applyChanges(s, dstDir, upserts = transformed,
        deleteKeys = dels, key = key, partitionCol = partitionCol,
        statsCols = Seq(key), note = Some(s"src=v$to"))
    } finally last.unpersist(blocking = false)
    (from, to)
  }

  /** Driver-visible gate (q52): a curated projection of the documents
    * table maintained through bootstrap → source append → one atomic
    * mixed batch (updates crossing the filter boundary in BOTH
    * directions + key deletes), each step advanced by [[refresh]] and
    * the final state checked row-for-row against a full recompute.
    * All facts reduce to constants DuckDB derives from the fixture. */
  def derivedRefreshGate(s: SparkSession, d: String): DataFrame = {
    val work = java.nio.file.Files
      .createTempDirectory("graft-derived-gate")
    val src = work.resolve("src").toString
    val dst = work.resolve("dst").toString
    val docs = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val t: DataFrame => DataFrame =
      _.filter(col("n_chars") >= 300)
        .select(col("doc_id"), col("source"),
          (col("n_chars") * 2).as("weight"))
    Versioned.commit(docs.filter(col("doc_id") < 300), src)
    refresh(s, src, dst, "doc_id", t)
    val c1 = Versioned.read(s, dst).count()
    Versioned.append(docs.filter(col("doc_id") >= 300), src)
    refresh(s, src, dst, "doc_id", t)
    val c2 = Versioned.read(s, dst).count()
    // one atomic CDC batch: two rows updated BELOW the filter bar,
    // two updated above it, plus key deletes — dst must drop the
    // fallers, adopt the risers, and forget the deleted keys
    val updates = docs.filter(col("doc_id").isin(1L, 2L, 3L, 4L, 5L))
      .withColumn("n_chars",
        when(col("doc_id") <= 3, lit(0L)).otherwise(lit(9999L)))
    Versioned.applyChanges(s, src, upserts = updates,
      deleteKeys = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")),
      key = "doc_id")
    val (rFrom, rTo) = refresh(s, src, dst, "doc_id", t)
    val c3 = Versioned.read(s, dst).count()
    // full-recompute equality, both directions (exceptAll is bag
    // semantics, so this is row-for-row including duplicates); both
    // sides persisted — each feeds two exceptAll consumers
    val expect = t(Versioned.read(s, src))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = Versioned.read(s, dst)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eq = got.exceptAll(expect).isEmpty &&
      expect.exceptAll(got).isEmpty
    expect.unpersist(blocking = false)
    got.unpersist(blocking = false)
    // a no-op refresh must not publish a new destination version
    val vBefore = Versioned.currentVersion(s, dst)
    val noop = refresh(s, src, dst, "doc_id", t)
    val noopOk = noop == ((rTo, rTo)) &&
      Versioned.currentVersion(s, dst) == vBefore
    // refusing a pin-less destination is part of the contract
    val plain = work.resolve("plain").toString
    Versioned.commit(docs.limit(3), plain)
    val refused = scala.util.Try(
      refresh(s, src, plain, "doc_id", t)).isFailure
    import s.implicits._
    Seq((c1, c2, c3, rFrom.toLong, rTo.toLong,
        if (eq) 1L else 0L, if (noopOk) 1L else 0L,
        if (refused) 1L else 0L))
      .toDF("rows_v1", "rows_v2", "rows_v3", "refresh_from",
        "refresh_to", "eq_full_recompute", "noop_stable",
        "refused_unpinned")
  }
}
