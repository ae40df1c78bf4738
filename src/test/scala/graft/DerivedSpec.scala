package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DerivedTable, Versioned}

class DerivedSpec extends SparkSpec {

  private def clean(paths: String*): Unit = paths.foreach(p =>
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

  private val t: DataFrame => DataFrame =
    _.filter(col("v") >= 10).select(col("k"), (col("v") * 2).as("w"))

  test("refresh: bootstrap, O(delta) advance, filter-boundary " +
      "crossings, delete propagation, pin travel") {
    import spark.implicits._
    val src = "target/tmp/derived-src"
    val dst = "target/tmp/derived-dst"
    clean(src, dst)
    Versioned.commit(Seq((1L, 20L), (2L, 5L), (3L, 30L))
      .toDF("k", "v"), src)
    // bootstrap = full build, pinned to the source head
    assert(DerivedTable.refresh(spark, src, dst, "k", t) == ((0, 1)))
    assert(Versioned.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 40L), (3L, 60L)))
    // no-op: the pin already matches — no new destination version
    assert(DerivedTable.refresh(spark, src, dst, "k", t) == ((1, 1)))
    assert(Versioned.currentVersion(spark, dst) == 1)
    // source advances twice before ONE refresh: an append, then an
    // atomic CDC batch moving rows across the filter boundary in both
    // directions (2 rises, 3 falls) and deleting key 1
    Versioned.append(Seq((4L, 15L), (5L, 3L)).toDF("k", "v"), src)
    Versioned.applyChanges(spark, src,
      upserts = Seq((2L, 50L), (3L, 4L)).toDF("k", "v"),
      deleteKeys = Seq(Tuple1(1L)).toDF("k"), key = "k")
    assert(DerivedTable.refresh(spark, src, dst, "k", t) == ((1, 3)))
    assert(Versioned.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 100L), (4L, 30L)))
    // the cursor is IN the table: the head note pins the processed
    // source version, so any session/engine resumes from the bytes
    assert(Versioned.commitNotes(spark, dst)(
      Versioned.currentVersion(spark, dst)).contains("src=v3"))
    // row-for-row equality with the full recompute, bag semantics
    val expect = t(Versioned.read(spark, src))
    val got = Versioned.read(spark, dst)
    assert(got.exceptAll(expect).isEmpty &&
      expect.exceptAll(got).isEmpty)
    // destination history shows WHICH source state each version
    // reflects — time travel to the bootstrap still returns it
    assert(Versioned.read(spark, dst, Some(1)).count() == 2)
    // append-mostly fast path: a refresh whose keys sit ABOVE the
    // standing destination's range must LINK the old files untouched
    // (key stats prune applyChanges' touched-file probe to nothing →
    // linked append), never rewrite them
    val before = Versioned.files(spark, dst).collect()
      .map(_.getString(0)).toSet
    Versioned.append(Seq((100L, 40L)).toDF("k", "v"), src)
    assert(DerivedTable.refresh(spark, src, dst, "k", t) == ((3, 4)))
    val after = Versioned.files(spark, dst).collect()
      .map(_.getString(0)).toSet
    assert(before.subsetOf(after),
      "disjoint-key refresh must not rewrite standing files")
    assert(Versioned.read(spark, dst).filter(col("k") === 100L)
      .head().getLong(1) == 80L)
  }

  test("refresh refusals: pin-less destination, key-dropping " +
      "transform, rolled-back source") {
    import spark.implicits._
    val src = "target/tmp/derived-ref-src"
    clean(src)
    Versioned.commit(Seq((1L, 20L)).toDF("k", "v"), src)
    // a destination without a src=v pin is NOT a derived table
    val plain = "target/tmp/derived-ref-plain"
    clean(plain)
    Versioned.commit(Seq((9L, 9L)).toDF("k", "v"), plain)
    val e1 = intercept[IllegalStateException](
      DerivedTable.refresh(spark, src, plain, "k", t))
    assert(e1.getMessage.contains("no src=v pin"))
    // a transform that drops the key cannot propagate deltas
    val dst = "target/tmp/derived-ref-dst"
    clean(dst)
    val e2 = intercept[IllegalArgumentException](
      DerivedTable.refresh(spark, src, dst, "k",
        _.select(col("v"))))
    assert(e2.getMessage.contains("preserve the key"))
    // a pin BEYOND the source head means the source was rolled back
    // or replaced — advancing would fabricate history
    val ahead = "target/tmp/derived-ref-ahead"
    clean(ahead)
    Versioned.commit(Seq((1L, 40L)).toDF("k", "w"), ahead,
      note = Some("src=v99"))
    val e3 = intercept[IllegalArgumentException](
      DerivedTable.refresh(spark, src, ahead, "k", t))
    assert(e3.getMessage.contains("beyond the source"))
  }
}
