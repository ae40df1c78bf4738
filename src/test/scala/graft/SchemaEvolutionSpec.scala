package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.sources.Versioned

/** Metadata-only schema evolution (add/drop/rename columns) — the
  * Iceberg field-id analogs over the sidecar step chain, and their
  * `ALTER TABLE` SQL wiring. */
class SchemaEvolutionSpec extends SparkSpec {
  private val work = "target/tmp/schema-evo-spec"

  private def fresh(name: String): (String, String) = {
    val t = s"$work/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    (t, s"graft.`${new java.io.File(t).getAbsolutePath}`")
  }

  test("addColumn is metadata-only and null-fills older files") {
    import spark.implicits._
    val (t, _) = fresh("add_basic")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    val filesBefore = Versioned.dataFileCount(spark, t)
    Versioned.addColumn(spark, t, "score", LongType)
    assert(Versioned.currentVersion(spark, t) == 2)
    assert(Versioned.dataFileCount(spark, t) == filesBefore)
    val cur = Versioned.read(spark, t)
    assert(cur.columns.contains("score"))
    assert(cur.filter(col("score").isNull).count() == 2)
    // time travel: v1 never shows the column
    assert(!Versioned.read(spark, t, Some(1)).columns.contains("score"))
    // new appends carry it physically; old rows stay null
    Versioned.append(Seq((3, "c", 30L)).toDF("id", "v", "score"), t)
    val rows = Versioned.read(spark, t).orderBy("id").collect()
    assert(rows.map(r => Option(r.get(2))).toSeq ==
      Seq(None, None, Some(30L)))
    // adding an existing column refuses — case-insensitively, since
    // Spark resolution would make 'SCORE' vs 'score' ambiguous
    intercept[IllegalArgumentException] {
      Versioned.addColumn(spark, t, "score", LongType)
    }
    intercept[IllegalArgumentException] {
      Versioned.addColumn(spark, t, "SCORE", LongType)
    }
    intercept[IllegalArgumentException] {
      Versioned.renameColumn(spark, t, "v", "ID")
    }
  }

  test("dropColumn hides old data, re-add surfaces fresh values only") {
    import spark.implicits._
    val (t, _) = fresh("drop_readd")
    Versioned.commit(Seq((1, "a", 10L), (2, "b", 20L))
      .toDF("id", "v", "n"), t)
    Versioned.dropColumn(spark, t, "n")
    assert(!Versioned.read(spark, t).columns.contains("n"))
    // old snapshot still shows it (time travel)
    assert(Versioned.read(spark, t, Some(1)).columns.contains("n"))
    // re-add under the same name: old values must NOT resurrect
    // (Iceberg drop-then-re-add = a NEW field)
    Versioned.addColumn(spark, t, "n", LongType)
    val afterReadd = Versioned.read(spark, t).orderBy("id").collect()
    assert(afterReadd.forall(_.isNullAt(2)))
    // rows appended after the re-add carry real values
    Versioned.append(Seq((3, "c", 300L)).toDF("id", "v", "n"), t)
    val vals = Versioned.read(spark, t).orderBy("id")
      .collect().map(r => Option(r.get(2)))
    assert(vals.toSeq == Seq(None, None, Some(300L)))
    // dropping the last remaining column refuses
    val (t2, _) = fresh("drop_last")
    Versioned.commit(Seq(Tuple1(1)).toDF("only"), t2)
    intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, t2, "only")
    }
  }

  test("drop refuses while a live equality tombstone keys the column") {
    import spark.implicits._
    val (t, _) = fresh("drop_tomb")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    Versioned.deleteRows(spark, t, Seq(Tuple1(2)).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      Versioned.dropColumn(spark, t, "id")
    }
    assert(e.getMessage.contains("compact"))
    // compact absorbs the tombstone; the drop then succeeds
    Versioned.compact(spark, t)
    Versioned.dropColumn(spark, t, "id")
    assert(Versioned.read(spark, t).columns.toSeq == Seq("v"))
    assert(Versioned.read(spark, t).collect().map(_.getString(0))
      .toSeq == Seq("a"))
  }

  test("rename interleaves with drop: DROP y then RENAME x TO y") {
    import spark.implicits._
    val (t, _) = fresh("drop_then_rename")
    Versioned.commit(Seq((1, "oldY", "oldX")).toDF("id", "y", "x"), t)
    Versioned.dropColumn(spark, t, "y")
    Versioned.renameColumn(spark, t, "x", "y")
    val cur = Versioned.read(spark, t)
    assert(cur.columns.sorted.toSeq == Seq("id", "y"))
    // the surviving y carries the OLD x values, not the dropped y's
    assert(cur.head().getString(1) == "oldX")
    // time travel preserves both originals
    val v1 = Versioned.read(spark, t, Some(1)).head()
    assert(v1.getString(1) == "oldY" && v1.getString(2) == "oldX")
  }

  test("SQL ALTER TABLE ADD/DROP COLUMN round-trips via the catalog") {
    import spark.implicits._
    val (t, g) = fresh("sql_alter")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t)
    spark.sql(s"ALTER TABLE $g ADD COLUMN score BIGINT")
    assert(spark.table(g).columns.toSeq.contains("score"))
    spark.sql(s"INSERT INTO $g VALUES (2, 'b', 9)")
    val rows = spark.sql(s"SELECT id, score FROM $g ORDER BY id")
      .collect().map(r => (r.getInt(0), Option(r.get(1))))
    assert(rows.toSeq == Seq((1, None), (2, Some(9L))))
    spark.sql(s"ALTER TABLE $g DROP COLUMN v")
    assert(spark.table(g).columns.toSeq == Seq("id", "score"))
    // SQL time travel still shows the old shape
    assert(spark.sql(s"SELECT v FROM $g VERSION AS OF 1").count() == 1)
    // refusals: non-nullable add, positioned add, nested field
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $g ADD COLUMN req INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $g ADD COLUMN early INT FIRST")
    }
    // updates and merges see the evolved schema
    spark.sql(s"UPDATE $g SET score = -1 WHERE id = 1")
    assert(spark.sql(s"SELECT score FROM $g WHERE id = 1")
      .head().getLong(0) == -1L)
  }

  test("retypeColumn widens metadata-only; unsafe promotions refuse") {
    import spark.implicits._
    val (t, g) = fresh("retype")
    Versioned.commit(Seq((1, 10), (2, 2000000000)).toDF("id", "n"), t)
    val filesBefore = Versioned.dataFileCount(spark, t)
    spark.sql(s"ALTER TABLE $g ALTER COLUMN n TYPE BIGINT")
    assert(Versioned.dataFileCount(spark, t) == filesBefore)
    val cur = Versioned.read(spark, t)
    assert(cur.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // values intact through the widening; wide arithmetic works
    assert(cur.agg(sum(col("n"))).head().getLong(0) == 2000000010L)
    // new appends carry the wide type physically and mix with old files
    Versioned.append(Seq((3, 5000000000L)).toDF("id", "n"), t)
    assert(spark.sql(s"SELECT sum(n) FROM $g").head().getLong(0) ==
      7000000010L)
    // time travel shows the narrow written type
    assert(Versioned.read(spark, t, Some(1)).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // narrowing and cross-family retypes refuse loudly
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $g ALTER COLUMN n TYPE INT")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $g ALTER COLUMN id TYPE STRING")
    }
    // merge-on-read deletes keyed on the narrow type still apply
    val (t2, g2) = fresh("retype_mor")
    Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), t2)
    Versioned.deleteRows(spark, t2, Seq(Tuple1(2)).toDF("k"))
    Versioned.retypeColumn(spark, t2, "k",
      org.apache.spark.sql.types.LongType)
    assert(Versioned.read(spark, t2).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
  }

  test("refs metadata table lists tags, branches, and main") {
    import spark.implicits._
    val (t, _) = fresh("refs_meta")
    val abs = new java.io.File(t).getAbsolutePath
    Versioned.commit(Seq(Tuple1(1)).toDF("x"), t)
    Versioned.append(Seq(Tuple1(2)).toDF("x"), t)
    Versioned.tag(spark, t, "stable", Some(1))
    Versioned.createBranch(spark, t, "audit")
    val refs = spark.sql(
      s"SELECT name, type, version FROM graft.`$abs`.refs")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2))).toSet
    assert(refs == Set(("stable", "tag", 1), ("audit", "branch", 2),
      ("main", "branch", 2)))
  }

  test("schema steps survive vacuum while linked entries need them") {
    import spark.implicits._
    val (t, _) = fresh("evo_vacuum")
    Versioned.commit(Seq((1, "a")).toDF("id", "v"), t) // v1
    Versioned.addColumn(spark, t, "n", LongType) // v2 (step)
    Versioned.append(Seq((2, "b", 2L)).toDF("id", "v", "n"), t) // v3
    Versioned.append(Seq((3, "c", 3L)).toDF("id", "v", "n"), t) // v4
    Versioned.vacuum(spark, t, keep = 2)
    // v1's files are still linked through v3/v4 manifests, so the v2
    // add step must survive the vacuum for row 1 to show n = null
    val rows = Versioned.read(spark, t).orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.map(r => Option(r.get(2))).toSeq ==
      Seq(None, Some(2L), Some(3L)))
  }
}
