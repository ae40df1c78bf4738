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
    // positional args work too; vacuum returns the retained count
    val kept = spark.sql(s"CALL graft.system.vacuum('$abs', 2)")
      .head().getInt(0)
    assert(kept == 2)
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
