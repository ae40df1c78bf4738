package graft

import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Dynamic partition pruning fires THROUGH the graft read plan: a
  * hive-partitioned graft table joined to a selectively-filtered
  * file-backed dim gets Spark's runtime `dynamicpruning` subquery on
  * the fact scan's partition column — whole directories skipped at
  * execution time by the dim's surviving keys, on top of the static
  * manifest/sidecar pruning the engine does itself. Works because the
  * relation expands to ordinary FileSourceScans with hive partition
  * discovery (basePath per version root); nothing graft-side needs to
  * cooperate. Note the dim must be file-backed: Spark's heuristic
  * (reuseBroadcastOnly) declines to duplicate a LocalRelation build
  * side, so a literal in-memory dim joins without DPP — same as any
  * parquet table. */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("join to a filtered dim injects dynamicpruning on the fact scan") {
    val t = "target/tmp/dpp_fact"
    val dt = "target/tmp/dpp_dim"
    Seq(t, dt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val fact = (1 to 20000).map(i => (i, i % 50, i * 1.5))
      .toDF("id", "pk", "v")
    Versioned.commit(fact, t, partitionCol = Some("pk"))
    (0 until 50).map(i => (i, if (i < 2) "keep" else "drop"))
      .toDF("d_pk", "flag").write.mode("overwrite").parquet(dt)
    val dim = spark.read.parquet(dt).filter(col("flag") === "keep")

    // programmatic read
    val g = Versioned.read(spark, t)
      .join(dim, col("pk") === col("d_pk")).agg(sum("v"))
    val expected = (1 to 20000).filter(i => i % 50 < 2)
      .map(_ * 1.5).sum
    assert(math.abs(g.head().getDouble(0) - expected) < 1e-6)
    assert(g.queryExecution.executedPlan.toString
      .contains("dynamicpruning"), "DPP must fire on the graft scan")

    // SQL catalog read
    val abs = new java.io.File(t).getAbsolutePath
    val dabs = new java.io.File(dt).getAbsolutePath
    val q = spark.sql(s"SELECT sum(v) FROM graft.`$abs` f " +
      s"JOIN parquet.`$dabs` d ON f.pk = d.d_pk WHERE d.flag = 'keep'")
    assert(math.abs(q.head().getDouble(0) - expected) < 1e-6)
    assert(q.queryExecution.executedPlan.toString
      .contains("dynamicpruning"))
  }
}
