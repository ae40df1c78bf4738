package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.sources.Tables

/** Proves the bucketed-layout claim in SCALING.md: a large-large join on
  * the bucket key runs with NO shuffle exchange on either side, and
  * bucket-pruned scans stay correct. */
class BucketedJoinSpec extends SparkSpec {

  private val work = "target/tmp/bucketed"

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case o => o.children
    }
    p +: inner.flatMap(nodes)
  }

  test("join on the bucket key plans without a shuffle exchange") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    Tables.writeBucketed(
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bucketed", s"$work/li", "l_orderkey", 8)
    Tables.writeBucketed(
      Tables.load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice"),
      "ord_bucketed", s"$work/ord", "o_orderkey", 8)

    // MERGE hint prevents a broadcast from hiding the property under test
    val joined = spark.table("li_bucketed").hint("MERGE")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))
    joined.collect()

    val shuffles = nodes(joined.queryExecution.executedPlan)
      .filter(_.nodeName.startsWith("Exchange"))
    // the only exchange allowed is the post-join aggregate's — and even
    // that disappears because the join output is already clustered on
    // the key; assert no shuffle at all below the aggregate
    assert(shuffles.isEmpty,
      shuffles.map(_.nodeName).mkString(", "))

    // correctness against the plain-scan join
    val expect = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("tp"))
    assert(joined.collect().map(_.toString).sorted.toSeq ==
      expect.collect().map(_.toString).sorted.toSeq)
  }
}
