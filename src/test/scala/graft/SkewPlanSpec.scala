package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Skew}

class SkewPlanSpec extends SparkSpec {

  test("saltedJoin returns exactly the plain-join result") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, "o_custkey")
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("saltedDistinctCount matches countDistinct") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val want = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Skew.saltedDistinctCount(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // —— plan-quality assertions: the physical plans we designed for ——

  test("projectFilter pushes predicate and prunes columns at the scan") {
    val plan = Relational.projectFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(l_quantity"))
    assert(plan.contains("ReadSchema") && !plan.contains("l_returnflag"))
  }

  test("topK plans TakeOrderedAndProject, not a global sort") {
    val plan = Relational.topK(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("groupAgg runs partial then final hash aggregation") {
    val plan = Relational.groupAgg(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"))
    assert(plan.contains("HashAggregate"))
  }

  test("joinMulti broadcasts the dimension tables") {
    val plan = Relational.joinMulti(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("bucketed range join plans an equi-join, not a cartesian product") {
    val plan = graft.operators.Events.rangeJoinPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("RangeJoinRule rewrites the naive theta range join to an equi-join") {
    val df = graft.operators.Events.rangeJoinPairsNaive(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    // and the rewrite is exact: same count as the hand-bucketed form
    val manual = graft.operators.Events.rangeJoinPairs(spark, sf)
      .collect().head.getLong(0)
    assert(df.collect().head.getLong(0) == manual)
  }

  test("lateral top-n decorrelates to WindowGroupLimit, not a loop join") {
    // The correlated LATERAL (ORDER BY + LIMIT per customer) must plan
    // as the group-limit window over ONE orders shuffle joined back on
    // the key — a per-row nested-loop re-execution of the subquery
    // would be quadratic at scale.
    val plan = graft.SparkEntry.queries("q36_lateral_topn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("RangeJoinRule floor-division buckets negative values correctly") {
    import spark.implicits._
    // values straddling zero: pairs within |a-b| <= 10 across the origin
    val xs = Seq(-15L, -9L, -1L, 0L, 3L, 12L, 30L)
    val df = xs.toDF("a").withColumn("id", col("a"))
    val other = xs.toDF("b").withColumn("bid", col("b"))
    val joined = df.join(other,
      col("id") < col("bid") && abs(col("a") - col("b")) <= lit(10L))
    val got = joined.select(col("id"), col("bid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      x <- xs; y <- xs if x < y && math.abs(x - y) <= 10
    } yield (x, y)).toSet
    assert(got == want)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("filteredCount reads only the filter column") {
    val plan = Relational.filteredCount(spark, sf).queryExecution
      .executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_linenumber") &&
      !readSchema.contains("l_extendedprice"))
  }
}
