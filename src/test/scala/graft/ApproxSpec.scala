package graft

import graft.operators.{Relational, Similarity}

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact per group") {
    val approx = Relational.approxAggs(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey"),
        org.apache.spark.sql.functions.countDistinct("l_suppkey"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    exact.foreach { case (k, (p, s)) =>
      val (ap, as) = approx(k)
      assert(math.abs(ap - p) <= 0.1 * p, s"parts $k: $ap vs $p")
      assert(math.abs(as - s) <= 0.1 * s, s"supps $k: $as vs $s")
    }
  }

  test("approx_percentile within 10% of exact percentile") {
    val approx = Relational.approxAggs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = Relational.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, p50) =>
      assert(math.abs(approx(k) - p50) <= 0.1 * p50)
    }
  }

  test("LSH top-k recall clears the multi-table floor") {
    val e = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val a = Similarity.lshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (e & a).size.toDouble / e.size
    info(s"LSH recall@${Similarity.K} = $recall")
    assert(recall >= 0.2)
  }

  test("LSH never invents a better-than-exact neighbor") {
    val best = Similarity.bruteForceTopK(spark, sf).collect()
      .filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    Similarity.lshTopK(spark, sf).collect().foreach { r =>
      assert(r.getDouble(3) <= best(r.getLong(0)) + 1e-12)
    }
  }
}
