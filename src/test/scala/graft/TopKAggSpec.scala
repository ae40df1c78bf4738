package graft

import org.apache.spark.sql.functions._

/** Contract tests for the native graft_topk bounded-heap aggregate:
  * equality with the window-rank formulation it replaced, duplicate
  * folding, under-filled groups, and tie-breaking. */
class TopKAggSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def viaAgg(df: DataFrame, k: Int): Set[(Long, Long, Long, Double)] =
    df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("score"), col("id"), lit(k))
        .as("nbrs"))
      .select(col("g"), posexplode(col("nbrs")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id"), col("col.cosine"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def viaWindow(df: DataFrame, k: Int): Set[(Long, Long, Long, Double)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    df.dropDuplicates("g", "id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .collect()
      .map(r => (r.getAs[Long]("g"), r.getAs[Long]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("score")))
      .toSet
  }

  private lazy val random: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 4 groups x 200 rows, scores drawn from few distinct values so
    // ties exercise the (score desc, id asc) ordering.
    (1 to 800).map { i =>
      (i % 4L, i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }.toDF("g", "id", "score").repartition(8).cache()
  }

  test("agg equals the window-rank formulation on random tied data") {
    assert(viaAgg(random, 5) == viaWindow(random, 5))
    assert(viaAgg(random, 1) == viaWindow(random, 1))
    assert(viaAgg(random, 17) == viaWindow(random, 17))
  }

  test("duplicate (id, score) inputs fold — no distinct pass needed") {
    val dup = random.union(random).union(random)
    assert(viaAgg(dup, 5) == viaWindow(random, 5))
  }

  test("groups smaller than k return all rows, ranked") {
    import spark.implicits._
    val tiny = Seq((0L, 10L, 0.5), (0L, 11L, 0.9), (1L, 12L, 0.1))
      .toDF("g", "id", "score")
    val got = viaAgg(tiny, 5)
    assert(got == Set((0L, 1L, 11L, 0.9), (0L, 2L, 10L, 0.5),
      (1L, 1L, 12L, 0.1)))
  }

  test("ties break toward the lower id") {
    import spark.implicits._
    val tied = Seq((0L, 20L, 1.0), (0L, 10L, 1.0), (0L, 30L, 1.0))
      .toDF("g", "id", "score")
    assert(viaAgg(tied, 2) == Set((0L, 1L, 10L, 1.0), (0L, 2L, 20L, 1.0)))
  }

  test("null scores and ids are skipped") {
    import spark.implicits._
    val withNulls = Seq(
      (0L, Some(10L), Some(0.9)), (0L, None, Some(0.5)),
      (0L, Some(11L), None), (0L, Some(12L), Some(0.7)))
      .toDF("g", "id", "score")
    assert(viaAgg(withNulls, 5) ==
      Set((0L, 1L, 10L, 0.9), (0L, 2L, 12L, 0.7)))
  }

  test("string variant equals the window-rank formulation across merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val df = (1 to 1000).map { i =>
      (i % 3L, words(rnd.nextInt(words.length)),
        math.floor(rnd.nextDouble() * 5) / 5.0)
    }.toDF("g", "token", "score")
      .groupBy("g", "token").agg(max(col("score")).as("score"))
      .repartition(8).cache()
    val viaStrAgg = df.groupBy(col("g"))
      .agg(call_function("graft_topk_str",
        col("score"), col("token"), lit(4)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.token"), col("col.score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("token"))
    val viaWin = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 4)
      .collect()
      .map(r => (r.getAs[Long]("g"), r.getAs[Long]("rank"),
        r.getAs[String]("token"), r.getAs[Double]("score")))
      .toSet
    assert(viaStrAgg == viaWin)
  }

  test("k must be a positive literal") {
    import spark.implicits._
    val df = Seq((0L, 1L, 0.5)).toDF("g", "id", "score")
    intercept[Exception] {
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", col("score"), col("id"), lit(0)))
        .collect()
    }
  }
}
