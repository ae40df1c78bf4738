package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Etl

class EtlSpec extends SparkSpec {

  private val work = "target/tmp/etl-spec"

  test("csv round-trip: infer, cast, derive date, sort, partitioned write") {
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    // CSV stage (timestamps serialized as strings, like a raw feed)
    src.withColumn("l_shipdate", date_format(col("l_shipdate"),
        "yyyy-MM-dd HH:mm:ss"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$work/raw_csv")

    Etl.ingestCsv(spark, s"$work/raw_csv", s"$work/table",
      Etl.IngestSpec(
        casts = Map("l_shipdate" -> TimestampType,
          "l_quantity" -> DoubleType),
        deriveDate = Some(("l_shipdate", "ship_day")),
        sortCols = Seq("l_orderkey", "l_linenumber"),
        partitionCol = Some("ship_day")))

    val back = Etl.readTable(spark, s"$work/table")
    assert(back.count() == src.count())
    assert(back.schema("l_shipdate").dataType == TimestampType)
    assert(back.columns.contains("ship_day"))
    // partition layout exists on disk (hive-style dirs)
    val dirs = new java.io.File(s"$work/table").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("ship_day=")))
  }

  test("createOrReplace atomically replaces table contents") {
    import spark.implicits._
    Etl.createOrReplace(Seq(1, 2, 3).toDF("v"), s"$work/swap", None)
    assert(Etl.readTable(spark, s"$work/swap").count() == 3)
    Etl.createOrReplace(Seq(9).toDF("v"), s"$work/swap", None)
    val after = Etl.readTable(spark, s"$work/swap")
    assert(after.count() == 1 && after.head().getInt(0) == 9)
  }

  test("partition pruning reaches the scan for the derived date") {
    val table = s"$work/table"
    val pruned = Etl.readTable(spark, table)
      .filter(col("ship_day") === "1995-06-17")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must appear as a PartitionFilters entry, not a
    // post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") &&
      scan.contains("ship_day"))
  }
}
