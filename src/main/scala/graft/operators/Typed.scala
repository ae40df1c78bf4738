package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed Dataset[T] surface — case-class Encoders with compile-time field
  * checks, for the places where a row model is stable enough to deserve
  * types. The plan is identical to the DataFrame formulation (Catalyst
  * sees through typed filters expressed as column predicates); typed
  * lambda filters would break pushdown, so predicates stay as Columns
  * and only the row *shape* is typed. */
object Typed {

  case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  case class FlagRevenue(l_returnflag: String, n_items: Long,
      revenue: Double)

  /** Revenue per return flag over the typed Dataset — groupByKey +
    * typed result rows, Column-based math so codegen and pushdown are
    * untouched. */
  def revenueByFlag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.load(s, d, "lineitem").as[LineItem]
    ds.filter(col("l_quantity") > 5)
      .groupByKey(_.l_returnflag)
      .agg(
        count(lit(1)).as("n_items").as[Long],
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue").as[Double])
      .map { case (flag, n, rev) => FlagRevenue(flag, n, rev) }
      .toDF()
      .orderBy(col("l_returnflag"))
  }
}
