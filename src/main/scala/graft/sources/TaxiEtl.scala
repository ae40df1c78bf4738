package graft.sources

import org.apache.spark.sql.types._

/** Reference-exact ingest preset for the NYC yellow-taxi feed — the
  * declarative form of scripts/csv_to_ice.py in the reference:
  *
  *  - 20-column schema (csv_to_ice.py:31-52 DDL),
  *  - four explicit casts over the inferred CSV types
  *    (csv_to_ice.py:19-22),
  *  - derived `pickup_date` = date_format(tpep_pickup_datetime,
  *    'yyyy-MM-dd') (csv_to_ice.py:25) — a STRING, faithfully
  *    reproducing the reference's actual table (its TIMESTAMP DDL at :51
  *    is dead code; createOrReplace at :58 takes the DataFrame schema —
  *    SURVEY.md §1.2),
  *  - global sort by (VendorID, pickup_date) (csv_to_ice.py:27),
  *  - partitioned create-or-replace write on pickup_date
  *    (csv_to_ice.py:54, 58).
  *
  * Run with [[Etl.ingestCsv]](spark, csvGlob, tableDir, TaxiEtl.spec).
  */
object TaxiEtl {

  /** The table schema as actually produced (20 data columns +
    * pickup_date). */
  val schema: StructType = StructType(Seq(
    StructField("VendorID", IntegerType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("pickup_longitude", DoubleType),
    StructField("pickup_latitude", DoubleType),
    StructField("RateCodeID", IntegerType),
    StructField("store_and_fwd_flag", StringType),
    StructField("dropoff_longitude", DoubleType),
    StructField("dropoff_latitude", DoubleType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("pickup_date", StringType)))

  /** The csv_to_ice.py transform chain as an [[Etl.IngestSpec]]. */
  val spec: Etl.IngestSpec = Etl.IngestSpec(
    casts = Map(
      "tpep_pickup_datetime" -> TimestampType,
      "tpep_dropoff_datetime" -> TimestampType,
      "trip_distance" -> DoubleType,
      "passenger_count" -> IntegerType),
    deriveDate = Some(("tpep_pickup_datetime", "pickup_date")),
    sortCols = Seq("VendorID", "pickup_date"),
    partitionCol = Some("pickup_date"))
}
