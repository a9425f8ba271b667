package graft.schema

import org.apache.spark.sql.types._

/** The reference's declared 19-column target schema
  * (`data_processing.py:685-705`; Spark mapping SURVEY §1.2) plus the code
  * tables documented in the reference README (`README.md:33-77`).
  *
  * Money columns stay FloatType deliberately — the reference uses float32,
  * and keeping the narrow type preserves its rounding behavior (§7.5.4).
  */
object TaxiSchema {

  val moneyColumns: Seq[String] = Seq(
    "fare_amount", "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "total_amount", "congestion_surcharge", "airport_fee")

  /** C7's component columns: total_amount should equal their sum. */
  val componentColumns: Seq[String] = Seq(
    "fare_amount", "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "congestion_surcharge", "airport_fee")

  /** C1's median-imputed numeric columns (11: passenger count, distance,
    * and the 9 money columns — `data_processing.py:86-88`). */
  val medianImputed: Seq[String] =
    Seq("passenger_count", "trip_distance") ++ moneyColumns

  /** C2's mode-imputed categorical columns (`data_processing.py:97-105`). */
  val modeImputed: Seq[String] = Seq("store_and_fwd_flag", "RatecodeID", "payment_type")

  /** C3's zero-filled location columns (`data_processing.py:107-114`). */
  val zeroFilled: Seq[String] = Seq("PULocationID", "DOLocationID")

  val schema: StructType = StructType(Seq(
    StructField("VendorID", ByteType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", ByteType),
    StructField("trip_distance", FloatType),
    StructField("RatecodeID", ByteType),
    StructField("store_and_fwd_flag", StringType),
    StructField("PULocationID", ShortType),
    StructField("DOLocationID", ShortType),
    StructField("payment_type", ByteType)) ++
    moneyColumns.map(StructField(_, FloatType)))

  /** Typed view of the 19-column row (SURVEY §1.1: "optionally a
    * Dataset[TaxiTrip] case class for the core 19 columns"). Boxed types
    * mirror the schema's nullability; `toTyped` below binds the encoder. */
  final case class TaxiTrip(
      VendorID: Option[Byte],
      tpep_pickup_datetime: Option[java.sql.Timestamp],
      tpep_dropoff_datetime: Option[java.sql.Timestamp],
      passenger_count: Option[Byte],
      trip_distance: Option[Float],
      RatecodeID: Option[Byte],
      store_and_fwd_flag: Option[String],
      PULocationID: Option[Short],
      DOLocationID: Option[Short],
      payment_type: Option[Byte],
      fare_amount: Option[Float],
      extra: Option[Float],
      mta_tax: Option[Float],
      tip_amount: Option[Float],
      tolls_amount: Option[Float],
      improvement_surcharge: Option[Float],
      total_amount: Option[Float],
      congestion_surcharge: Option[Float],
      airport_fee: Option[Float])

  /** Bind the case-class encoder to a schema-conforming DataFrame. */
  def toTyped(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[TaxiTrip] = {
    import org.apache.spark.sql.Encoders
    df.as(Encoders.product[TaxiTrip])
  }

  /** Code tables (`README.md:33-77`). */
  val rateCodes: Map[Int, String] = Map(
    1 -> "Standard rate", 2 -> "JFK", 3 -> "Newark",
    4 -> "Nassau or Westchester", 5 -> "Negotiated fare", 6 -> "Group ride")
  val airportRateCodes: Seq[Int] = Seq(2, 3) // D7 (JFK, Newark)
  val paymentTypes: Map[Int, String] = Map(
    0 -> "Flex Fare", 1 -> "Credit card", 2 -> "Cash", 3 -> "No charge",
    4 -> "Dispute", 5 -> "Unknown", 6 -> "Voided trip")
  val creditCardPayment: Int = 1 // D8
}
