package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.TaxiSchema

/** Golden tests of the reference-parity lifecycle on the FIXTURES.md §1
  * taxi fixture: every cleaning step (C1-C8, DD2, P5), the §7.5 derived-
  * column traps, schema-drift union, and metric shapes.
  */
class TaxiPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // 19-column rows; helper builds a Row with named overrides.
  private val defaults: Map[String, Any] = Map(
    "VendorID" -> 1.toByte,
    "tpep_pickup_datetime" -> ts("2024-03-04 10:00:00"), // Monday
    "tpep_dropoff_datetime" -> ts("2024-03-04 10:30:00"),
    "passenger_count" -> 2.toByte,
    "trip_distance" -> 5.0f,
    "RatecodeID" -> 1.toByte,
    "store_and_fwd_flag" -> "N",
    "PULocationID" -> 100.toShort,
    "DOLocationID" -> 200.toShort,
    "payment_type" -> 1.toByte,
    "fare_amount" -> 20.0f, "extra" -> 1.0f, "mta_tax" -> 0.5f,
    "tip_amount" -> 4.0f, "tolls_amount" -> 0.0f,
    "improvement_surcharge" -> 0.3f, "total_amount" -> 25.8f,
    "congestion_surcharge" -> 0.0f, "airport_fee" -> 0.0f)

  private def row(overrides: (String, Any)*): Row = {
    val m = defaults ++ overrides.toMap
    Row.fromSeq(TaxiSchema.schema.fields.map(f => m(f.name)))
  }

  private def frame(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), TaxiSchema.schema)

  test("C1: null numeric values get the exact pre-dedup median") {
    // distinct VendorIDs so the imputed row is not a full-row duplicate
    // (impute runs BEFORE dedup — an imputed row identical to an existing
    // one would legitimately collapse)
    val df = frame(
      row("trip_distance" -> 2.0f, "VendorID" -> 1.toByte),
      row("trip_distance" -> 4.0f, "VendorID" -> 2.toByte),
      row("trip_distance" -> 6.0f, "VendorID" -> 3.toByte),
      row("trip_distance" -> null, "VendorID" -> 4.toByte))
    val out = TaxiPipeline.clean(df)
    // median of {2,4,6} = 4
    assert(out.filter($"trip_distance" === 4.0f).count() === 2)
    assert(out.filter($"trip_distance".isNull).count() === 0)
  }

  test("C2: store_and_fwd_flag Y/N tie imputes 'N' (pandas mode tie → smallest)") {
    val df = frame(
      row("store_and_fwd_flag" -> "Y", "VendorID" -> 1.toByte),
      row("store_and_fwd_flag" -> "N", "VendorID" -> 2.toByte),
      row("store_and_fwd_flag" -> null, "VendorID" -> 3.toByte))
    val out = TaxiPipeline.clean(df)
    assert(out.filter($"VendorID" === 3 && $"store_and_fwd_flag" === "N").count() === 1)
  }

  test("C3: null location IDs become 0; VendorID nulls SURVIVE (not in any impute list)") {
    val df = frame(
      row("PULocationID" -> null, "VendorID" -> null),
      row())
    val out = TaxiPipeline.clean(df)
    assert(out.filter($"PULocationID" === 0).count() === 1)
    assert(out.filter($"VendorID".isNull).count() === 1)
  }

  test("DD2: exact duplicate rows collapse to one") {
    val df = frame(row(), row(), row("VendorID" -> 2.toByte))
    assert(TaxiPipeline.clean(df).count() === 2)
  }

  test("C4: trip_distance outliers get p99 computed INCLUDING the outliers") {
    val rows = (1 to 99).map(i => row("trip_distance" -> i.toFloat * 0.5f,
      "tpep_pickup_datetime" -> ts(f"2024-03-04 10:00:${i % 60}%02d"))) :+
      row("trip_distance" -> 200.0f) // outlier, included in the p99 basis
    val out = TaxiPipeline.clean(frame(rows: _*))
    assert(out.filter($"trip_distance" > 100.0f).count() === 0)
    val capped = out.agg(max($"trip_distance")).first().getFloat(0)
    assert(capped < 200.0f && capped > 49.0f) // p99 of 0.5..49.5 ∪ {200}
  }

  test("C5: negative fare gets p99 of the NON-NEGATIVE subset; fare==0 dies in P5") {
    val rows = (1 to 50).map(i => row("fare_amount" -> i.toFloat,
      "tpep_pickup_datetime" -> ts(f"2024-03-04 11:00:${i % 60}%02d"))) ++ Seq(
      row("fare_amount" -> -10.0f), // capped to p99 of {1..50} → survives P5
      row("fare_amount" -> 0.0f))   // NOT capped (0 is not < 0) → dies in P5
    val out = TaxiPipeline.clean(frame(rows: _*))
    assert(out.count() === 51)
    assert(out.filter($"fare_amount" < 0).count() === 0)
    assert(out.filter($"fare_amount" === 0.0f).count() === 0)
  }

  test("C6: passenger_count clamps 0→1 and 9→6") {
    val df = frame(
      row("passenger_count" -> 0.toByte, "VendorID" -> 1.toByte),
      row("passenger_count" -> 9.toByte, "VendorID" -> 2.toByte))
    val out = TaxiPipeline.clean(df)
    assert(out.filter($"VendorID" === 1).first().getAs[Byte]("passenger_count") === 1)
    assert(out.filter($"VendorID" === 2).first().getAs[Byte]("passenger_count") === 6)
  }

  test("C7: total_amount rewritten only when |total − components| > 0.1") {
    val df = frame(
      row("total_amount" -> 30.0f, "VendorID" -> 1.toByte),  // comp = 25.8 → rewrite
      row("total_amount" -> 25.85f, "VendorID" -> 2.toByte)) // within 0.1 → keep
    val out = TaxiPipeline.clean(df)
    assert(math.abs(out.filter($"VendorID" === 1).first().getAs[Float]("total_amount") - 25.8f) < 1e-5)
    assert(out.filter($"VendorID" === 2).first().getAs[Float]("total_amount") === 25.85f)
  }

  test("C8: inverted dropoff becomes pickup + 5 minutes") {
    val df = frame(row("tpep_dropoff_datetime" -> ts("2024-03-04 09:00:00")))
    val out = TaxiPipeline.clean(df)
    assert(out.first().getAs[java.sql.Timestamp]("tpep_dropoff_datetime") ===
      ts("2024-03-04 10:05:00"))
  }

  test("P5: null pickup/dropoff rows are removed (after imputation, which skips datetimes)") {
    val df = frame(row("tpep_pickup_datetime" -> null), row())
    assert(TaxiPipeline.clean(df).count() === 1)
  }

  test("O5/§1.2: schema-drift union aligns columns; extra columns survive the cast") {
    val a = frame(row()).drop("airport_fee").withColumn("surcharge_x", lit(1.5))
    val b = frame(row("VendorID" -> 2.toByte))
    val combined = TaxiPipeline.applySchema(TaxiPipeline.unionAlign(Seq(a, b)))
    assert(combined.columns.contains("surcharge_x"))
    assert(combined.filter($"VendorID" === 1 && $"airport_fee".isNull).count() === 1)
    assert(combined.filter($"VendorID" === 2 && $"surcharge_x".isNull).count() === 1)
    assert(combined.schema("airport_fee").dataType === FloatType)
  }

  test("D1-D12: derived columns hit the documented trap semantics") {
    val out = TaxiPipeline.transform(TaxiPipeline.clean(frame(
      row(), // Monday 10:00, 30 min, 5 mi, tip 4/fare 20
      row("tpep_pickup_datetime" -> ts("2024-03-02 06:00:00"), // Saturday, hour 6
        "tpep_dropoff_datetime" -> ts("2024-03-02 06:30:00"),
        "VendorID" -> 2.toByte,
        "RatecodeID" -> 2.toByte, "payment_type" -> 2.toByte,
        "total_amount" -> 9.0f, "fare_amount" -> 5.0f, "tip_amount" -> 1.0f,
        "extra" -> 3.0f, "mta_tax" -> 0.0f, "tolls_amount" -> 0.0f,
        "improvement_surcharge" -> 0.0f, "congestion_surcharge" -> 0.0f,
        "airport_fee" -> 0.0f))))
    val monday = out.filter($"VendorID" === 1).first()
    assert(monday.getAs[Double]("trip_duration_minutes") === 30.0)
    assert(monday.getAs[Double]("average_speed_mph") === 10.0)
    assert(monday.getAs[String]("pickup_day_of_week") === "Monday")
    assert(monday.getAs[String]("time_of_day") === "Morning")
    assert(!monday.getAs[Boolean]("is_weekend"))
    assert(monday.getAs[Boolean]("is_credit_card_payment"))
    assert(!monday.getAs[Boolean]("is_airport_trip"))
    assert(monday.getAs[String]("revenue_segment") === "High") // 25.8 ∈ (20,50]
    assert(monday.getAs[Double]("tip_percentage") === 20.0)
    assert(monday.getAs[Boolean]("is_valid_trip"))
    val saturday = out.filter($"VendorID" === 2).first()
    assert(saturday.getAs[String]("time_of_day") === "Night") // hour 6 right-closed
    assert(saturday.getAs[Boolean]("is_weekend"))
    assert(saturday.getAs[Boolean]("is_airport_trip")) // RatecodeID 2 = JFK
    assert(saturday.getAs[String]("revenue_segment") === "Low") // 9 ∈ (0,10]
  }

  test("metrics: five tables with the reference's column names; only valid trips counted") {
    val (transformed, m) = TaxiPipeline.process(Seq(frame(
      row(),
      row("VendorID" -> 2.toByte,
        "tpep_dropoff_datetime" -> ts("2024-03-04 14:00:00"))))) // 240 min → invalid
    assert(transformed.count() === 2)
    assert(m.keySet === Set("vendor_performance", "hourly_demand",
      "pickup_location_analysis", "payment_analysis", "monthly_summary"))
    assert(m("vendor_performance").columns.toSeq === Seq("VendorID", "trip_count",
      "avg_duration", "median_duration", "total_revenue", "avg_revenue",
      "median_revenue", "total_tips", "avg_tips", "avg_distance", "median_distance"))
    // the 240-minute trip is invalid → only vendor 1 appears
    assert(m("vendor_performance").count() === 1)
    assert(m("hourly_demand").first().getAs[Long]("trip_count") === 1L)
    assert(m("monthly_summary").first().getAs[Int]("pickup_year") === 2024)
  }

  test("Dataset[TaxiTrip] typed view: encoder binds, typed ops compose with the pipeline") {
    val ds = TaxiSchema.toTyped(frame(row(), row("VendorID" -> 2.toByte)))
    // typed filter + map run through the case class
    val fares = ds.filter((t: TaxiSchema.TaxiTrip) => t.VendorID.exists(_ == 1))
      .map((t: TaxiSchema.TaxiTrip) => t.fare_amount.getOrElse(0.0f))(
        org.apache.spark.sql.Encoders.scalaFloat)
      .collect()
    assert(fares.toSeq === Seq(20.0f))
    // and the untyped pipeline accepts the typed view's frame back
    assert(TaxiPipeline.clean(ds.toDF()).count() === 2)
  }

  test("cleaning is idempotent on already-clean data (reference's rerun-safety claim)") {
    val df = frame(row(), row("VendorID" -> 2.toByte))
    val once = TaxiPipeline.clean(df)
    val twice = TaxiPipeline.clean(once)
    assert(once.collect().toSet === twice.collect().toSet)
  }
}
