package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Dedup, Transforms}
import graft.schema.TaxiSchema
import graft.util.Det._

/** The reference's full processing lifecycle (`data_processing.py`,
  * SURVEY §3.1 steps 9-13) re-expressed as one lazy Catalyst plan per
  * stage: union-align → schema cast → clean (C1-C9, DD2, P5 in the
  * reference's order) → transform (D1-D12) → metrics (A1-A5).
  *
  * Everything before the metric group-bys is narrow (no shuffle except
  * the dedup exchange); the cleaning scalars are one aggregation job each
  * (O(#columns) values to the driver, never rows — SURVEY §2.5).
  */
object TaxiPipeline {

  /** O5 — schema-drift union: set-union of columns, missing → null
    * (`DP:648-680`, 33 reference lines ≡ one flag). */
  def unionAlign(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_.unionByName(_, allowMissingColumns = true))

  /** §1.2 — apply the declared 19-column schema by best-effort cast;
    * unparseable values become null (pandas `errors='coerce'`); columns
    * outside the known 19 survive with their inferred types (`DP:682-725`).
    * `try_cast`, not `cast`: Spark 4 runs ANSI mode by default, where a
    * plain cast THROWS on a malformed value (e.g. a non-numeric string in a
    * drifted column) instead of coercing to null. */
  def applySchema(df: DataFrame): DataFrame = {
    val known = TaxiSchema.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.map { c =>
      known.get(c) match {
        case Some(t) if df.schema(c).dataType != t => col(c).try_cast(t).as(c)
        case _                                     => col(c)
      }
    }: _*)
  }

  /** C1-C9 + DD2 + P5 in the reference's order (SURVEY §2.5):
    * impute → dedup → cap → consistency → remove. Each guard mimics the
    * reference's "column exists" checks (`DP:91,100,127,160,177`).
    *
    * `persistDeduped`: the deduped frame feeds the C4/C5 scalar job AND the
    * final consumer, so caching it saves one dedup-shuffle recompute — but
    * profiling (q24, commit 292f15b) showed the in-memory-columnar cache
    * WRITE costs more than the recompute at sf0.1, and an unconditional
    * persist of the full deduped frame is a cluster-wide cache write of the
    * entire dataset at 100 TB. Default: no persist. A caller that does pass
    * a level owns the release (`unpersist()` after its terminal action). */
  def clean(df: DataFrame, exactPercentiles: Boolean = true,
            persistDeduped: Option[org.apache.spark.storage.StorageLevel] = None): DataFrame = {
    val cols = df.columns.toSet

    // C1-C3 — imputation (medians over the pre-dedup batch, §7.5.1)
    val imputed = {
      val m = Cleaning.imputeMedian(df, TaxiSchema.medianImputed, exactPercentiles)
      val mo = Cleaning.imputeMode(m, TaxiSchema.modeImputed)
      Cleaning.imputeConstant(mo, TaxiSchema.zeroFilled, 0)
    }

    // DD2 — full-row dedup (null-safe, like pandas drop_duplicates)
    val deduped = persistDeduped
      .map(Dedup.exact(imputed).persist)
      .getOrElse(Dedup.exact(imputed))

    // C4 + C5 — both p99 scalars in ONE aggregation job:
    //   C4: trip_distance d<=0 ∨ d>100 → p99 of the WHOLE column
    //   C5: fare_amount   f<0 ∨ f>500 → p99 of the NON-NEGATIVE subset
    val capAggs = Seq(
      if (cols("trip_distance"))
        Some("trip_distance" -> Cleaning.percentileOf(col("trip_distance"), 0.99, exactPercentiles))
      else None,
      if (cols("fare_amount"))
        Some("fare_amount" -> Cleaning.percentileOf(
          when(col("fare_amount") >= 0, col("fare_amount")), 0.99, exactPercentiles))
      else None).flatten
    val capFare =
      if (capAggs.isEmpty) deduped
      else {
        val row = deduped.agg(capAggs.head._2, capAggs.tail.map(_._2): _*).first()
        val caps = capAggs.zipWithIndex.collect {
          case ((c, _), i) if !row.isNullAt(i) =>
            c -> row.get(i).asInstanceOf[Number].doubleValue()
        }.toMap
        val afterDist = caps.get("trip_distance") match {
          case Some(p) => deduped.withColumn("trip_distance",
            when(col("trip_distance") <= 0 || col("trip_distance") > 100, lit(p))
              .otherwise(col("trip_distance"))
              .cast(deduped.schema("trip_distance").dataType))
          case None => deduped
        }
        caps.get("fare_amount") match {
          case Some(p) => afterDist.withColumn("fare_amount",
            when(col("fare_amount") < 0 || col("fare_amount") > 500, lit(p))
              .otherwise(col("fare_amount"))
              .cast(deduped.schema("fare_amount").dataType))
          case None => afterDist
        }
      }

    // C6 — passenger_count clamped to [1, 6]
    val clamped =
      if (cols("passenger_count"))
        capFare.withColumn("passenger_count",
          Cleaning.clamp(col("passenger_count"), lit(1), lit(6)).cast("tinyint"))
      else capFare

    // C7 — component-sum consistency (only when all 9 columns exist)
    val consistent =
      if (TaxiSchema.componentColumns.forall(cols) && cols("total_amount")) {
        val comp = TaxiSchema.componentColumns.map(col).reduce(_ + _)
        clamped.withColumn("total_amount",
          Cleaning.consistencyRewrite(col("total_amount"), comp, 0.1))
      } else clamped

    // C8 — datetime-order repair: dropoff < pickup → pickup + 5 minutes
    val ordered =
      if (cols("tpep_pickup_datetime") && cols("tpep_dropoff_datetime"))
        consistent.withColumn("tpep_dropoff_datetime",
          Cleaning.repairOrder(col("tpep_pickup_datetime"),
            col("tpep_dropoff_datetime"), "5 MINUTES"))
      else consistent

    // P5 — invalid-record removal (AFTER capping: fare==0 still dies here,
    // fare<0 was already rewritten to a positive p99 by C5)
    val p5 = Seq(
      if (cols("fare_amount")) Some(col("fare_amount") > 0) else None,
      if (cols("trip_distance")) Some(col("trip_distance") > 0) else None,
      if (cols("tpep_pickup_datetime")) Some(col("tpep_pickup_datetime").isNotNull) else None,
      if (cols("tpep_dropoff_datetime")) Some(col("tpep_dropoff_datetime").isNotNull) else None
    ).flatten
    if (p5.isEmpty) ordered else ordered.filter(p5.reduce(_ && _))
  }

  /** D1-D12 — derived columns (`DP:755-818`); all narrow projections. */
  def transform(df: DataFrame): DataFrame = {
    val dur = Transforms.durationMinutes(col("tpep_pickup_datetime"), col("tpep_dropoff_datetime"))
    df.withColumn("trip_duration_minutes", dur)
      .withColumn("average_speed_mph",
        Transforms.clippedSpeed(col("trip_distance"), col("trip_duration_minutes"), 100.0))
      .withColumn("pickup_hour", hour(col("tpep_pickup_datetime")))
      .withColumn("pickup_day_of_week", Transforms.dayName(col("tpep_pickup_datetime")))
      .withColumn("pickup_month", month(col("tpep_pickup_datetime")))
      .withColumn("pickup_year", year(col("tpep_pickup_datetime")))
      .withColumn("time_of_day", Transforms.timeOfDay(col("pickup_hour")))
      .withColumn("is_airport_trip", col("RatecodeID").isin(TaxiSchema.airportRateCodes: _*))
      .withColumn("is_credit_card_payment", col("payment_type") === TaxiSchema.creditCardPayment)
      .withColumn("is_weekend", Transforms.isWeekend(col("tpep_pickup_datetime")))
      .withColumn("revenue_segment", Transforms.segment(col("total_amount"),
        Seq(10.0, 20.0, 50.0), Seq("Low", "Medium", "High", "Very High")))
      .withColumn("tip_percentage", Transforms.safeRatio(col("tip_amount"), col("fare_amount")))
      .withColumn("is_valid_trip",
        col("trip_duration_minutes") > 0 && col("trip_duration_minutes") < 180 &&
          col("trip_distance") > 0 && col("trip_distance") < 100 &&
          col("fare_amount") >= 0 && col("total_amount") >= 0)
  }

  /** A1-A5 — the five metric tables (`DP:820-912`), each one shuffle.
    * P6: metrics read only valid trips. All aggregates rounded to 2
    * decimals like the reference's `.round(2)`. */
  def metrics(transformed: DataFrame): Map[String, DataFrame] = {
    val v = transformed.filter(col("is_valid_trip"))
    val dur = col("trip_duration_minutes")
    Map(
      // pandas groupby drops null keys (dropna=True) and VendorID is in NO
      // imputation list (FIXTURES §1), so null-vendor rows are excluded —
      // the one §2.7 key where Spark's keep-null-groups default diverges
      "vendor_performance" -> v.filter(col("VendorID").isNotNull).groupBy("VendorID").agg(
        count(dur).as("trip_count"),
        round(avg(dur), 2).as("avg_duration"),
        round(percentile(dur, lit(0.5)), 2).as("median_duration"),
        round(sum(col("total_amount")), 2).as("total_revenue"),
        round(avg(col("total_amount")), 2).as("avg_revenue"),
        round(percentile(col("total_amount"), lit(0.5)), 2).as("median_revenue"),
        round(sum(col("tip_amount")), 2).as("total_tips"),
        round(avg(col("tip_amount")), 2).as("avg_tips"),
        round(avg(col("trip_distance")), 2).as("avg_distance"),
        round(percentile(col("trip_distance"), lit(0.5)), 2).as("median_distance")),
      "hourly_demand" -> v.groupBy("pickup_hour").agg(
        count(col("VendorID")).as("trip_count"),
        round(sum(col("total_amount")), 2).as("total_revenue"),
        round(avg(dur), 2).as("avg_duration")),
      // trip_count in the remaining tables aggregates 'VendorID': 'count'
      // (DP:858-900) — pandas count() skips NaN, so null-VendorID rows
      // (which survive into valid trips; VendorID is in no imputation list)
      // are excluded from the count, like hourly_demand above
      "pickup_location_analysis" -> v.groupBy("PULocationID").agg(
        count(col("VendorID")).as("trip_count"),
        round(sum(col("total_amount")), 2).as("total_revenue"),
        round(avg(dur), 2).as("avg_duration")),
      "payment_analysis" -> v.groupBy("payment_type").agg(
        count(col("VendorID")).as("trip_count"),
        round(sum(col("total_amount")), 2).as("total_revenue"),
        round(sum(col("tip_amount")), 2).as("total_tips"),
        round(avg(col("tip_percentage")), 2).as("avg_tip_percentage")),
      "monthly_summary" -> v.groupBy("pickup_year", "pickup_month").agg(
        count(col("VendorID")).as("trip_count"),
        round(sum(col("total_amount")), 2).as("total_revenue"),
        round(avg(dur), 2).as("avg_duration"),
        round(avg(col("trip_distance")), 2).as("avg_distance")))
  }

  /** The full §3.1 lifecycle over already-loaded monthly frames. */
  def process(frames: Seq[DataFrame], exactPercentiles: Boolean = true): (DataFrame, Map[String, DataFrame]) = {
    val combined = applySchema(unionAlign(frames))
    val transformed = transform(clean(combined, exactPercentiles))
    (transformed, metrics(transformed))
  }
}
