package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.TaxiPipeline

/** The flagship end-to-end demonstration: the ENTIRE reference lifecycle
  * (schema → C1-C3 impute → DD2 → C4-C6 cap/clamp → C7-C8 consistency →
  * P5 → D1-D12 → A1 vendor metric) on a taxi-shaped frame derived
  * deterministically from `events`, verified against a DuckDB oracle that
  * replays the same lifecycle in SQL.
  *
  * Exact cross-engine parity is by construction: every money/distance value
  * sits on a dyadic grid (quarters; fares are powers of two), so float32
  * arithmetic in Spark and float64 arithmetic in DuckDB are both EXACT —
  * sums are order-independent, median/mid interpolations stay dyadic, and
  * `round(x, 2)` is the identity. Aggregates that leave the grid (raw
  * means) are exercised by the golden specs instead (TaxiPipelineSpec).
  */
object TaxiE2E {

  // Derivation rules, shared between the Spark frame and the SQL oracle:
  //   VendorID        null @ %31, else 1 + id%2
  //   pickup          ts
  //   dropoff         pickup − 30 min @ %41 (inverted, C8), else + (id%200) min
  //   passenger_count null @ %23, else id%9 (0..8 — exercises C6 clamp)
  //   trip_distance   null @ %19, else (⌊value·4⌋ % 396)/4 + 0.25 ∈ [0.25, 99]
  //   RatecodeID      null @ %17, else 1 + id%6
  //   store_and_fwd   null @ %13, else N/Y by id%2
  //   PULocationID    null @ %11 (C3 → 0), else id%250
  //   DOLocationID    null @ %11, else id%199
  //   payment_type    null @ %29, else 1 + id%3
  //   fare            null @ %43, else 2^(3 + id%3) ∈ {8,16,32}
  //   extra           null @ %37, else (id%5)/4
  //   mta_tax         (id%3)/4;  tip: (⌊value·8⌋ % 16)/4;  tolls: (id%2)·1.25
  //   improvement     0.25; congestion (id%2)/2.0; airport (id%4)/4
  //   total           comp + 5 @ %7 (C7 rewrite), else comp (null if any comp null)

  /** The dyadic-grid taxi frame derived from `events` (shared by q26 and
    * the whole-job st04). */
  def taxiFrame(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
      val ev = Tables.events(s, d)
      val id = col("event_id")
      def nullAt(m: Int, v: org.apache.spark.sql.Column) =
        when(id % m === 0, lit(null)).otherwise(v)
      val fare = nullAt(43, when(id % 3 === 0, 8.0).when(id % 3 === 1, 16.0).otherwise(32.0))
      val extra = nullAt(37, (id % 5).cast("double") / 4)
      val mta = (id % 3).cast("double") / 4
      val tip = (floor(col("value") * 8).cast("long") % 16).cast("double") / 4
      val tolls = (id % 2).cast("double") * 1.25
      val improvement = lit(0.25)
      val congestion = (id % 2).cast("double") / 2
      val airport = (id % 4).cast("double") / 4
      val comp = fare + extra + mta + tip + tolls + improvement + congestion + airport
      val taxi = ev.select(
        nullAt(31, (id % 2 + 1)).cast("tinyint").as("VendorID"),
        col("ts").as("tpep_pickup_datetime"),
        when(id % 41 === 0, expr("ts - INTERVAL 30 MINUTES"))
          .otherwise(expr("ts + make_interval(0, 0, 0, 0, 0, CAST(event_id % 200 AS INT), 0)"))
          .as("tpep_dropoff_datetime"),
        nullAt(23, id % 9).cast("tinyint").as("passenger_count"),
        nullAt(19, (floor(col("value") * 4).cast("long") % 396).cast("double") / 4 + 0.25)
          .cast("float").as("trip_distance"),
        nullAt(17, id % 6 + 1).cast("tinyint").as("RatecodeID"),
        nullAt(13, when(id % 2 === 0, "N").otherwise("Y")).as("store_and_fwd_flag"),
        nullAt(11, id % 250).cast("smallint").as("PULocationID"),
        nullAt(11, id % 199).cast("smallint").as("DOLocationID"),
        nullAt(29, id % 3 + 1).cast("tinyint").as("payment_type"),
        fare.cast("float").as("fare_amount"),
        extra.cast("float").as("extra"),
        mta.cast("float").as("mta_tax"),
        tip.cast("float").as("tip_amount"),
        tolls.cast("float").as("tolls_amount"),
        improvement.cast("float").as("improvement_surcharge"),
        (comp + when(id % 7 === 0, 5.0).otherwise(0.0)).cast("float").as("total_amount"),
        congestion.cast("float").as("congestion_surcharge"),
        airport.cast("float").as("airport_fee"))
      taxi
  }

  /** Shared 5-column projection of the vendor_performance metric. */
  private def vendorProjection(df: org.apache.spark.sql.DataFrame) =
    df.select(col("VendorID").cast("long").as("VendorID"),
        col("trip_count").cast("long").as("trip_count"),
        col("total_revenue").cast("double").as("total_revenue"),
        col("median_revenue").cast("double").as("median_revenue"),
        col("median_distance").cast("double").as("median_distance"))
      .orderBy("VendorID")

  val spec: QuerySpec = QuerySpec("q26_taxi_e2e",
    (s, d) => {
      val (_, metrics) = TaxiPipeline.process(Seq(taxiFrame(s, d)))
      vendorProjection(metrics("vendor_performance"))
    },
    oracleSql)

  /** The WHOLE reference program (graft.pipeline.TaxiJob): stage the same
    * frame as monthly `yellow_tripdata_*.parquet` files, run discovery →
    * validated load → pipeline → versioned sinks + latest copies →
    * tracker/watermark, then read the vendor metric back FROM ITS CSV —
    * verified against the identical oracle as q26 (the job adds file
    * staging, P4 validation, sinks, and a CSV round-trip on top, all of
    * which must be value-preserving).
    */
  val jobSpec: QuerySpec = QuerySpec("st04_taxi_job",
    (s, d) => {
      import org.apache.hadoop.fs.Path
      val tmp = java.nio.file.Files.createTempDirectory("graft_job_q").toString
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      val labeled = taxiFrame(s, d)
        .withColumn("ym", date_format(col("tpep_pickup_datetime"), "yyyy-MM"))
      labeled.repartition(col("ym")).write.partitionBy("ym")
        .mode("overwrite").parquet(s"$tmp/stage")
      fs.mkdirs(new Path(s"$tmp/raw"))
      fs.globStatus(new Path(s"$tmp/stage/ym=*")).foreach { st =>
        val m = st.getPath.getName.stripPrefix("ym=")
        val part = fs.globStatus(new Path(s"${st.getPath}/part-*.parquet"))(0).getPath
        fs.rename(part, new Path(s"$tmp/raw/yellow_tripdata_$m.parquet"))
      }
      val res = graft.pipeline.TaxiJob.run(s, s"$tmp/raw", s"$tmp/state", s"$tmp/out",
        maxFiles = 100, clock = () => 42L)
      require(res.status == "success", s"job status: ${res.status}")
      val csv = s.read.option("header", "true")
        .csv(s"$tmp/out/processed/metrics/latest/vendor_performance.csv")
      vendorProjection(csv)
    },
    oracleSql)

  /** D2/D7/D8/D9/D11 made oracle-visible: per-vendor flag counts plus
    * fixed-point sums of the two derived ratios. Averaging the raw doubles
    * would be summation-order-dependent; summing per-row centi-units
    * (`floor(x*100 + 0.5)`, exact in both engines because every input is
    * bit-identical) is order-independent, so the hash check is exact.
    * Speed replays `clippedSpeed` (D2); tip replays `safeRatio` (D11);
    * the three flags are D7/D8/D9 on the post-imputation columns. */
  val flagsSpec: QuerySpec = QuerySpec("q29_vendor_flags",
    (s, d) => {
      val (transformed, _) = TaxiPipeline.process(Seq(taxiFrame(s, d)))
      transformed.filter(col("is_valid_trip") && col("VendorID").isNotNull)
        .groupBy(col("VendorID").cast("long").as("VendorID"))
        .agg(
          count(lit(1)).as("n_trips"),
          sum(col("is_weekend").cast("long")).as("n_weekend"),
          sum(col("is_credit_card_payment").cast("long")).as("n_credit"),
          sum(col("is_airport_trip").cast("long")).as("n_airport"),
          sum(floor(col("average_speed_mph") * 100 + 0.5)).as("speed_centisum"),
          sum(floor(col("tip_percentage") * 100 + 0.5)).as("tippct_centisum"))
        .orderBy("VendorID")
    },
    Some(s"""$lifecycleCte
        |SELECT CAST(VendorID AS BIGINT) AS VendorID,
        |       count(*) AS n_trips,
        |       CAST(sum(CASE WHEN isodow(pu) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
        |       CAST(sum(CASE WHEN pt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_credit,
        |       CAST(sum(CASE WHEN rc IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS n_airport,
        |       CAST(sum(CAST(floor(least(greatest(dist / (dur / 60.0), 0), 100) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS speed_centisum,
        |       CAST(sum(CAST(floor((tip / fare) * 100 * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tippct_centisum
        |FROM valid GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A4 payment_analysis verified from the REAL pipeline table: pandas
    * `'VendorID': 'count'` skips nulls, so trip_count excludes the
    * null-vendor rows that still contribute to the sums. (The rounded
    * avg_tip_percentage column stays spec-pinned — `round(mean, 2)` lands
    * on representation boundaries across engines; D11 is oracled through
    * q29's fixed-point sum instead.) */
  val paymentSpec: QuerySpec = QuerySpec("q30_payment_analysis",
    (s, d) => {
      val (_, metrics) = TaxiPipeline.process(Seq(taxiFrame(s, d)))
      metrics("payment_analysis")
        .select(col("payment_type").cast("long").as("payment_type"),
          col("trip_count").cast("long").as("trip_count"),
          col("total_revenue").cast("double").as("total_revenue"),
          col("total_tips").cast("double").as("total_tips"))
        .orderBy("payment_type")
    },
    Some(s"""$lifecycleCte
        |SELECT CAST(pt AS BIGINT) AS payment_type,
        |       count(VendorID) AS trip_count,
        |       round(sum(total2), 2) AS total_revenue,
        |       round(sum(tip), 2) AS total_tips
        |FROM valid0 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A3 pickup_location_analysis verified from the real pipeline table. */
  val pickupSpec: QuerySpec = QuerySpec("q31_pickup_locations",
    (s, d) => {
      val (_, metrics) = TaxiPipeline.process(Seq(taxiFrame(s, d)))
      metrics("pickup_location_analysis")
        .select(col("PULocationID").cast("long").as("PULocationID"),
          col("trip_count").cast("long").as("trip_count"),
          col("total_revenue").cast("double").as("total_revenue"))
        .orderBy("PULocationID")
    },
    Some(s"""$lifecycleCte
        |SELECT CAST(pul AS BIGINT) AS PULocationID,
        |       count(VendorID) AS trip_count,
        |       round(sum(total2), 2) AS total_revenue
        |FROM valid0 GROUP BY 1 ORDER BY 1""".stripMargin))

  private lazy val oracleSql = Some(s"""$lifecycleCte
      |SELECT CAST(VendorID AS BIGINT) AS VendorID,
      |       count(dur) AS trip_count,
      |       round(sum(total2), 2) AS total_revenue,
      |       round(quantile_cont(total2, 0.5), 2) AS median_revenue,
      |       round(quantile_cont(dist, 0.5), 2) AS median_distance
      |FROM valid GROUP BY 1 ORDER BY 1""".stripMargin)

  /** The reference lifecycle replayed in SQL up to the valid-trips set:
    * `valid0` = all valid trips (A3/A4/A5 read this — pandas keeps
    * null-VendorID rows in those tables), `valid` = the vendor-keyed subset
    * (groupby drops null keys). Shared by q26/st04/q29/q30/q31. */
  private lazy val lifecycleCte = """WITH tx AS (
      |  SELECT
      |    CASE WHEN event_id % 31 = 0 THEN NULL ELSE event_id % 2 + 1 END AS VendorID,
      |    ts AS pu,
      |    CASE WHEN event_id % 41 = 0 THEN ts - to_minutes(30)
      |         ELSE ts + to_minutes(event_id % 200) END AS dof,
      |    CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_id % 9 END AS pc,
      |    CASE WHEN event_id % 19 = 0 THEN NULL
      |         ELSE (CAST(floor(value * 4) AS BIGINT) % 396) / 4.0 + 0.25 END AS dist,
      |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_id % 6 + 1 END AS rc,
      |    CASE WHEN event_id % 13 = 0 THEN NULL
      |         WHEN event_id % 2 = 0 THEN 'N' ELSE 'Y' END AS saf,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_id % 250 END AS pul,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_id % 199 END AS dol,
      |    CASE WHEN event_id % 29 = 0 THEN NULL ELSE event_id % 3 + 1 END AS pt,
      |    CASE WHEN event_id % 43 = 0 THEN NULL
      |         WHEN event_id % 3 = 0 THEN 8.0 WHEN event_id % 3 = 1 THEN 16.0
      |         ELSE 32.0 END AS fare,
      |    CASE WHEN event_id % 37 = 0 THEN NULL ELSE (event_id % 5) / 4.0 END AS extra,
      |    (event_id % 3) / 4.0 AS mta,
      |    (CAST(floor(value * 8) AS BIGINT) % 16) / 4.0 AS tip,
      |    (event_id % 2) * 1.25 AS tolls,
      |    0.25 AS impr,
      |    (event_id % 2) / 2.0 AS cong,
      |    (event_id % 4) / 4.0 AS airp,
      |    CASE WHEN event_id % 7 = 0 THEN 5.0 ELSE 0.0 END AS twist
      |  FROM events),
      |tx2 AS (SELECT *, fare + extra + mta + tip + tolls + impr + cong + airp + twist AS total FROM tx),
      |-- C1: per-column medians computed over the ORIGINAL (pre-fill) frame
      |med AS (SELECT quantile_cont(pc, 0.5) AS m_pc, quantile_cont(dist, 0.5) AS m_dist,
      |               quantile_cont(fare, 0.5) AS m_fare, quantile_cont(extra, 0.5) AS m_extra,
      |               quantile_cont(tip, 0.5) AS m_tip, quantile_cont(total, 0.5) AS m_total
      |        FROM tx2),
      |-- C2 modes with the pandas tie-break (count desc, value asc)
      |mo_rc AS (SELECT rc AS v FROM tx2 WHERE rc IS NOT NULL GROUP BY rc ORDER BY count(*) DESC, rc ASC LIMIT 1),
      |mo_saf AS (SELECT saf AS v FROM tx2 WHERE saf IS NOT NULL GROUP BY saf ORDER BY count(*) DESC, saf ASC LIMIT 1),
      |mo_pt AS (SELECT pt AS v FROM tx2 WHERE pt IS NOT NULL GROUP BY pt ORDER BY count(*) DESC, pt ASC LIMIT 1),
      |imp AS (SELECT
      |    VendorID, pu, dof,
      |    coalesce(pc, (SELECT m_pc FROM med)) AS pc,
      |    coalesce(dist, (SELECT m_dist FROM med)) AS dist,
      |    coalesce(rc, (SELECT v FROM mo_rc)) AS rc,
      |    coalesce(saf, (SELECT v FROM mo_saf)) AS saf,
      |    coalesce(pul, 0) AS pul, coalesce(dol, 0) AS dol,
      |    coalesce(pt, (SELECT v FROM mo_pt)) AS pt,
      |    coalesce(fare, (SELECT m_fare FROM med)) AS fare,
      |    coalesce(extra, (SELECT m_extra FROM med)) AS extra,
      |    mta, coalesce(tip, (SELECT m_tip FROM med)) AS tip, tolls, impr, cong, airp,
      |    coalesce(total, (SELECT m_total FROM med)) AS total
      |  FROM tx2),
      |ded AS (SELECT DISTINCT * FROM imp),
      |-- C4/C5 never fire on this fixture (dist ∈ [0.25,99], fare ∈ {8,16,32})
      |c6 AS (SELECT *, greatest(least(pc, 6), 1) AS pc2 FROM ded),
      |c7 AS (SELECT *, CASE WHEN abs(total - (fare+extra+mta+tip+tolls+impr+cong+airp)) > 0.1
      |                      THEN fare+extra+mta+tip+tolls+impr+cong+airp ELSE total END AS total2 FROM c6),
      |c8 AS (SELECT *, CASE WHEN dof < pu THEN pu + to_minutes(5) ELSE dof END AS dof2 FROM c7),
      |p5 AS (SELECT * FROM c8 WHERE fare > 0 AND dist > 0 AND pu IS NOT NULL AND dof2 IS NOT NULL),
      |-- µs-exact duration, matching Spark's unix_micros(end)-unix_micros(start) / 6e7
      |tr AS (SELECT *, (epoch_us(dof2) - epoch_us(pu)) / 60000000.0 AS dur FROM p5),
      |valid0 AS (SELECT * FROM tr
      |           WHERE dur > 0 AND dur < 180 AND dist > 0 AND dist < 100
      |             AND fare >= 0 AND total2 >= 0),
      |valid AS (SELECT * FROM valid0 WHERE VendorID IS NOT NULL)""".stripMargin
}
