package graft.pipeline

import graft.SparkSpec
import graft.schema.TaxiSchema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end integration of the whole reference program: staged monthly
  * files (with schema drift and a wrong-month poison row) → discovery →
  * validated load → pipeline → versioned sinks + latest copies → tracker/
  * watermark, then idempotent rerun and incremental pickup.
  */
class TaxiJobSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val defaults: Map[String, Any] = Map(
    "VendorID" -> 1.toByte, "tpep_pickup_datetime" -> ts("2024-03-04 10:00:00"),
    "tpep_dropoff_datetime" -> ts("2024-03-04 10:30:00"),
    "passenger_count" -> 2.toByte, "trip_distance" -> 5.0f, "RatecodeID" -> 1.toByte,
    "store_and_fwd_flag" -> "N", "PULocationID" -> 100.toShort,
    "DOLocationID" -> 200.toShort, "payment_type" -> 1.toByte,
    "fare_amount" -> 20.0f, "extra" -> 1.0f, "mta_tax" -> 0.5f,
    "tip_amount" -> 4.0f, "tolls_amount" -> 0.0f, "improvement_surcharge" -> 0.3f,
    "total_amount" -> 25.8f, "congestion_surcharge" -> 0.0f, "airport_fee" -> 0.0f)

  private def row(over: (String, Any)*): Row = {
    val m = defaults ++ over.toMap
    Row.fromSeq(TaxiSchema.schema.fields.map(f => m(f.name)))
  }

  private def writeMonth(dir: String, month: String, rows: Seq[Row],
                         dropCols: Seq[String] = Nil): Unit = {
    var df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), TaxiSchema.schema)
    dropCols.foreach(c => df = df.drop(c))
    val stage = s"$dir/.stage_$month"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(s"$stage/part-*.parquet"))(0).getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/yellow_tripdata_$month.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  test("full job: process, sink, latest copies, idempotent rerun, incremental pickup") {
    val root = Files.createTempDirectory("graft_job").toString
    val raw = s"$root/raw"
    new java.io.File(raw).mkdirs()

    // March file: 3 good rows + 1 wrong-month poison (P4 must drop it);
    // April file: schema drift — written WITHOUT airport_fee (null-filled
    // by the schema-enforced read)
    writeMonth(raw, "2024-03", Seq(
      row(), row("VendorID" -> 2.toByte),
      row("tpep_pickup_datetime" -> ts("2024-03-09 23:00:00"), // Saturday
        "tpep_dropoff_datetime" -> ts("2024-03-09 23:20:00")),
      row("tpep_pickup_datetime" -> ts("2024-04-01 10:00:00"), // poison
        "tpep_dropoff_datetime" -> ts("2024-04-01 10:30:00"))))
    writeMonth(raw, "2024-04", Seq(
      row("tpep_pickup_datetime" -> ts("2024-04-02 08:00:00"),
        "tpep_dropoff_datetime" -> ts("2024-04-02 08:45:00"))),
      dropCols = Seq("airport_fee"))

    var now = 1000L
    val r1 = TaxiJob.run(spark, raw, s"$root/state", s"$root/out",
      clock = () => { now += 1; now })
    assert(r1.status === "success")
    assert(r1.filesProcessed.length === 2)
    assert(r1.rowsOut === 4) // 5 staged − 1 poison
    assert(r1.metricTables === Seq("hourly_demand", "monthly_summary",
      "payment_analysis", "pickup_location_analysis", "vendor_performance"))
    assert(r1.processingId.endsWith("2024-03_2024-04"))

    // outputs: versioned parquet + latest copy agree; metric CSV readable
    val latest = spark.read.parquet(s"$root/out/processed/taxi/latest")
    assert(latest.count() === 4)
    assert(latest.columns.contains("is_valid_trip"))
    // drifted column: the schema-enforced read null-filled it, then C1
    // imputed the null with the column median (0.0 from the March rows)
    assert(latest.filter(month($"tpep_pickup_datetime") === 4 && $"airport_fee" === 0.0f).count() === 1)
    val monthly = spark.read.option("header", "true")
      .csv(s"$root/out/processed/metrics/latest/monthly_summary.csv")
    assert(monthly.count() === 2) // one row per (year, month)
    // versioned metric keys mirror the reference layout (DP:505-538)
    val versioned = new java.io.File(
      s"$root/out/processed/metrics/date=2024-03_2024-04").list()
    assert(versioned.exists(_.matches(raw"\d+_2024-03_2024-04_vendor_performance\.csv")),
      versioned.mkString(","))
    // C9: stage counts observed on the job's own actions, no extra pass
    assert(r1.rowCounts("rows_validated") === 4L)
    assert(r1.rowCounts("rows_out") === 4L)

    // rerun with nothing new: no-op, watermark advanced
    val r2 = TaxiJob.run(spark, raw, s"$root/state", s"$root/out",
      clock = () => { now += 1; now })
    assert(r2.status === "all_files_processed")

    // a late-arriving month is picked up alone
    writeMonth(raw, "2024-05", Seq(
      row("tpep_pickup_datetime" -> ts("2024-05-05 09:00:00"),
        "tpep_dropoff_datetime" -> ts("2024-05-05 09:30:00"))))
    val r3 = TaxiJob.run(spark, raw, s"$root/state", s"$root/out",
      clock = () => { now += 1; now })
    assert(r3.status === "success")
    assert(r3.filesProcessed.length === 1)
    assert(r3.rowsOut === 1)
  }

  test("empty raw dir → no_new_files") {
    val root = Files.createTempDirectory("graft_job_empty").toString
    new java.io.File(s"$root/raw").mkdirs()
    assert(TaxiJob.run(spark, s"$root/raw", s"$root/state", s"$root/out").status === "no_new_files")
  }
}
