package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.incremental.Incremental
import graft.io.{Sinks, Sources}

/** The reference's whole program (SURVEY §3.1, `incremental_taxi_data_
  * processing` / `process_incremental_files`) as one callable: discover
  * files past the tracker, load them with filename validation, run the
  * clean→transform→metrics pipeline as ONE lazy plan, write versioned
  * parquet + metric CSVs + `latest/` copies, then advance tracker and
  * watermark. Returns a status summary like the reference's status dict
  * (`PF:993-1018`).
  *
  * Steps 3-7 and 16 of the reference are driver-side metadata ops; steps
  * 8-13 are a single Catalyst plan per output — no intermediate
  * materialization (the reference fully materializes between every step).
  */
object TaxiJob {

  final case class JobResult(
      status: String,
      filesProcessed: Seq[String],
      rowsOut: Long,
      metricTables: Seq[String],
      processingId: String,
      rowCounts: Map[String, Long] = Map.empty)

  /** One incremental run over a raw-file directory tree. `clock` is
    * injectable (SURVEY §7.5.8: the reference's processing_id timestamps
    * are nondeterminism to quarantine). */
  def run(spark: SparkSession, rawDir: String, stateDir: String, outDir: String,
          filenameStem: String = "yellow_tripdata",
          maxFiles: Int = 10,
          exactPercentiles: Boolean = true,
          clock: () => Long = () => java.time.Instant.now.toEpochMilli): JobResult = {

    // 3-5: watermark + tracker + discovery (S2/P1/P2/O1), oldest-first.
    // The listing stays DISTRIBUTED (Incremental.listingDf) and the
    // tracker anti-join + mtime sort + top-k batch limit (6-7, J1/O2) run
    // inside the plan — only the ≤ maxFiles batch ever reaches the driver,
    // so a 10⁷-object raw bucket costs executor time, not driver heap.
    val listing = Incremental.listingDf(spark, rawDir,
        pattern = s"$filenameStem.*\\.parquet$$")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val anyDiscovered = !listing.isEmpty
    if (!anyDiscovered)
      return JobResult("no_new_files", Nil, 0, Nil, "")

    val fresh = Incremental.takeBatch(spark, listing,
      Incremental.readTracker(spark, stateDir), maxFiles)
    if (fresh.isEmpty) {
      Incremental.writeWatermark(spark, stateDir, clock())
      return JobResult("all_files_processed", Nil, 0, Nil, "")
    }

    // 8-10: schema-enforced scan of ALL new files in one pass (the
    // reference downloads and reads them one at a time), P4 validation
    // against each row's own source file, schema-drift tolerated by the
    // reader (missing columns → null via the explicit schema)
    val raw = spark.read
      .schema(graft.schema.TaxiSchema.schema)
      .parquet(fresh.map(_.path): _*)
      .withColumn("__file", input_file_name())

    // 14 (hoisted): processing id + date range from FILENAMES, not data
    // (SURVEY §4 "FAST" trick) — deterministic under the injected clock
    val months = fresh.map(_.path).flatMap { p =>
      s"${filenameStem}_(\\d{4}-\\d{2})\\.parquet$$".r.findFirstMatchIn(p).map(_.group(1))
    }.sorted
    val dateRange = if (months.nonEmpty) s"${months.head}_${months.last}" else "unknown"
    val processingId = s"${clock()}_$dateRange"

    // C9: stage counts ride along as observe() metrics with the actions
    // this job already runs (the first cleaning scalar job scans the
    // validated frame; the parquet write scans the transformed frame) —
    // zero extra passes, unlike the reference's len() after every step.
    val (validated, inObs) = graft.ops.Accounting.observe(
      Sources.validateAgainstFilename(raw, col("tpep_pickup_datetime"), col("__file"), filenameStem)
        .drop("__file"),
      s"rows_validated_$processingId", "rows" -> count(lit(1)))

    // 11-13: clean → transform → metrics, one lazy plan per sink
    val (transformed, outObs, metrics) = {
      val cleaned = TaxiPipeline.clean(TaxiPipeline.applySchema(validated), exactPercentiles)
      val (t, obs) = graft.ops.Accounting.observe(TaxiPipeline.transform(cleaned),
        s"rows_out_$processingId", "rows" -> count(lit(1)))
      (t, obs, TaxiPipeline.metrics(t))
    }

    // 15: versioned parquet + metric CSVs + latest copies (S4/S5/S8).
    // Metric keys mirror the reference's object layout exactly
    // (`DP:505-538`): processed/metrics/date={range}/{processing_id}_{name}.csv
    // versioned, processed/metrics/latest/{name}.csv stable.
    val dataDir = s"$outDir/processed/taxi/$processingId"
    Sinks.parquet(transformed, dataDir)
    Sinks.copyToLatest(spark, dataDir, s"$outDir/processed/taxi/latest")
    val metricNames = metrics.keys.toSeq.sorted
    metricNames.foreach { name =>
      val dir = s"$outDir/processed/metrics/date=$dateRange/${processingId}_$name.csv"
      Sinks.metricsCsv(metrics(name), dir)
      Sinks.copyToLatest(spark, dir, s"$outDir/processed/metrics/latest/$name.csv")
    }
    // observe() metrics are complete once the write action finished —
    // no post-write re-read of the output (the round-1 shape scanned the
    // whole written dataset again just to count it)
    val rowsIn = inObs.get("rows").asInstanceOf[Long]
    val rowsOut = outObs.get("rows").asInstanceOf[Long]

    // 16: exactly-once bookkeeping (ST1/ST2)
    Incremental.appendTracker(spark, stateDir, fresh.map(_.path))
    Incremental.writeWatermark(spark, stateDir,
      math.max(Incremental.readWatermark(spark, stateDir), fresh.map(_.mtime).max))

    JobResult("success", fresh.map(_.path), rowsOut, metricNames, processingId,
      rowCounts = Map("rows_validated" -> rowsIn, "rows_out" -> rowsOut))
    } finally listing.unpersist()
  }
}
