package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming-native incremental processing: the file-source
  * checkpoint subsumes the reference's watermark + processed-files tracker
  * (SURVEY §2.10) — exactly-once file handling by construction.
  * `Trigger.AvailableNow` drains everything currently available and stops,
  * which is exactly the reference's scheduled-batch semantics (fire from
  * cron, process the backlog, exit).
  */
object IncrementalStream {

  /** Run one incremental drain: read new files from `srcDir`, apply
    * `transform`, append to `outDir`. Blocks until the drain completes.
    * `maxFilesPerTrigger` mirrors the reference's MAX_FILES_PER_RUN knob.
    */
  def drain(spark: SparkSession, srcDir: String, schema: StructType,
            checkpoint: String, outDir: String,
            maxFilesPerTrigger: Int = 10)
           (transform: DataFrame => DataFrame): Unit = {
    val in = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // the reference's listing is recursive (SURVEY S2 "incl. subfolders")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val q = transform(in).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time tumbling-window aggregation with a late-data watermark —
    * the streaming-native analog of the reference's calendar bucketing
    * (hourly demand), tolerating `lateness` of out-of-order rows.
    */
  def windowedCounts(events: DataFrame, tsCol: String, window: String,
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stateful per-key session tracking via flatMapGroupsWithState-style
    * dedup: drop events already seen (exactly-once rows) within the
    * watermark horizon. */
  def dedupedStream(events: DataFrame, idCols: Seq[String], tsCol: String,
                    lateness: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(idCols)
}
