package graft.streaming

import graft.ext.Sketches
import graft.io.Snapshots
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming count-min maintenance: each micro-batch appends its PARTIAL
  * sketch (≤ depth·width cells, whatever the batch size) through a
  * snapshot manifest; serving merges partials by cell-wise sum. CMS merge
  * is exact — the served sketch equals the batch build over the union of
  * every ingested batch, so frequency estimates are available
  * continuously without ever re-scanning history. State is O(batches ·
  * depth · width) cells until [[Snapshots.compact]] folds the partials
  * (itself a manifest transaction, so readers never see a half-merge).
  *
  * Exactly-once across crash replays by the shared manifest-ledger rule
  * ([[Snapshots.commitBatchOnce]]).
  */
object SketchIngest {

  /** Start maintaining the sketch table at `table` from streaming
    * `source` (one key per row in `keyCol`). Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, keyCol: String, table: String,
            checkpoint: String, depth: Int = 4, width: Int = 512): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Snapshots.commitBatchOnce(spark, table, batchId,
          Sketches.countMin(batch, col(keyCol), depth, width))
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The merged sketch as of `version` (default current): cell-wise sum of
    * the committed partials — `(row, bucket, cnt)`. */
  def sketch(spark: SparkSession, table: String,
             version: Option[Long] = None): DataFrame =
    Snapshots.readAt(spark, table, version)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-query the maintained sketch (must match the build's
    * depth/width). */
  def estimate(spark: SparkSession, table: String, probes: DataFrame, probe: Column,
               depth: Int = 4, width: Int = 512,
               version: Option[Long] = None): DataFrame =
    Sketches.countMinEstimate(sketch(spark, table, version), probes, probe, depth, width)
}
