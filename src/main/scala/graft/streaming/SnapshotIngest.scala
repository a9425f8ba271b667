package graft.streaming

import graft.io.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest into a VERSIONED table: every micro-batch lands as one
  * snapshot-manifest transaction ([[graft.io.Snapshots]]) — so the table
  * gains a version per batch, any historical version stays readable (time
  * travel across the ingest timeline), and downstream consumers pin a
  * version instead of racing the stream.
  *
  * Exactly-once across crash replays WITHOUT relying on the checkpoint
  * alone: the batch's data directory is a deterministic function of the
  * batch id, and a replayed batch first checks the manifest for paths
  * under that directory — a batch that already committed is skipped
  * (the manifest itself is the idempotence ledger), a batch that crashed
  * between data write and commit overwrites its own directory and commits
  * the fresh listing (the orphaned first attempt's files are unreferenced
  * garbage that [[Snapshots.vacuum]] reclaims).
  *
  * Reference analog: none — this composes the reference's incremental
  * ingest with dataset versioning; sink discipline follows the other
  * gates (write-new-objects-only, nothing live renamed).
  */
object SnapshotIngest {

  /** Data directory for a batch — deterministic so replays collide with
    * their own previous attempt, never with other batches. */
  def batchDir(table: String, batchId: Long): String = s"$table/data/batch$batchId"

  /** Start ingesting `source` into the versioned `table`. One commit per
    * non-empty micro-batch; drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, table: String,
            checkpoint: String): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Snapshots.commitBatchOnce(spark, table, batchId, batch)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
