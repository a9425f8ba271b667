package graft.streaming

import graft.io.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upsert: every micro-batch of keyed updates lands in a
  * versioned snapshot table as ONE transactional copy-on-write MERGE
  * ([[Snapshots.mergeInto]]) — matched keys replaced, new keys inserted,
  * only the files actually holding matched keys rewritten (zone-map
  * pruned by the batch's own key bounds). The continuous counterpart of
  * the batch [[graft.ops.Upsert]]: a corpus that takes rolling corrections
  * / re-crawls keyed by document id stays ONE table with a version per
  * batch, every pre-batch version still time-travelable.
  *
  * Exactly-once across crash replays: a MERGE is not idempotent (its data
  * dirs are fresh UUIDs, and re-merging after a later batch would clobber
  * it), so the gate stamps each commit with a batch NOTE and a replayed
  * batch whose note is already in the manifest is skipped — the manifest
  * is the ledger, exactly like [[SnapshotIngest]] but keyed on the note
  * instead of the deterministic batch dir. A crash between data write and
  * commit leaves an unreferenced merge dir ([[Snapshots.vacuum]] food)
  * and the replay re-merges cleanly.
  *
  * Reference analog: none (north-star extension) — composes the
  * incremental-ingest discipline with the mutation surface.
  */
object MergeGate {

  def batchNote(batchId: Long): String = s"mergegate-batch-$batchId"

  /** Start merging `source` micro-batches into the versioned `table` by
    * `keys`. `pruneOn` names a zone-mapped key column for candidate-file
    * pruning. Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, table: String,
            keys: Seq[String], checkpoint: String,
            pruneOn: Option[String] = None): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val done = Snapshots.notes(spark, table).contains(batchNote(batchId))
        if (!done && !batch.isEmpty) {
          Snapshots.mergeInto(spark, table, batch, keys, pruneOn = pruneOn,
            note = Some(batchNote(batchId)))
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
