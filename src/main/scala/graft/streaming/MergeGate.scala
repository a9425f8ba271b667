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

  def batchNote(batchId: Long): String = batchNote("mergegate", batchId)

  /** Note ledger key, tagged by WRITER: two gates merging into one table
    * must not read each other's replay markers. */
  def batchNote(writer: String, batchId: Long): String = s"$writer-batch-$batchId"

  /** Start merging `source` micro-batches into the versioned `table` by
    * `keys`. `pruneOn` names a zone-mapped key column for candidate-file
    * pruning. Drain with AvailableNow.
    *
    * Concurrency (`maxRetries` > 0): the optimistic-commit LOSER retries —
    * [[Snapshots.mergeInto]] resolves the current version on entry and
    * throws [[Snapshots.ConcurrentCommitException]] when another writer
    * committed first, so a retry re-reads the NEW table state and
    * re-derives the whole merge against it (nothing from the failed
    * attempt is reused; its orphan data dir is vacuum food). Two gates on
    * disjoint key ranges therefore serialize to the same final state
    * regardless of interleaving — the multi-writer discipline every
    * manifest-log table format uses. The replay-note check rides INSIDE
    * the loop's derivation (notes are per-writer, so a competitor's
    * commit can never mark this batch done). */
  def start(spark: SparkSession, source: DataFrame, table: String,
            keys: Seq[String], checkpoint: String,
            pruneOn: Option[String] = None,
            writer: String = "mergegate",
            maxRetries: Int = 0): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val note = batchNote(writer, batchId)
        // the merge evaluates its updates 2–4× (prune bounds, key-set
        // semi-join, rewrite, dv fold — [[Snapshots.mergeInto]]), and each
        // evaluation re-reads the staged input files: materialize the
        // batch ONCE per trigger (after the free ledger check — a replayed
        // batch must not pay the materialization). Batch data never
        // changes across commit retries (only table state does), so the
        // checkpoint stays valid for the whole loop. Released before the
        // trigger returns.
        if (!Snapshots.notes(spark, table).contains(note)) {
          val b = batch.localCheckpoint(true)
          try {
            var attempts = 0
            var committed = b.isEmpty
            while (!committed) {
              if (Snapshots.notes(spark, table).contains(note))
                committed = true
              else
                try {
                  Snapshots.mergeInto(spark, table, b, keys, pruneOn = pruneOn,
                    note = Some(note))
                  committed = true
                } catch {
                  case _: Snapshots.ConcurrentCommitException if attempts < maxRetries =>
                    attempts += 1
                }
            }
          } finally b.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.foreach(_.unpersist(blocking = false))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
