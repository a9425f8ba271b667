package graft.streaming

import graft.io.{Snapshots, ViewMaintenance}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upserts with a CONTINUOUSLY MAINTAINED aggregate: every
  * micro-batch lands in the versioned table as one transactional MERGE
  * ([[MergeGate]] discipline) and the per-dims (count, sum) view catches
  * up with the change feed IN THE SAME batch ([[graft.io.ViewMaintenance]])
  * — the dashboard that is always current and never rescans the table.
  *
  * Exactly-once holds INDEPENDENTLY on both ledgers, which is what makes
  * the composition crash-safe at every boundary: the merge replays
  * against its writer-tagged batch note, the maintenance against its
  * per-version `ivm-v<N>` notes. A crash after the merge but before the
  * maintenance just leaves the view one version behind — the next batch
  * (or a manual [[ViewMaintenance.maintain]]) catches it up; nothing
  * double-applies.
  *
  * Scale posture: the merge rewrites O(files holding matched keys) (zone
  * -map pruned), the maintenance folds O(changes) through a broadcast
  * delta — per batch, nothing is O(table).
  *
  * Reference analog: none (north-star extension) — the streaming
  * composition of the CDC upsert gate with incremental view maintenance.
  */
object ViewGate {

  def start(spark: SparkSession, source: DataFrame, table: String,
            keys: Seq[String], dims: Seq[String], measures: Seq[String],
            feedDir: String, viewTable: String, checkpoint: String,
            pruneOn: Option[String] = None,
            writer: String = "viewgate",
            maxRetries: Int = 0): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val note = MergeGate.batchNote(writer, batchId)
        // materialize the batch once (after the free ledger check) — the
        // merge evaluates its updates 2–4×, each a re-read of the staged
        // input ([[MergeGate]])
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
        ViewMaintenance.maintain(spark, table, keys, dims, measures,
          feedDir, viewTable)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
