package graft.streaming

import graft.ext.Bm25
import graft.io.Snapshots
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BM25 index maintenance: each micro-batch of documents appends
  * its APPENDABLE postings ([[Bm25.indexAppendable]] — no denormalized df,
  * so existing rows never need rewriting) and one partial stats row, each
  * committed through its own snapshot manifest ([[graft.io.Snapshots]]).
  * Serving any index VERSION gives exactly the scores a batch build over
  * the same documents would: df is derived from matched postings at serve
  * time and corpus constants are the summed partials.
  *
  * Exactly-once across crash replays by the [[SnapshotIngest]] rule: batch
  * data dirs are deterministic functions of the batch id and the manifest
  * is the idempotence ledger (postings and stats guarded independently —
  * a crash between the two commits replays only the missing one).
  */
object Bm25Ingest {

  def postingsTable(indexRoot: String): String = s"$indexRoot/postings"
  def statsTable(indexRoot: String): String = s"$indexRoot/stats"

  private def commitOnce(spark: SparkSession, table: String, batchId: Long,
                         df: DataFrame): Unit =
    Snapshots.commitBatchOnce(spark, table, batchId, df)

  /** Start maintaining the index at `indexRoot` from streaming `source`
    * (columns `idCol` long, `textCol` string). Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, idCol: String, textCol: String,
            indexRoot: String, checkpoint: String): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val postings = Bm25.indexAppendable(batch, col(idCol), col(textCol))
          .localCheckpoint(true) // two consumers + two commits: one compute
        commitOnce(spark, postingsTable(indexRoot), batchId, postings)
        commitOnce(spark, statsTable(indexRoot), batchId, Bm25.batchStats(postings))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Serve top-k against the maintained index as of its CURRENT versions
    * (pass versions to time-travel an older index state). */
  def search(spark: SparkSession, indexRoot: String, queries: DataFrame,
             qid: org.apache.spark.sql.Column, qtext: org.apache.spark.sql.Column,
             topK: Int = 10): DataFrame =
    Bm25.searchAppendable(
      Snapshots.readAt(spark, postingsTable(indexRoot)),
      Snapshots.readAt(spark, statsTable(indexRoot)),
      queries, qid, qtext, topK = topK)
}
