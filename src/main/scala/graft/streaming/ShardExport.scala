package graft.streaming

import graft.io.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming WebDataset shard export: micro-batches of documents are
  * packed into POSIX ustar shards ([[graft.functions.TarExprs]] — each
  * sample a `<id>.txt`/`<id>.src` entry pair, shard = corpus bucket) and
  * every batch's shards land as ONE snapshot-manifest transaction — the
  * continuous export side of the x120 batch job: a training run can pin a
  * shard-table VERSION while ingest keeps streaming, and any historical
  * shard set stays time-travel readable.
  *
  * Exactly-once across crash replays by the [[SnapshotIngest]] discipline
  * (the shared [[Snapshots.commitBatchOnce]]): the batch's data dir is a
  * deterministic function of the batch id and the manifest is the
  * idempotence ledger — a replayed batch that already committed is a
  * no-op, a batch that crashed pre-commit overwrites its own orphan.
  *
  * Shard assembly is per-batch and per-bucket: one partial-aggregated
  * shuffle on the bucket key, one tar_pack allocation per shard. Buckets
  * split a batch for write parallelism; entries WITHIN a shard are
  * doc-id-sorted so the layout is deterministic under replay.
  *
  * Reference analog: none (north-star extension) — composes the
  * incremental-ingest shape with the container-export family.
  */
object ShardExport {

  /** Pack one (micro-)batch of `(doc_id, text, source)` into
    * `(bucket, tar_file)` shards — shared by the stream sink and tests.
    * Null doc_id rows are dropped WITH the null-text rows: a null id would
    * make the entry name null, tar_pack would refuse the whole bucket
    * (null shard), and commit would silently persist a shard that explodes
    * to zero entries on read-back — the row-level drop keeps the job-level
    * "refuse, not silently truncate" contract. */
  def packShards(batch: DataFrame, buckets: Long): DataFrame =
    batch.filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select((col("doc_id") % buckets).as("bucket"), col("doc_id"),
        expr("array(" +
          "struct(concat(cast(doc_id AS string), '.txt') AS name, " +
          "       encode(text, 'UTF-8') AS payload), " +
          "struct(concat(cast(doc_id AS string), '.src') AS name, " +
          "       encode(coalesce(source, ''), 'UTF-8') AS payload))").as("es"))
      .groupBy("bucket")
      .agg(graft.functions.TarExprs.tarPack(
        expr("flatten(transform(array_sort(collect_list(struct(doc_id, es))), " +
          "x -> x.es))")).as("tar_file"))

  /** Start exporting `source` (schema: doc_id, text, source) as tar
    * shards into the versioned `table`; drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, table: String,
            checkpoint: String, buckets: Long): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Snapshots.commitBatchOnce(spark, table, batchId,
          packShards(batch, buckets))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
