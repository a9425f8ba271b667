package graft.streaming

import graft.ext.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming VECTOR INGEST into a persisted IVF index — the continuous
  * companion of [[Similarity.appendToIvfIndex]]: each micro-batch of
  * (vec_id, embedding) rows is assigned to the EXISTING centroids and
  * appended to the bucketed inverted file, so [[Similarity.ivfTopKIndexed]]
  * serves base ∪ everything ingested so far with no retrain and no base
  * re-scan. Pair with [[Similarity.ivfAssignQuality]]/[[Similarity.IvfDrift]]
  * to decide when appending must give way to a rebuild.
  *
  * Reference analog: none — this extends the reference's incremental
  * file-ingest loop (batch-only, `/root/reference` pipeline scripts) to
  * index maintenance.
  *
  * EXACTLY-ONCE across crash/replay, at O(batch) normal-path cost:
  * foreachBatch re-delivers whole batches after a crash, and a bucketed
  * catalog table cannot re-overwrite per-batch output the way
  * [[NearDupGate]]'s directory layout can — a blind re-append would
  * duplicate vectors. A two-phase marker per batch closes the hole
  * without ever scanning the index on the happy path:
  *
  *   - `b<id>.committed` exists → the batch fully landed; skip it.
  *   - `b<id>.started` but no committed → a crash hit mid-append; the
  *     replay appends only rows NOT already in the index (anti-join on
  *     (cell, vec_id), bucket-pruned to the batch's own cells — a
  *     recovery-only cost, never the steady-state one).
  *   - neither marker → first delivery; plain append between markers.
  *
  * Markers are empty files, written AFTER the append they witness —
  * new-files-only, object-store safe (same discipline as
  * [[graft.incremental.Incremental]]'s tracker).
  */
object VectorIngest {

  /** One batch, idempotently. Exposed for direct testing of the replay
    * and crash-recovery paths. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, table: String,
                  centroids: Array[Array[Double]], trackerDir: String,
                  batchId: Long, numBuckets: Int = 16): Unit = {
    import graft.functions.VectorExprs.nearestCentroids
    val fs = new Path(trackerDir).getFileSystem(spark.sessionState.newHadoopConf())
    val started = new Path(trackerDir, s"b$batchId.started")
    val committed = new Path(trackerDir, s"b$batchId.committed")
    if (fs.exists(committed)) return // fully landed before a replay
    val recovering = fs.exists(started)
    val assigned = batch
      .select(col("vec_id").as("neighbor_id"),
        Similarity.toDouble(col("embedding")).as("__cv"))
      .withColumn("__cell", element_at(nearestCentroids(col("__cv"), centroids, 1), 1))
    val fresh =
      if (!recovering) assigned
      else {
        // crash landed an unknown prefix of this batch: drop rows already
        // present. The index side is pruned to the batch's own cells (an
        // O(nlist) driver list), so recovery reads only the touched
        // buckets, and the equi-join on the bucket key reuses the layout.
        val cells = assigned.select("__cell").distinct().collect().map(_.getInt(0))
        val existing = graft.io.Layout.table(spark, table)
          .filter(col("__cell").isin(cells.map(Integer.valueOf).toSeq: _*))
          .select(col("__cell"), col("neighbor_id"))
        assigned.join(existing, Seq("__cell", "neighbor_id"), "left_anti")
      }
    fs.mkdirs(new Path(trackerDir))
    fs.create(started, true).close()
    graft.io.Layout.appendBucketed(fresh, table, "__cell", numBuckets)
    fs.create(committed, true).close()
  }

  /** Drain `source` (vec_id LONG, embedding ARRAY<FLOAT>) into the
    * existing index `table` via [[ingestBatch]]. */
  def start(spark: SparkSession, source: DataFrame, table: String,
            centroids: Array[Array[Double]], trackerDir: String,
            checkpoint: String, numBuckets: Int = 16): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, table, centroids, trackerDir, batchId, numBuckets)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
