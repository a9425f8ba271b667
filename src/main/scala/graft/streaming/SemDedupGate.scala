package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Streaming SEMANTIC dedup ingest gate — [[graft.ext.Similarity.semanticDedup]]
  * (the SemDeDup shape, Abbas et al. 2023, arXiv:2303.09540) composed with
  * the [[NearDupGate]] ingest pattern: each micro-batch of (vec_id,
  * embedding) rows drops vectors whose cosine to ANY kept history vector
  * in a shared k-means cell reaches the threshold, applies the
  * keep-smaller-id rule within the batch, then appends its own kept
  * vectors to the history — so an embedding-level duplicate arriving
  * batches after its original is caught without re-embedding or
  * re-clustering anything.
  *
  * Reference analog: none — extends the reference's incremental file
  * ingest (batch-only pipeline scripts) to embedding-space dedup.
  *
  * Scale posture (100 TB, growing history):
  *  - centroids are FROZEN training artifacts (same discipline as the IVF
  *    serve path, x18): assignment is a narrow native expression, no
  *    per-batch clustering;
  *  - history is stored CELL-PARTITIONED (`__cell=<c>` directories,
  *    vectors pre-exploded into their nprobe cells): the per-batch
  *    history read prunes to the cells the batch actually probes, so the
  *    join cost is O(history ∩ probed cells), never a history scan;
  *  - per-batch state lands in `b<batchId>` subdirectories (append = new
  *    files, object-store safe), and the history read takes only dirs
  *    with id < batchId — crash replay sees the same history, rewrites
  *    the same dirs, and stays exactly-once (NearDupGate's discipline).
  */
object SemDedupGate {

  /** Explode `df` (vec_id, embedding) into its `nprobe` nearest cells:
    * (__cell, vec_id, __v double-array). */
  private def withCells(df: DataFrame, centroids: Array[Array[Double]],
                        nprobe: Int): DataFrame =
    df.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("__v"))
      .withColumn("__cell",
        explode(graft.functions.VectorExprs.nearestCentroids(col("__v"), centroids, nprobe)))

  def start(spark: SparkSession, source: DataFrame,
            centroids: Array[Array[Double]],
            histDir: String, outDir: String, checkpoint: String,
            threshold: Double = 0.95, nprobe: Int = 2,
            batchPartitions: Int = 0): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        val b = batch.repartition(parts).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val bc = withCells(b, centroids, nprobe)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            // per-batch-dir reads unioned (NOT one multi-root read: each
            // b<j> is its own partition-discovery root for the __cell
            // dirs); the cell filter prunes partitions inside every dir
            val histDirs = NearDupGate.historyDirs(spark, histDir, batchId)
            val histDrop = if (histDirs.nonEmpty) {
              // prune the cell-partitioned history to the batch's cells
              // BEFORE the join (partition pruning on the __cell dirs)
              val probed = bc.select("__cell").distinct()
                .collect().map(_.getInt(0)).toSeq
              val hist = histDirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
              bc.join(hist.where(col("__cell").isin(probed: _*))
                  .withColumnRenamed("vec_id", "__hid")
                  .withColumnRenamed("__v", "__hv"), Seq("__cell"))
                .where(Similarity.cosine(col("__v"), col("__hv")) >= threshold)
                .select(col("vec_id").as("__drop"))
            } else spark.range(0).select(col("id").cast("long").as("__drop"))
            // keep-smaller-id within the batch (x63's deterministic rule),
            // reusing the persisted cell assignment — not a second
            // nearest-centroid pass over the batch
            val withinDrop = bc.as("wa").join(bc.as("wb"),
                col("wa.__cell") === col("wb.__cell") &&
                  col("wa.vec_id") < col("wb.vec_id"))
              .where(Similarity.cosine(col("wa.__v"), col("wb.__v")) >= threshold)
              .select(col("wb.vec_id").as("__drop"))
            // drops feed two anti-joins — materialize once, not per sink.
            // NO broadcast hint: drops is proportional to the batch's
            // duplicate count (unbounded — a high-duplication batch could
            // blow the broadcast limit); AQE picks broadcast itself when
            // the materialized size is actually small.
            val drops = histDrop.unionByName(withinDrop).distinct()
              .persist(StorageLevel.MEMORY_AND_DISK)
            try {
              val kept = b.join(drops,
                col("vec_id") === col("__drop"), "left_anti")
              kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
              // only kept vectors join the history, pre-exploded and
              // cell-partitioned for the next batch's pruned read. The
              // repartition on __cell is load-bearing: a dynamic
              // partitionBy write WITHOUT it emits one file per (task ×
              // cell) — at sf10 (400 cells × 32 tasks) that is ~13k tiny
              // files per batch and the next batch's read drowns in
              // listings (the 10× curve caught it at 7.8× wall). With
              // it, each cell's rows land in one task → one file per
              // cell per batch.
              bc.join(drops, col("vec_id") === col("__drop"), "left_anti")
                .repartition(col("__cell"))
                .write.mode("overwrite").partitionBy("__cell")
                .parquet(s"$histDir/b$batchId")
            } finally drops.unpersist(blocking = false)
          } finally bc.unpersist(blocking = false)
        } finally b.unpersist(blocking = false)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
