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
  *
  * QUANTIZER REFRESH (the [[graft.ext.Similarity.IvfDrift]] trigger,
  * opt-in via `refMeanSim`): a drifting corpus degrades cell balance —
  * new vectors land far from every frozen centroid, crowd few cells, and
  * the per-batch join stops pruning. With a calibration reference, each
  * batch's mean assignment cosine is measured (one narrow pass over the
  * batch already in memory); when it falls `driftMargin` below the
  * reference, the gate RE-CLUSTERS: deterministic k-means over kept
  * history ∪ batch ([[Similarity.kmeansCentroids]] — id-seeded, so crash
  * replay re-derives identical centroids), the whole history re-explodes
  * under the new cells into THIS batch's directory with a `_rebased`
  * marker (one atomic generation switch: later batches read from the
  * newest rebase forward, never mixing cell layouts), and the new
  * centroids + refreshed reference persist as a `centroids-b<id>`
  * artifact every later batch resolves before processing. Without
  * `refMeanSim` the gate behaves exactly as before — frozen quantizer,
  * zero extra passes. */
object SemDedupGate {

  /** Explode `df` (vec_id, embedding) into its `nprobe` nearest cells:
    * (__cell, vec_id, __v double-array). */
  private def withCells(df: DataFrame, centroids: Array[Array[Double]],
                        nprobe: Int): DataFrame =
    df.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("__v"))
      .withColumn("__cell",
        explode(graft.functions.VectorExprs.nearestCentroids(col("__v"), centroids, nprobe)))

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** History dirs for `batchId`, honoring rebase generations: when a
    * `_rebased` marker exists among them, only dirs at or after the
    * newest rebase are live (the rebase dir CONTAINS the whole prior
    * history re-exploded — reading older dirs would double-count under a
    * stale cell layout). */
  private def liveHistoryDirs(spark: SparkSession, histDir: String,
                              batchId: Long): Seq[String] = {
    val dirs = NearDupGate.historyDirs(spark, histDir, batchId)
    if (dirs.isEmpty) return dirs
    val f = fs(spark, histDir)
    val rebased = dirs.filter(d =>
      f.exists(new org.apache.hadoop.fs.Path(s"$d/_rebased")))
    if (rebased.isEmpty) dirs
    else {
      val floor = rebased.map(d =>
        new org.apache.hadoop.fs.Path(d).getName.stripPrefix("b").toLong).max
      dirs.filter(d =>
        new org.apache.hadoop.fs.Path(d).getName.stripPrefix("b").toLong >= floor)
    }
  }

  /** The active quantizer for `batchId`: the newest `centroids-b<j>`
    * artifact with j < batchId (a replayed batch must not see its own
    * rebuild), else the construction-time centroids. Returns
    * (centroids, refMeanSim). */
  private def activeCentroids(spark: SparkSession, histDir: String, batchId: Long,
                              initial: Array[Array[Double]],
                              initialRef: Option[Double])
      : (Array[Array[Double]], Option[Double]) = {
    val root = new org.apache.hadoop.fs.Path(histDir)
    val f = fs(spark, histDir)
    if (!f.exists(root)) return (initial, initialRef)
    val arts = f.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("centroids-b"))
      .map(st => st.getPath.getName.stripPrefix("centroids-b").toLong -> st.getPath)
      .filter(_._1 < batchId)
    if (arts.isEmpty) (initial, initialRef)
    else {
      val rows = spark.read.parquet(arts.maxBy(_._1)._2.toString)
        .orderBy("cell").collect()
      (rows.map(_.getSeq[Double](1).toArray), Some(rows.head.getDouble(2)))
    }
  }

  def start(spark: SparkSession, source: DataFrame,
            centroids: Array[Array[Double]],
            histDir: String, outDir: String, checkpoint: String,
            threshold: Double = 0.95, nprobe: Int = 2,
            batchPartitions: Int = 0,
            refMeanSim: Option[Double] = None,
            driftMargin: Double = 0.05,
            retrainIters: Int = 3): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        val b = batch.repartition(parts).persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val (cents0, ref0) =
            activeCentroids(spark, histDir, batchId, centroids, refMeanSim)
          val histDirs = liveHistoryDirs(spark, histDir, batchId)
          // drift check: one narrow pass over the in-memory batch; only
          // meaningful against history (an empty gate has nothing to
          // re-cluster) and only when a calibration reference exists
          val drifted = ref0.exists { ref =>
            histDirs.nonEmpty &&
              Similarity.IvfDrift(ref, Similarity.ivfAssignQuality(b, cents0),
                driftMargin).shouldRetrain
          }
          // (cents, histForBatch, rebasedHistory): on drift, retrain on
          // kept history ∪ batch (deterministic — replay re-derives the
          // same quantizer) and re-explode the history under the new
          // cells; it both serves this batch's dedup join and lands in
          // this batch's dir as the new single history generation
          val (cents, histOpt) =
            if (!drifted) {
              val h =
                if (histDirs.isEmpty) None
                else Some(histDirs.map(spark.read.parquet(_)).reduce(_ unionByName _))
              (cents0, h)
            } else {
              val histVecs = histDirs.map(spark.read.parquet(_))
                .reduce(_ unionByName _)
                .select(col("vec_id"), col("__v")).dropDuplicates("vec_id")
              val trainSet = histVecs
                .unionByName(b.select(col("vec_id"),
                  Similarity.toDouble(col("embedding")).as("__v")))
                .dropDuplicates("vec_id")
                .select(col("vec_id"), col("__v").as("embedding"))
              val fresh = Similarity.kmeansCentroids(trainSet, cents0.length,
                retrainIters)
              // used by both the dedup join and the generation write —
              // persist, or the history re-reads + re-assigns twice
              val rehist = withCells(
                histVecs.select(col("vec_id"), col("__v").as("embedding")),
                fresh, nprobe).persist(StorageLevel.MEMORY_AND_DISK)
              // refreshed reference: the batch's assignment quality under
              // the NEW quantizer (it participated in training — slightly
              // optimistic, which only makes the next trigger earlier)
              val newRef = Similarity.ivfAssignQuality(b, fresh)
              import spark.implicits._
              fresh.zipWithIndex
                .map { case (c, i) => (i, c.toSeq, newRef) }.toSeq
                .toDF("cell", "vec", "ref")
                .coalesce(1).write.mode("overwrite")
                .parquet(s"$histDir/centroids-b$batchId")
              (fresh, Some(rehist))
            }
          val bc = withCells(b, cents, nprobe)
            .persist(StorageLevel.MEMORY_AND_DISK)
          try {
            val histDrop = histOpt.map { hist0 =>
              // prune the cell-partitioned history to the batch's cells
              // BEFORE the join (partition pruning on the __cell dirs;
              // a just-rebased in-memory history filters the same way)
              val probed = bc.select("__cell").distinct()
                .collect().map(_.getInt(0)).toSeq
              bc.join(hist0.where(col("__cell").isin(probed: _*))
                  .withColumnRenamed("vec_id", "__hid")
                  .withColumnRenamed("__v", "__hv"), Seq("__cell"))
                .where(Similarity.cosine(col("__v"), col("__hv")) >= threshold)
                .select(col("vec_id").as("__drop"))
            }.getOrElse(
              spark.range(0).select(col("id").cast("long").as("__drop")))
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
              // cell per batch. A rebase batch additionally folds the
              // ENTIRE re-exploded history into its dir — the one
              // generation switch — and stamps the `_rebased` marker
              // LAST (readers treat the dir as a plain batch until the
              // marker exists; replay overwrites dir then marker again).
              val keptExploded = bc.join(drops,
                col("vec_id") === col("__drop"), "left_anti")
              val histOut =
                if (drifted) keptExploded.unionByName(histOpt.get)
                else keptExploded
              histOut
                .repartition(col("__cell"))
                .write.mode("overwrite").partitionBy("__cell")
                .parquet(s"$histDir/b$batchId")
              if (drifted) {
                fs(spark, histDir).create(new org.apache.hadoop.fs.Path(
                  s"$histDir/b$batchId/_rebased"), true).close()
                histOpt.foreach(_.unpersist(blocking = false))
              }
            } finally drops.unpersist(blocking = false)
          } finally bc.unpersist(blocking = false)
        } finally b.unpersist(blocking = false)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
