package graft.streaming

import graft.ext.TextDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Streaming near-duplicate INGEST GATE — the composition a continuous
  * training-data pipeline actually runs: each micro-batch drops documents
  * that near-duplicate the persisted history, then appends its own kept
  * documents (and their MinHash signatures) to that history, so a dup
  * arriving in a LATER batch than its original is caught without ever
  * re-signing history text.
  *
  * Reference analog: none — this extends the reference's incremental
  * file-ingest pattern (`/root/reference` pipeline scripts, batch-only) to
  * content-level dedup; the batch shape is x39
  * ([[TextDedup.minhashNearDupsAgainst]]), the sink shape is st09's
  * foreachBatch upsert.
  *
  * Scale posture (100 TB, growing history):
  *   - history is the [[TextDedup.signatureTable]] parquet artifact —
  *     signatures are computed once per document for its whole lifetime;
  *     the per-batch cost is one band equi-join of O(batch × bands) rows
  *     against history bands plus exact verification on the (vanishing)
  *     candidate set, never a history re-scan of text;
  *   - per-batch state lands in `b<batchId>` subdirectories (write new
  *     files, never rewrite old ones — object-store safe, and the history
  *     "append" is just new files under a prefix);
  *   - CRASH SAFETY: a batch that died after writing its own sigs dir
  *     must not see those sigs as "history" on replay (every row would
  *     self-match and the whole batch would be dropped) — so the history
  *     read takes only dirs with id < batchId ([[historySigs]]), making
  *     replay idempotent: same batch id → same history → same kept set →
  *     same dirs overwritten.
  */
object NearDupGate {

  /** The history directories for `batchId`: every committed-or-partial
    * `b<j>` under `root` with j < batchId — never the running batch's
    * own (possibly partial) output, never later dirs. */
  def historyDirs(spark: SparkSession, root: String, batchId: Long): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b"))
      .map(_.getPath)
      .filter(_.getName.stripPrefix("b").toLong < batchId)
      .map(_.toString)
  }

  /** History signature frames for `batchId` (see [[historyDirs]]). */
  def historySigs(spark: SparkSession, sigDir: String, batchId: Long): Option[DataFrame] = {
    val dirs = historyDirs(spark, sigDir, batchId)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*))
  }

  /** Start the gate over a streaming `source` with columns `idCol`
    * (long) and `textCol` (string). Kept rows land under `outDir/b<id>`,
    * their signatures under `sigDir/b<id>`; drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, idCol: String, textCol: String,
            sigDir: String, outDir: String, checkpoint: String,
            k: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 2,
            threshold: Double = 0.8, batchPartitions: Int = 0): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a micro-batch often arrives as a handful of scan splits (one
        // file ingested = as few as ONE task) while signing is the heavy
        // step — 64 hashes over every shingle. Spread the batch across
        // the executors BEFORE signing; the round-robin exchange moves
        // only raw (id, text) bytes, a vanishing cost next to the hashes
        // it parallelizes. batchPartitions <= 0 sizes to the cluster.
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        // the batch's signatures feed the band join, the verification
        // join, and the kept-history append — sign once
        val sigs = TextDedup.signatureTable(batch.repartition(parts),
            col(idCol), col(textCol), k, numHashes)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val dupIds = historySigs(spark, sigDir, batchId) match {
            case Some(hist) =>
              TextDedup.nearDupsAgainstSigTable(sigs, hist, rowsPerBand, threshold)
                .select(col("new_id").as("__dup_id")).distinct()
            case None => // first batch: nothing to duplicate
              spark.range(0).select(col("id").as("__dup_id"))
          }
          // hits are a vanishing fraction of the batch — broadcast anti-join
          val kept = batch.join(broadcast(dupIds),
            col(idCol) === col("__dup_id"), "left_anti")
          kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
          // only KEPT docs become history: a dropped dup must never shadow
          // future arrivals of yet another copy (its canonical doc does)
          sigs.join(broadcast(dupIds), col("doc_id") === col("__dup_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$sigDir/b$batchId")
        } finally sigs.unpersist(blocking = false)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
