package graft.streaming

import graft.ext.GopherFilter
import graft.functions.ZstdExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming COMPRESSED-CRAWL ingest gate — the continuous form of the
  * x75 batch ingest: micro-batches deliver `.jsonl.zst` container files
  * (one binary payload per row), each batch drains zstd frames → splits
  * JSON lines → parses documents → runs the Gopher rule gauntlet
  * ([[GopherFilter.gopherRules]]) and appends only the keepers. This is
  * the shape a live corpus build actually runs: the crawler drops
  * compressed containers into object storage; the gate turns them into
  * filtered, schema'd parquet without a separate decompress pass.
  *
  * Reference analog: none — extends the reference's incremental file
  * ingest to compressed-container decode + rule filtering; sink shape
  * follows [[NearDupGate]]/[[DsirGate]] (per-batch `b<id>` dirs,
  * write-new-files-only, object-store safe).
  *
  * The gate is STATELESS (pure per-row rules), so crash replay is
  * trivially idempotent: same batch → same verdicts → same kept set,
  * overwriting the same directory. Containers that fail to decompress
  * (corrupt, bomb-guarded) produce null text → zero parsed lines — data
  * loss to account for upstream, never a crashed query.
  */
object CrawlGate {

  val lineSchema: StructType = StructType.fromDDL("id BIGINT, text STRING")

  /** Start the gate over streaming `source` (column `fileCol` binary —
    * one `.jsonl.zst` container per row). Kept rows land under
    * `outDir/b<id>` with their Gopher rule signals attached. Drain with
    * AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, fileCol: String,
            outDir: String, checkpoint: String, minWords: Int = 50,
            batchPartitions: Int = 0): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a one-file batch arrives as one scan split; spread the container
        // rows before the decompress+explode-heavy parse (NearDupGate's
        // rationale)
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        val parsed = batch.repartition(parts)
          .select(explode(split(ZstdExprs.unzstdText(col(fileCol)), "\n")).as("__l"))
          .filter(col("__l") =!= "")
          .select(from_json(col("__l"), lineSchema).as("__j"))
          .select(col("__j.id").as("doc_id"), col("__j.text").as("text"))
        val kept = GopherFilter.gopherRules(parsed, col("doc_id"), col("text"),
            minWords = minWords)
          .filter(col("keep") === 1L)
          .withColumnRenamed("id", "doc_id")
        kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
