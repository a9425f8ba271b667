package graft.streaming

import graft.ext.Dsir
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming model-based QUALITY GATE — the DSIR serve path run at ingest:
  * every micro-batch is scored against a train-once unigram importance
  * artifact ([[Dsir.weightTable]] parquet) and only documents whose mean
  * per-token importance clears the threshold are kept. This is how a
  * continuous pipeline applies importance filtering: the model is a
  * vocabulary-sized artifact trained offline from a reference snapshot;
  * ingest pays one token⋈weight equi-join per batch, never a retrain.
  *
  * Reference analog: none — extends the reference's incremental file
  * ingest to model-based filtering; sink shape follows [[NearDupGate]]
  * (per-batch `b<id>` dirs, write-new-files-only, object-store safe).
  *
  * Unlike the near-dup gate the filter is STATELESS (the model does not
  * grow with ingest), so crash replay is trivially idempotent: same batch
  * → same scores → same kept set, overwriting the same directory.
  * Documents with zero tokens carry no evidence and are dropped.
  */
object DsirGate {

  /** Start the gate over streaming `source` (columns `idCol` long,
    * `textCol` string), scoring against the weight artifact at
    * `weightsPath`. Kept rows land under `outDir/b<id>` with their
    * (n_tokens, score_micro) attached; keep iff
    * score_micro ≥ minAvgMicro × n_tokens. Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, idCol: String, textCol: String,
            weightsPath: String, outDir: String, checkpoint: String,
            minAvgMicro: Long = 0L, batchPartitions: Int = 0): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // same rationale as NearDupGate: a one-file batch arrives as one
        // scan split; spread it before the explode-heavy scoring
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        val weights = spark.read.parquet(weightsPath)
        val kept = Dsir.scoreAgainst(batch.repartition(parts),
            col(idCol), col(textCol), weights)
          .filter(col("score_micro") >= col("n_tokens") * minAvgMicro)
          .withColumnRenamed("id", idCol)
          .join(batch, Seq(idCol))
        kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
