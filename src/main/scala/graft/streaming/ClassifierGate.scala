package graft.streaming

import graft.ext.Classifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming LEARNED-quality gate — the trained classifier (x96) run at
  * ingest: every micro-batch is scored against the train-once weight
  * artifact (a (buckets+1)-row parquet) and only documents whose margin
  * clears the threshold are kept. The model never retrains at ingest;
  * each batch pays one hashed-feature aggregation plus one broadcast
  * join — the cheapest possible model serve.
  *
  * Stateless like [[DsirGate]] (the model does not grow with ingest), so
  * crash replay is trivially idempotent: same batch → same margins →
  * same kept set, overwriting the same `b<id>` directory.
  */
object ClassifierGate {

  /** Start the gate over streaming `source` (columns `idCol` long,
    * `textCol` string), scoring against the weights at `weightsPath`
    * (`(j, w_micro)`, [[Classifier.trainLogistic]] output). Kept rows
    * land under `outDir/b<id>` with `margin_micro` attached; keep iff
    * margin_micro > minMarginMicro. Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame, idCol: String, textCol: String,
            weightsPath: String, outDir: String, checkpoint: String,
            buckets: Int = 32, minMarginMicro: Long = 0L,
            batchPartitions: Int = 0): StreamingQuery = {
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        val weights = spark.read.parquet(weightsPath)
        val feats = Classifier.hashedFeatures(batch.repartition(parts),
          col(idCol), col(textCol), buckets)
        val kept = Classifier.score(feats, weights)
          .filter(col("margin_micro") > minMarginMicro)
          .withColumnRenamed("id", idCol)
          .join(batch, Seq(idCol))
        kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
