package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BENCHMARK-DECONTAMINATION gate — the continuous form of the
  * x112 overlap scrub: documents stream in, any doc sharing at least
  * `minHits` word k-gram OCCURRENCES with a STATIC evaluation/benchmark
  * corpus is dropped at ingest, keepers append with their overlap signal
  * attached. This is the gate a live pretraining-corpus build runs so
  * eval answers never enter the training set in the first place (GPT-3
  * appendix C run as admission control instead of a post-hoc sweep).
  *
  * Scale shape: the benchmark's DISTINCT k-gram set builds ONCE at gate
  * start and persists (benchmarks are MBs; the set broadcasts under AQE),
  * so each micro-batch pays one map-side explode of its own shingles plus
  * a broadcast semi-join — O(batch grams) per batch, nothing global, no
  * state store. The gate is stateless beyond that static set, so crash
  * replay is trivially idempotent: same batch → same verdicts → same kept
  * set, overwriting the same `b<id>` directory (the
  * [[NearDupGate]]/[[CrawlGate]] sink discipline).
  *
  * Reference analog: none (north-star extension) — composes the
  * [[graft.ext.Contamination]] batch algebra into the incremental-ingest
  * shape the reference runs for files.
  */
object DecontamGate {

  /** Start the gate over streaming `source` (columns `doc_id`, `text`).
    * `bench` is the static benchmark corpus; docs sharing ≥ `minHits`
    * k-gram occurrences with it drop. Kept rows land under `outDir/b<id>`
    * as (doc_id, text, bench_hits). Drain with AvailableNow. */
  def start(spark: SparkSession, source: DataFrame,
            bench: DataFrame, benchText: Column,
            outDir: String, checkpoint: String,
            k: Int = 5, minHits: Int = 2,
            batchPartitions: Int = 0): StreamingQuery = {
    // the static gram universe: built once, persisted for every batch
    val benchGrams = bench
      .select(explode(TextAnalysis.ngrams(benchText, k)).as("__g"))
      .distinct()
      .persist()
    benchGrams.count() // materialize before the first batch
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parts =
          if (batchPartitions > 0) batchPartitions
          else spark.sparkContext.defaultParallelism
        // the batch feeds TWO branches (the gram explode and the final
        // keep join) — cache it so the source is read and repartitioned
        // once per micro-batch, not twice
        val b = batch.repartition(parts).persist()
        try {
          val hits = b
            .select(col("doc_id"), explode(TextAnalysis.ngrams(col("text"), k)).as("__g"))
            .join(broadcast(benchGrams), Seq("__g"), "inner")
            .groupBy("doc_id").agg(count(lit(1)).as("bench_hits"))
          val kept = b
            .join(hits, Seq("doc_id"), "left")
            .withColumn("bench_hits", coalesce(col("bench_hits"), lit(0L)))
            .filter(col("bench_hits") < minHits)
          kept.write.mode("overwrite").parquet(s"$outDir/b$batchId")
        } finally b.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
