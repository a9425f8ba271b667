package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in
  * ascending id order into one token stream, which is cut into fixed
  * `ctxLen` context windows (a document may straddle a cut — the standard
  * concat-and-chunk layout, not bin packing). Downstream, a trainer reads
  * window w by scanning the docs whose [start_window, start_window +
  * windows_spanned) interval covers w.
  *
  * Scale posture: the global token offsets come from
  * [[graft.ops.PrefixSum]] — one bucket shuffle, parallel per-bucket
  * windows, no single-partition window over data rows. Everything else is
  * per-row arithmetic inside whole-stage codegen.
  */
object Packing {

  /** Per-document packing coordinates: n_tokens, start_offset_global (the
    * doc's first token's position in the concatenated stream), start_window
    * (= start_offset_global / ctxLen), start_offset (position within that
    * window), windows_spanned (≥1; empty docs count as 1 token wide for the
    * span so every doc lands somewhere). Deterministic given unique ids. */
  def packWindows(df: DataFrame, id: String, tokens: Column, ctxLen: Long,
                  buckets: Int = 256): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val t = df.select(col(id), tokens.cast("long").as("n_tokens"))
    graft.ops.PrefixSum.exclusivePrefixSum(t, id, "n_tokens", "start_offset_global", buckets)
      .withColumn("start_window", (col("start_offset_global") / ctxLen).cast("long"))
      .withColumn("start_offset", col("start_offset_global") % ctxLen)
      .withColumn("windows_spanned",
        ((col("start_offset_global") + greatest(col("n_tokens"), lit(1L)) - 1) / ctxLen)
          .cast("long") - col("start_window") + 1)
  }

  /** Sliding-window document chunking (RAG / embedding prep): whitespace
    * tokens cut into `chunkSize`-token chunks every `stride` tokens
    * (stride < chunkSize ⇒ overlap; the final chunk may be short but is
    * never fully contained in its predecessor — starts stop at the last
    * window that reaches the end, so no duplicate content is embedded
    * twice). Null-text docs emit no chunks. Pure per-row explode + slice —
    * embarrassingly parallel, no shuffle; original casing preserved.
    * Output: (id, chunk_idx, n_chunk_tokens, chunk_text). */
  def chunkTokens(df: DataFrame, id: String, text: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val n = size(col("__tk"))
    // last start = ceil((n - chunkSize)/stride)*stride, floored at 0
    val lastStart = when(n <= chunkSize, lit(0))
      .otherwise(((n - chunkSize + stride - 1) / stride).cast("int") * stride)
    df.filter(text.isNotNull)
      .select(col(id), split(text, " ").as("__tk"))
      .withColumn("__cs", explode(sequence(lit(0), lastStart, lit(stride))))
      .select(col(id),
        (col("__cs") / stride).cast("long").as("chunk_idx"),
        size(slice(col("__tk"), col("__cs") + 1, lit(chunkSize))).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__tk"), col("__cs") + 1, lit(chunkSize)), " ").as("chunk_text"))
  }

  /** NO-STRADDLE greedy bin packing — the other published packing layout
    * ([[packWindows]] is concat-and-chunk, where documents split across
    * window cuts; here documents pack WHOLE and a doc that would overflow
    * the open bin closes it — the fine-tuning / long-context layout where
    * cutting a document mid-way is not acceptable).
    *
    * Greedy packing is inherently sequential, so the distributed form
    * shards the corpus deterministically (`id % shards`) and packs each
    * shard independently: rows pre-shuffle by shard, sort by (shard, id)
    * within partitions, and ONE partition-local streaming pass runs the
    * accumulator (a window cannot express a capacity-reset fold —
    * `mapPartitions` is the honest Spark shape). Every shard packs in
    * parallel; waste is bounded by one open bin per shard, vanishing at
    * corpus scale. An oversized document (> capacity) occupies a bin
    * alone. Null ids drop (no place in the deterministic order); null
    * token counts pack as 0.
    *
    * Output: one row per document — `(id, n_tokens, shard, bin)`, `bin`
    * counting from 0 within its shard. Deterministic given unique ids. */
  def packGreedy(df: DataFrame, id: Column, nTokens: Column,
                 capacity: Long, shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(capacity >= 1 && shards >= 1)
    val base = df
      .select(id.cast("long").as("id"), nTokens.cast("long").as("n_tokens"))
      .filter(col("id").isNotNull)
      .na.fill(0L, Seq("n_tokens"))
      .withColumn("shard", pmod(col("id"), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    base.mapPartitions { rows =>
      // several shards can share a partition (hash co-location): state
      // resets at every shard change; within a shard rows arrive id-sorted
      var curShard = -1L
      var bin = 0L
      var acc = 0L
      rows.map { r =>
        val docId = r.getLong(0)
        val n = r.getLong(1)
        val shard = r.getLong(2)
        if (shard != curShard) { curShard = shard; bin = 0L; acc = 0L }
        if (acc > 0 && acc + n > capacity) { bin += 1; acc = n }
        else acc += n
        Row(docId, n, shard, bin)
      }
    }(enc)
  }
}
