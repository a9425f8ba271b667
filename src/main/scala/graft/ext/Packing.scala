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
}
