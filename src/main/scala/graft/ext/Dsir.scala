package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling", arXiv:2302.03169): rank every raw
  * document by how much more likely its tokens are under a TARGET unigram
  * model than under the SOURCE (raw-corpus) model, then draw a weighted
  * sample without replacement via the Gumbel top-k trick. This is the
  * standard recipe for tilting a web-scale crawl toward a curated target
  * domain before pretraining.
  *
  * Determinism conventions (cross-engine hashable, like [[LmScore]]):
  * per-token log-ratios are rounded to integer micro-nats and summed as
  * longs; the Gumbel perturbation derives its uniform from an md5 bucket of
  * the document id — the exact dyadic rational (2·b16+1)/2^17 — so the
  * sample is a pure function of the corpus, reproducible across engines,
  * runs, and partitionings.
  *
  * Scale shape: one token explode feeding two map-side-combined
  * aggregations (per-word counts carry a target-filtered partial in the
  * same pass; corpus totals are a broadcast one-row frame), then ONE
  * token⋈weight equi-join and a per-doc reduce — linear in corpus tokens,
  * nothing collected. Selection is a global top-k (TakeOrdered: O(k) per
  * partition, no full sort shuffle).
  */
object Dsir {

  /** (id, __tgt, w) token stream — [[Tfidf]]'s tokenization: whitespace
    * split, lowercased, empty tokens dropped. */
  private def tokenStream(docs: DataFrame, id: Column, text: Column,
                          isTarget: Column): DataFrame =
    docs.select(id.as("id"), isTarget.as("__tgt"),
      explode(filter(split(lower(text), "\\s+"), x => x =!= "")).as("w"))

  /** Reserved vocabulary key carrying the unseen-word weight in a
    * [[weightTable]]: the tokenizer can never emit an empty token, so ""
    * is collision-free. */
  val UnseenKey = ""

  /** (seen, unseen) weight frames from a token stream: `seen` is one
    * (w, __wm) row per corpus word, `unseen` the ONE-ROW smoothing floor
    * (both counts zero) every out-of-vocabulary token scores as. */
  private def weightRows(toks: DataFrame): (DataFrame, DataFrame) = {
    val totals = toks.agg(
      count(lit(1)).as("__ns"),
      sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__nt"),
      count_distinct(col("w")).as("__v"))
    // one grouped pass yields BOTH models' counts (vocabulary-sized frame)
    val seen = toks.groupBy("w")
      .agg(count(lit(1)).as("__cs"),
        sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__ct"))
      .crossJoin(broadcast(totals))
      .select(col("w"),
        round((log((col("__ct") + 1.0) / (col("__nt") + col("__v"))) -
               log((col("__cs") + 1.0) / (col("__ns") + col("__v")))) * 1e6, 0)
          .cast("long").as("__wm"))
    val unseen = totals.select(lit(UnseenKey).as("w"),
      round((log(lit(1.0) / (col("__nt") + col("__v"))) -
             log(lit(1.0) / (col("__ns") + col("__v")))) * 1e6, 0)
        .cast("long").as("__wm"))
    (seen, unseen)
  }

  /** Per-document importance score: (id, n_tokens, score_micro) where
    * score_micro = Σ_tokens round((ln p_target(w) − ln p_source(w)) × 1e6)
    * as an exact long. Both unigram models are add-one smoothed over the
    * shared corpus vocabulary V: p(w) = (C(w)+1)/(N+V), with the target
    * counts taken from `isTarget` docs and the source counts from the whole
    * corpus (the DSIR raw/target convention). */
  def importanceScores(docs: DataFrame, id: Column, text: Column,
                       isTarget: Column, materialize: Boolean = true): DataFrame = {
    // the explode feeds three consumers (totals, per-word counts, the score
    // join) — persist for the one composed job, release before returning
    val toks = tokenStream(docs, id, text, isTarget)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (weights, _) = weightRows(toks) // self-scoring: every token seen
      val scored = toks.join(weights, Seq("w"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("__wm")).as("score_micro"))
      if (materialize) scored.localCheckpoint(true) else scored
    } finally toks.unpersist(blocking = false)
  }

  /** Persistable unigram importance model: one (w, __wm) row per reference
    * word plus the ("", __wm) unseen-floor row. Train once per reference
    * snapshot, write to parquet, serve every later batch/stream through
    * [[scoreAgainst]] — the weights artifact is vocabulary-sized, the
    * train cost is never paid at ingest time. */
  def weightTable(docs: DataFrame, text: Column, isTarget: Column,
                  materialize: Boolean = true): DataFrame = {
    val toks = tokenStream(docs, lit(0L), text, isTarget)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (seen, unseen) = weightRows(toks)
      val table = seen.unionByName(unseen)
      if (materialize) table.localCheckpoint(true) else table
    } finally toks.unpersist(blocking = false)
  }

  /** Score documents against a trained [[weightTable]] (the serve path):
    * out-of-vocabulary tokens take the unseen-floor row's weight. Returns
    * (id, n_tokens, score_micro); documents with zero tokens produce no
    * row. */
  def scoreAgainst(docs: DataFrame, id: Column, text: Column,
                   weights: DataFrame): DataFrame = {
    val toks = tokenStream(docs, id, text, lit(false)).drop("__tgt")
    val dflt = weights.filter(col("w") === UnseenKey)
      .select(col("__wm").as("__dwm"))
    toks.join(weights.filter(col("w") =!= UnseenKey), Seq("w"), "left")
      .crossJoin(broadcast(dflt))
      .select(col("id"), coalesce(col("__wm"), col("__dwm")).as("__wm"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wm")).as("score_micro"))
  }

  /** Gumbel-top-k perturbed key (micro-nats, exact long): score + G(id)
    * where G = −ln(−ln u) and u = (2·md5bucket16(id)+1)/2^17 ∈ (0,1) — a
    * deterministic dyadic uniform, so top-k by this key IS a weighted
    * sample without replacement (Gumbel-max), yet bit-reproducible. */
  def gumbelKeyMicro(id: Column, scoreMicro: Column): Column = {
    val u = (TextAnalysis.hashBucket16(id) * 2 + 1) / lit(131072.0)
    scoreMicro + round(-log(-log(u)) * 1e6, 0).cast("long")
  }

  /** Deterministic importance resample: the `n` documents with the largest
    * Gumbel-perturbed importance keys (ties broken by id). Returns
    * (id, n_tokens, score_micro, key_micro). */
  def resample(docs: DataFrame, id: Column, text: Column, isTarget: Column,
               n: Int): DataFrame =
    importanceScores(docs, id, text, isTarget)
      .withColumn("key_micro", gumbelKeyMicro(col("id"), col("score_micro")))
      .orderBy(col("key_micro").desc, col("id"))
      .limit(n)
}
