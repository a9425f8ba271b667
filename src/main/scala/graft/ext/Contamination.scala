package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * k-grams with an evaluation/benchmark corpus (the GPT-3-style n-gram
  * overlap check — eval answers leaking into pretraining data inflate
  * benchmark scores and must be dropped before training).
  *
  * Scale shape: the benchmark side is SMALL (an eval set — thousands of
  * rows), so its distinct k-gram set broadcasts; the corpus side explodes
  * into k-grams map-side and hash-semi-joins against the broadcast — no
  * corpus shuffle at all until the per-doc hit aggregation (and that
  * carries only contaminated (doc, gram) pairs, a vanishing fraction at
  * 100 TB). k-grams come from the native WordShingles expression, not an
  * interpreted HOF.
  */
object Contamination {

  /** Per-contaminated-doc overlap stats: (id, n_hits = k-gram occurrences
    * shared with the benchmark, n_grams = distinct shared k-grams). Clean
    * documents do not appear — at corpus scale the result is tiny. */
  def contaminatedDocs(docs: DataFrame, id: Column, text: Column,
                       benchmark: DataFrame, benchText: Column, k: Int): DataFrame = {
    val bench = benchmark
      .select(explode(TextAnalysis.ngrams(benchText, k)).as("__gram"))
      .distinct()
    docs.select(id.as("id"), explode(TextAnalysis.ngrams(text, k)).as("__gram"))
      .join(broadcast(bench), Seq("__gram"), "inner")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"),
        count_distinct(col("__gram")).as("n_grams"))
  }

  /** The removal companion: `docs` minus every contaminated document —
    * broadcast anti-join on the contaminated id set. */
  def decontaminate(docs: DataFrame, id: Column, text: Column,
                    benchmark: DataFrame, benchText: Column, k: Int): DataFrame = {
    val bad = contaminatedDocs(docs, id, text, benchmark, benchText, k)
      .select(col("id").as("__contaminated_id"))
    docs.join(broadcast(bad), id === col("__contaminated_id"), "left_anti")
  }

  /** Per-document k-gram NOVELTY against a LARGE reference corpus — the
    * memorization-risk twin of [[contaminatedDocs]]. Where decontamination
    * asks "does this doc overlap a small eval set" (broadcast), novelty
    * asks "how much of this doc already exists in another CORPUS" — the
    * signal behind dedup-across-snapshots, cross-source redundancy audits
    * and memorization studies (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" measures exactly this overlap).
    * Returns (id, n_shingles, n_seen): distinct word k-grams in the doc,
    * and how many of them occur anywhere in `reference`. Novelty =
    * 1 − n_seen/n_shingles is the caller's one division. Docs with fewer
    * than k tokens have no k-grams and do not appear.
    *
    * Scale shape: the reference collapses to its DISTINCT k-gram table —
    * at 100 TB that table is the thing to persist (bucketed on the gram)
    * and reuse across ingests rather than recompute; scoring is then one
    * shuffle equi-join on the gram plus a per-doc count aggregation.
    * The join key here is the raw gram string (oracle parity at test SF);
    * a production deployment joins on a 128-bit gram digest to halve the
    * shuffle width — same plan shape, negligible collision mass. */
  def noveltyScores(docs: DataFrame, id: Column, text: Column,
                    reference: DataFrame, refText: Column, k: Int): DataFrame = {
    val ref = reference
      .select(explode(TextAnalysis.ngrams(refText, k)).as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1L))
    docs.select(id.as("id"),
        explode(array_distinct(TextAnalysis.ngrams(text, k))).as("__gram"))
      .join(ref, Seq("__gram"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_seen"))
  }
}
