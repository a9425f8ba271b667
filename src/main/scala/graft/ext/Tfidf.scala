package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the standard
  * relevance weight for corpus search, near-duplicate triage, and topic
  * labeling in a training-data pipeline. The reference has no text
  * operators; this extends the north-star surface alongside
  * [[TextAnalysis]].
  *
  * Scale shape: two aggregations and one equi-join, all on the exploded
  * term stream — (id, term) term frequencies (map-side combined), term
  * document frequencies derived from the TF table (already one row per
  * (id, term), so DF is exact without a distinct), and a shuffle join
  * TF⋈DF on term. The corpus size rides in as a broadcast one-row frame
  * (no eager driver action), and the final per-document top-n uses the
  * bounded-heap aggregate ([[graft.functions.TopKAgg]]) — never a window
  * over every document's full vocabulary.
  */
object Tfidf {

  /** Smoothed TF-IDF: tf × (ln((N+1)/(df+1)) + 1), rounded to 4 dp —
    * the +1s keep corpus-wide terms positive and unseen-term division
    * impossible; rounding pins cross-engine float parity AND makes the
    * downstream ranking engine-stable. */
  private def score(tf: Column, df: Column, n: Column): Column =
    round(tf * (log((n + 1.0) / (df + 1.0)) + 1.0), 4)

  /** Full (id, term, tfidf) relevance table. Tokenization is a WHITESPACE-
    * CLASS split (tabs/newlines split too, runs collapse) with empty terms
    * dropped — unlike [[TextAnalysis.tokens]]'s single-space split, a
    * doubled space can't mint a phantom "" keyword and 'a\nb' can't reach
    * the ranking as one glued term. */
  def termScores(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val terms = docs
      .select(id.as("id"), explode(split(lower(text), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"), score(col("tf"), col("df"), col("__n")).as("tfidf"))
  }

  /** Top-n keywords per document: (id, rk, term, tfidf), rk 1-based by
    * (tfidf desc, term asc) — heap-bounded per map task, so the widest
    * vocabulary never bounds the stage. */
  def topKeywords(docs: DataFrame, id: Column, text: Column, nTop: Int): DataFrame =
    graft.functions.TopKAgg.rankTopKString(termScores(docs, id, text),
        group = col("id"), score = col("tfidf"), id = col("term"), k = nTop)
      .select(col("group").as("id"), col("rk"), col("id").as("term"),
        col("score").as("tfidf"))
}
