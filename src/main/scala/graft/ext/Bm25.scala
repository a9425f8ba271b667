package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the standard ranking
  * function for corpus exploration, seed-query curation ("find documents
  * like these instructions"), and contamination triage in a training-data
  * pipeline. The reference has no text operators; this extends the
  * north-star search surface next to [[Tfidf]] (relevance weights) and the
  * ANN family in [[Similarity]] (dense retrieval) with the sparse/lexical
  * retrieval path.
  *
  * Scale shape, build: the inverted index is three aggregations over one
  * exploded term stream — (id, term) term frequencies (map-side combined),
  * per-document lengths, per-term document frequencies derived from the TF
  * table (already one row per (id, term), so DF is exact without a
  * distinct) — joined back into a denormalized postings table
  * `(term, df, id, tf, dl)`. Written partition-pruned by term prefix or
  * bucketed by term, the index is a build-once artifact (same posture as
  * the IVF/PQ indexes); corpus-level stats ride along as ONE summary row
  * derivable from the index itself, so serve needs no side artifact.
  *
  * Scale shape, serve: query terms are a tiny frame — the candidate fetch
  * is postings ⋈ broadcast(query terms) on `term` (at 100 TB: a pruned
  * read of only the matched term partitions, never a corpus scan), one
  * partial-aggregated per-(query, doc) sum, and a bounded-heap top-k
  * ([[graft.functions.TopKAgg]]) — no window over the full match set, no
  * driver-side scoring.
  *
  * Determinism: per-(term, doc) contributions are computed in IEEE double
  * with a FIXED expression shape (idf × saturated-tf, Lucene's +1-inside-
  * the-log idf so scores stay positive), then pinned to exact integer
  * micro-units via `round(× 1e6)` before the order-dependent aggregation —
  * the per-doc score is an exact long sum of longs (the [[LmScore]]
  * micro-nat convention), so ranking and cross-engine hashes are stable.
  */
object Bm25 {

  /** Tokenization shared with [[Tfidf]]: whitespace-class split of the
    * lowercased text, empty terms dropped. DuckDB replay:
    * `unnest(string_split_regex(lower(text), '\s+')) ... WHERE term <> ''`. */
  private def termStream(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"), explode(split(lower(text), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)

  /** Build the denormalized postings index `(term, df, id, tf, dl)` — one
    * row per (term, document) pair carrying everything serve needs except
    * the corpus constants (which [[corpusStats]] derives from this table).
    */
  def index(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val terms = termStream(docs, id, text)
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("id").agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dl, "id").join(dfreq, "term")
      .select(col("term"), col("df"), col("id"), col("tf"), col("dl"))
  }

  /** One-row corpus stats from the index itself: `__n` = number of indexed
    * documents (≥1 term), `__s` = total token mass Σ dl. Self-contained —
    * a persisted index needs no sidecar file. One row per doc is the
    * (id, dl) pair; `dl` is constant per id so max() is exact. */
  def corpusStats(postings: DataFrame): DataFrame =
    postings.groupBy("id").agg(max(col("dl")).as("__dl"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__s"))

  /** Exact-integer micro-unit BM25 contribution of one posting row given
    * corpus stats columns `__n`/`__s`. The expression SHAPE (literal
    * constants, association order) is part of the contract — the DuckDB
    * oracle replays it verbatim, and IEEE determinism makes the rounded
    * micro-units identical across engines. */
  def scoreMicro(k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") * col("__n") / col("__s")))
    round(idf * sat * 1e6, 0).cast("long")
  }

  /** APPENDABLE index layout — the incremental-maintenance shape: rows
    * `(term, id, tf, dl)` with NO denormalized df (df is corpus-global, so
    * storing it would invalidate every existing row on append). Document
    * frequency is instead derived at serve time from the matched postings
    * alone (the join keeps every row of a queried term, and rows are
    * unique per (term, id) — an exact count, only for the handful of
    * queried terms), and corpus constants come from per-batch partial
    * stats rows summed at serve. Scores are IDENTICAL to the batch-built
    * index. */
  def indexAppendable(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val terms = termStream(docs, id, text)
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("id").agg(count(lit(1)).as("dl"))
    tf.join(dl, "id").select(col("term"), col("id"), col("tf"), col("dl"))
  }

  /** One partial stats row for a batch of appendable postings. */
  def batchStats(postings: DataFrame): DataFrame =
    postings.groupBy("id").agg(max(col("dl")).as("__dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl")).as("dl_sum"))

  /** Serve over an appendable index: `stats` holds per-batch partial rows
    * (n_docs, dl_sum) summed here into the corpus constants. */
  def searchAppendable(postings: DataFrame, stats: DataFrame, queries: DataFrame,
                       qid: Column, qtext: Column, k1: Double = 1.2,
                       b: Double = 0.75, topK: Int = 10): DataFrame = {
    val st = stats.agg(sum(col("n_docs")).as("__n"), sum(col("dl_sum")).as("__s"))
    val qterms = queries
      .select(qid.as("qid"),
        explode(array_distinct(split(lower(qtext), "\\s+"))).as("term"))
      .filter(length(col("term")) > 0)
    val matched0 = postings.join(broadcast(qterms), "term")
    val dfT = matched0.groupBy("qid", "term").agg(count(lit(1)).as("df"))
    val matched = matched0.join(dfT, Seq("qid", "term"))
      .crossJoin(broadcast(st))
      .withColumn("__sc", scoreMicro(k1, b))
      .groupBy("qid", "id")
      .agg(sum(col("__sc")).as("score_micro"))
    graft.functions.TopKAgg.rankTopK(matched,
        group = col("qid"), score = col("score_micro"), id = col("id"), k = topK)
      .select(col("group").as("qid"), col("rk"), col("id"),
        col("score").cast("long").as("score_micro"))
  }

  /** Number of term-hash partitions a persisted index is laid out in. */
  val IndexPartitions: Int = 16

  /** Persist the index partitioned by a term-hash bucket (`__p`), plus the
    * one-row corpus stats as a sidecar — the build-once artifact
    * ([[graft.ext.Similarity]] IVF posture). Serving joins on
    * (`__p`, term) against a broadcast query frame, so DYNAMIC PARTITION
    * PRUNING reads only the matched buckets: at 100 TB a 3-term query
    * touches ≤ 3 of [[IndexPartitions]] directory subtrees, never the
    * corpus-wide posting list. */
  def writeIndex(postings: DataFrame, path: String): Unit = {
    corpusStats(postings).write.parquet(s"$path/stats")
    postings
      .withColumn("__p", pmod(xxhash64(col("term")), lit(IndexPartitions.toLong)))
      .write.partitionBy("__p").parquet(s"$path/postings")
  }

  /** [[search]] against a PERSISTED index: same semantics, same scores —
    * the plan differs (stats come from the sidecar; the postings scan is
    * partition-pruned by the query terms' hash buckets). */
  def searchPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, qid: Column, qtext: Column,
                      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val postings = spark.read.parquet(s"$path/postings")
    val stats = spark.read.parquet(s"$path/stats")
    val qterms = queries
      .select(qid.as("qid"),
        explode(array_distinct(split(lower(qtext), "\\s+"))).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("__p", pmod(xxhash64(col("term")), lit(IndexPartitions.toLong)))
    val matched = postings.join(broadcast(qterms), Seq("__p", "term"))
      .crossJoin(broadcast(stats))
      .withColumn("__sc", scoreMicro(k1, b))
      .groupBy("qid", "id")
      .agg(sum(col("__sc")).as("score_micro"))
    graft.functions.TopKAgg.rankTopK(matched,
        group = col("qid"), score = col("score_micro"), id = col("id"), k = topK)
      .select(col("group").as("qid"), col("rk"), col("id"),
        col("score").cast("long").as("score_micro"))
  }

  /** Serve top-k per query: `(qid, rk, id, score_micro)`, rk 1-based by
    * (score desc, id asc). `queries` is a small frame of (qid, qtext);
    * its distinct terms broadcast into the postings join. Repeated terms
    * in a query are deduplicated (standard bag-of-words-with-binary-query
    * BM25 — query-side tf weighting is a knob real engines also default
    * off for short queries). */
  def search(postings: DataFrame, queries: DataFrame, qid: Column, qtext: Column,
             k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val qterms = queries
      .select(qid.as("qid"),
        explode(array_distinct(split(lower(qtext), "\\s+"))).as("term"))
      .filter(length(col("term")) > 0)
    val matched = postings.join(broadcast(qterms), "term")
      .crossJoin(broadcast(corpusStats(postings)))
      .withColumn("__sc", scoreMicro(k1, b))
      .groupBy("qid", "id")
      .agg(sum(col("__sc")).as("score_micro"))
    graft.functions.TopKAgg.rankTopK(matched,
        group = col("qid"), score = col("score_micro"), id = col("id"), k = topK)
      // the heap buffers scores as double — exact for micro-unit longs
      // below 2^53; surface the contract type again
      .select(col("group").as("qid"), col("rk"), col("id"),
        col("score").cast("long").as("score_micro"))
  }

  /** POSITIONAL postings `(term, id, pos)` — the phrase-query index
    * (Lucene's positions file). Positions index the EMPTY-FILTERED token
    * sequence (0-based), so adjacency means "consecutive real tokens"
    * regardless of whitespace runs. Same build posture as [[index]]: one
    * exploded term stream, written bucket/prefix-pruned by term. */
  def positionalIndex(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("id"),
        posexplode(filter(split(lower(text), "\\s+"), t => length(t) > 0)))
      .select(col("col").as("term"), col("id"), col("pos"))

  /** Exact phrase search: documents containing the consecutive token run
    * `phrase`, with occurrence counts. The classic positional-index plan:
    * each phrase term's postings are fetched by an equi-filter (at 100 TB
    * a pruned read of that term's bucket, never a corpus scan) and the
    * k-term phrase is k−1 equi-joins on `(id, pos − termOffset)` — the
    * anchor position aligns all terms, so candidates never fan out past
    * the rarest term's postings. No regex over raw text, no window. */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val p = positionalIndex(docs, id, text)
    val anchor = p.filter(col("term") === phrase.head).select(col("id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (t, i)) =>
      acc.join(p.filter(col("term") === t)
          .select(col("id"), (col("pos") - i).as("pos")),
        Seq("id", "pos"))
    }
    matched.groupBy("id").agg(count(lit(1)).as("n_occurrences"))
  }
}
