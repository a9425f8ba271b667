package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently-ranked
  * candidate lists — e.g. BM25 lexical top-k fused with embedding-cosine
  * top-k. RRF: fused(d) = Σ_r 1/(K + rank_r(d)) over the rankers that
  * surfaced d (the Cormack/Clarke/Büttcher rank-fusion family; K=60 is
  * the conventional constant).
  *
  * Determinism: each contribution is computed in integer nano-units
  * (`1e9 div (K + rk)`), so the fused score is an exact BIGINT sum —
  * shuffle-order-proof and bit-reproducible in the DuckDB oracle.
  *
  * Scale posture: inputs are each ranker's top-k per query (O(q·k) rows),
  * so fusion is a tiny union + group-by regardless of corpus size — the
  * heavy lifting stays inside the rankers' own bucketed/persisted serve
  * paths (BM25 partition-pruned postings, IVF/PQ bucket scans). The final
  * re-rank runs a window over this already-bounded frame, partitioned by
  * query — no wide state. This is the candidate-generation shape
  * hard-negative mining for embedding training runs at corpus scale:
  * lexical and dense candidates fused, top-k kept per anchor.
  *
  * Reference scope: the reference has no retrieval at all (SURVEY §2.3);
  * this composes the engine's existing rankers (x79 BM25, x05/x18 dense).
  */
object Retrieval {

  /** Fuse ranked lists `(qid, id, rk)` (rk 1-based). Returns
    * `(qid, rk, id, fused_nano, n_lists)`: top-`topK` per query by fused
    * score desc then id asc; `n_lists` = how many rankers surfaced the id. */
  def rrfFuse(ranked: Seq[DataFrame], qid: String, id: String, rk: String,
              kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = ranked.map { df =>
      df.select(col(qid).as("qid"), col(id).as("id"),
        expr(s"1000000000 div (${kConst}L + cast($rk as bigint))").as("__c"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("qid", "id")
      .agg(sum("__c").as("fused_nano"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("qid").orderBy(col("fused_nano").desc, col("id").asc)
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("id"),
        col("fused_nano").cast("long").as("fused_nano"),
        col("n_lists").cast("long").as("n_lists"))
  }
}
