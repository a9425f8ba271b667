package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation for training-data pipelines: deterministic data mixing
  * (per-group downsampling quotas) and per-group quality top-n. Both are
  * single-pass, shuffle-minimal, and RNG-free — reruns, retries, and
  * cluster resizes produce byte-identical corpora, which is what makes a
  * 100 TB mixing job auditable.
  */
object Curation {

  /** Deterministic stratified downsampling: keep a row iff its 256-way md5
    * bucket ([[TextAnalysis.hashBucket]] over `key`) falls below the
    * group's quota (quota/256 ≈ sampling rate; groups absent from `quotas`
    * get `defaultQuota`). A pure filter — no shuffle, no sampling RNG; the
    * kept set is a stable function of the key, so incremental reruns keep
    * the same rows. */
  def stratifiedSample(df: DataFrame, group: Column, key: Column,
                       quotas: Map[String, Int], defaultQuota: Int = 256): DataFrame = {
    require((defaultQuota +: quotas.values.toSeq).forall(q => q >= 0 && q <= 256),
      "quotas are buckets out of 256")
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(defaultQuota)) {
      case (acc, (g, q)) => when(group === lit(g), lit(q)).otherwise(acc)
    }
    df.filter(TextAnalysis.hashBucket(key) < quota)
  }

  /** Per-group top-n by score (ties → smallest id): the bounded top-k
    * AGGREGATE ([[graft.functions.TopKAgg]]) keeps an O(n) heap per map
    * task and ships ≤ n entries per task through the shuffle — never a
    * per-group window over the group's full candidate set (whose biggest
    * group would otherwise bound the whole stage). Output: (group, rk,
    * id, score), rk 1-based by descending score. */
  def topNPerGroup(df: DataFrame, group: Column, score: Column, id: Column,
                   nTop: Int): DataFrame =
    graft.functions.TopKAgg.rankTopK(df, group, score, id, nTop)

  /** Exact heavy hitters without an exact-everything shuffle: a Misra-Gries
    * sketch ([[graft.functions.FreqAgg]], O(k) state per task) nominates ≤k
    * candidates, then ONE filtered pass counts just those candidates
    * exactly (broadcast semi-join — the candidate set is tiny). Provided
    * `minCount > n/(k+1)` (n = total items), the sketch cannot miss a true
    * heavy hitter, so the output is EXACTLY the items with true count ≥
    * `minCount` — deterministic even though sketch estimates are not.
    * Returns (item, n_occurrences). */
  /** `persistItems`: the verify pass re-reads the item stream; by default
    * it RECOMPUTES the projection (at 100 TB the tokenized stream is larger
    * than the corpus — caching it would spill more than the rescan costs).
    * Set true when the upstream tokenize is expensive relative to the data
    * size (derived/exploded streams at moderate scale) to run both passes
    * off one materialized frame. */
  def heavyHitters(df: DataFrame, item: Column, k: Int, minCount: Long,
                   persistItems: Boolean = false): DataFrame = {
    val items0 = df.select(item.cast("string").as("item"))
    val items =
      if (persistItems)
        items0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else items0
    try {
      // n rides the same aggregation as the sketch (no extra pass) so the
      // exactness precondition is ENFORCED, not just documented: with
      // minCount ≤ n/(k+1) the sketch may evict a true heavy hitter during
      // partial merges and the output would be silently merge-order-dependent
      val agg = items.agg(graft.functions.FreqAgg.freqSketch(col("item"), k).as("__sk"),
        count(col("item")).as("__n")).head()
      val n = agg.getLong(1)
      require(minCount > n / (k + 1).toLong,
        s"minCount=$minCount is not > n/(k+1) = $n/${k + 1}: raise k or minCount " +
          "or the sketch cannot guarantee every true heavy hitter is nominated")
      val cands = agg.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      val out = items.filter(col("item").isin(cands: _*))
        .groupBy("item").agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= minCount)
      if (persistItems) out.localCheckpoint(true) else out
    } finally {
      if (persistItems) items.unpersist(blocking = false)
    }
  }
}
