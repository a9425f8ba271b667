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
}
