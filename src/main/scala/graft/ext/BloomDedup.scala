package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup against an already-ingested history, accelerated by a
  * Bloom filter over the history's keys (content digests).
  *
  * The plain shape — `new LEFT ANTI JOIN history` — shuffles every new row
  * by key on every ingest. The bloom shape builds a compact filter over the
  * history ONCE (one aggregation pass; the bitset, not the keys, reaches
  * the driver and broadcasts), then:
  *
  *   - rows the bloom says are ABSENT are definitely new (no false
  *     negatives) and pass through with NO join at all;
  *   - only the might-contain candidates — true duplicates plus an fpp
  *     sliver of new rows — proceed, either dropped outright (lossy mode)
  *     or verified with the exact anti-join (exact mode, join input cut to
  *     the candidate sliver).
  *
  * At 100 TB where daily increments are mostly-new, the anti-join's left
  * side shrinks by ~(1 − dup_rate − fpp), and in lossy mode the history is
  * never rescanned at ingest time at all.
  */
object BloomDedup {

  /** Build the history filter: `expectedItems` sizes the bitset (use the
    * history's key count; overestimating wastes memory, underestimating
    * inflates fpp). ~1.2 GB per 1e9 keys at fpp 0.01 — beyond ~1e9 history
    * keys, shard the history by key range and run one bloom per shard. */
  def historyBloom(history: DataFrame, key: String, expectedItems: Long,
                   fpp: Double = 0.01): org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter] = {
    val bf = history.stat.bloomFilter(key, expectedItems, fpp)
    history.sparkSession.sparkContext.broadcast(bf)
  }

  /** EXACT new-minus-history: bit-identical to a plain anti-join, but the
    * join's left side carries only bloom candidates. */
  def antiJoinExact(newDf: DataFrame, history: DataFrame, key: String,
                    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): DataFrame = {
    val might = graft.functions.SketchExprs.mightContain(col(key), bloom)
    val definitelyNew = newDf.filter(!might)
    val verified = newDf.filter(might)
      .join(history.select(col(key)), Seq(key), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** LOSSY new-minus-history: drops every might-contain row without
    * verification — no history scan at ingest. Loses a bounded ~fpp
    * fraction of genuinely-new rows (acceptable when curating an abundant
    * corpus; never acceptable for state/ledger data). */
  def antiJoinLossy(newDf: DataFrame, key: String,
                    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): DataFrame =
    newDf.filter(!graft.functions.SketchExprs.mightContain(col(key), bloom))
}
