package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums: the global running total in key order WITHOUT
  * the single-partition global window (a `Window.orderBy` with no
  * `partitionBy` funnels every row through one task — the classic Spark
  * scale trap, fine at sf0.01 and fatal at 100 TB).
  *
  * Two-phase formulation: rows land in `buckets` contiguous key ranges
  * (equal width over [min, max] — monotone in the key, so bucket order IS
  * key order); phase 1 cumsums within each bucket in parallel; phase 2 adds
  * each bucket's starting offset, computed from the per-bucket totals. The
  * only unpartitioned window runs over that ≤`buckets`-row frame, never
  * over data rows. Cost: one tiny min/max agg, one shuffle by bucket, one
  * ≤`buckets`-row agg, one broadcast join.
  */
object PrefixSum {

  /** Adds `out` = the EXCLUSIVE running total of `value` in ascending
    * `key` order (first row gets 0). `key` must be unique (it is the total
    * order) and fit in a long; `value` is summed as long. Equal-width
    * buckets assume ids without extreme clustering — pass a larger
    * `buckets` for skewed key spaces. */
  def exclusivePrefixSum(df: DataFrame, key: String, value: String, out: String,
                         buckets: Int = 256): DataFrame =
    exclusivePrefixSumMulti(df, Seq(key), value, out, buckets)

  /** [[exclusivePrefixSum]] under a LEXICOGRAPHIC total order over `keys`
    * (ascending, nulls excluded). Only the LEADING key is range-bucketed —
    * rows sharing a leading-key value always land in the same bucket, so
    * the within-bucket window over the full key list still realizes the
    * global order; trailing keys only break ties and need no long range.
    * (This is why a composite `k1 × 2^b + k2` packing is never needed —
    * packing overflows the moment the tie-breaker's range grows, e.g.
    * replica-shifted ids at large SF.) `keys` together must be unique. */
  def exclusivePrefixSumMulti(df: DataFrame, keys: Seq[String], value: String,
                              out: String, buckets: Int = 256): DataFrame = {
    require(keys.nonEmpty, "need at least one order key")
    val key = keys.head
    // a null key has no place in a total order: unfiltered it would land in
    // a null bucket whose total inflates every real bucket's offset while
    // the row itself vanishes in the equi-join — exclude it explicitly
    val rows = df.filter(keys.map(k => col(k).isNotNull).reduce(_ && _))
    // QUANTILE bucket boundaries, not equal-width: a concentrated key
    // distribution (e.g. LM scores, where most of the corpus shares a
    // narrow score band under a long outlier tail) puts nearly all rows
    // into one equal-width bucket, and that bucket's window serializes —
    // the sf100 curve caught exactly this (x74 at 26× for 10×). Any
    // MONOTONE bucketing yields identical output (equal keys share a
    // bucket, bucket order = key order), so the approximate quantile
    // sketch's placement jitter is load-balancing detail, never a
    // correctness input. The double cast is monotone too — precision loss
    // can only merge adjacent buckets.
    // buckets=1 means one interior boundary list of length zero — and an
    // empty input yields an empty sketch; both are "single bucket", NOT a
    // reason to zero anything (approxQuantile NPEs on an empty probability
    // array and returns an empty result on an empty frame)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val boundaries =
      if (probs.isEmpty) Array.empty[Double]
      else rows.stat.approxQuantile(key, probs, 0.001).distinct.sorted
    val bkt =
      if (boundaries.isEmpty) lit(0)
      else graft.functions.ArrayExprs.lowerBoundCount(col(key).cast("double"),
        typedLit(boundaries.toSeq))
    val withB = rows.withColumn("__bkt", bkt)
    val offsets = withB.groupBy("__bkt").agg(sum(col(value).cast("long")).as("__tot"))
      .withColumn("__off", coalesce(
        sum(col("__tot")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bkt"), col("__off"))
    val local = Window.partitionBy("__bkt").orderBy(keys.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), "__bkt")
      .withColumn(out,
        coalesce(sum(col(value).cast("long")).over(local), lit(0L)) + col("__off"))
      .drop("__bkt", "__off")
  }
}
