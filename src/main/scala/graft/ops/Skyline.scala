package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the (x, y) pairs not dominated by any
  * other — minimize x, maximize y. A pair is dominated iff some other pair
  * is ≤ in x and ≥ in y with at least one strict; exact duplicates collapse
  * into one frontier row carrying their multiplicity.
  *
  * The naive formulation is the quadratic NOT EXISTS self-join (that is the
  * oracle). The scale path is the classic sweep: in ascending-x order a
  * pair survives iff its y strictly exceeds every earlier pair's y — a
  * running max. Realized distributedly:
  *
  *   1. `groupBy(x, y) → n` (one shuffle, map-side combine) collapses data
  *      rows to distinct pairs;
  *   2. per x keep only the max-y pair (same-x smaller-y rows are
  *      strictly dominated) — a pairs-sized agg;
  *   3. the EXCLUSIVE running max of y in x order via the two-phase
  *      bucketed pattern (quantile buckets on x, per-bucket window, a
  *      ≤buckets-row prefix over bucket maxima broadcast back) — the same
  *      shape as [[PrefixSum]], never a single-partition global window.
  *
  * Cost: two shuffles over DISTINCT PAIRS (not rows) + one tiny broadcast.
  * Output is frontier-sized (≤ distinct x values).
  */
object Skyline {

  /** Frontier of (`x` minimized, `y` maximized) as columns `x, y, n`
    * (`n` = input rows at exactly that pair). Null pairs are excluded —
    * null has no place in a dominance order. */
  def frontierMinXMaxY(df: DataFrame, x: Column, y: Column,
                       buckets: Int = 64): DataFrame = {
    val pairs = df.select(x.as("x"), y.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
    // per x, only the greatest y can survive (struct max: y unique per
    // (x, y) group, so the lexicographic tie on n never engages)
    val perX = pairs.groupBy("x").agg(max(struct(col("y"), col("n"))).as("m"))
      .select(col("x"), col("m.y").as("y"), col("m.n").as("n"))
    // two-phase exclusive prefix max over ascending x (one row per x, so
    // bucket order = x order and the within-bucket sort is a total order);
    // quantile boundaries keep buckets balanced under clustered x
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else perX.stat.approxQuantile("x", probs, 0.001).distinct.sorted
    val bkt =
      if (bounds.isEmpty) lit(0)
      else graft.functions.ArrayExprs.lowerBoundCount(
        col("x").cast("double"), typedLit(bounds.toSeq))
    val withB = perX.withColumn("__bkt", bkt)
    val bucketPrefix = withB.groupBy("__bkt").agg(max(col("y")).as("__bm"))
      .withColumn("__pm", max(col("__bm")).over(
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__bkt", "__pm")
    val local = Window.partitionBy("__bkt").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(bucketPrefix), "__bkt")
      .withColumn("__prevMax", greatest(
        coalesce(max(col("y")).over(local), lit(Long.MinValue)),
        coalesce(col("__pm"), lit(Long.MinValue))))
      .filter(col("y") > col("__prevMax"))
      .select("x", "y", "n")
  }
}
