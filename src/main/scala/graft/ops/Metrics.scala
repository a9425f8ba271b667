package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Det._

/** Multi-aggregate hash group-bys (SURVEY §2.7, `data_processing.py:820-912`).
  * Each is a single `groupBy(...).agg(...)` — one shuffle, partial+final
  * hash aggregation with map-side combine. Outputs are rounded to 2 decimals
  * like the reference's `.round(2)`.
  */
object Metrics {

  /** A1-style performance rollup: count / deterministic sum / mean / exact
    * median per key. */
  def performance(df: DataFrame, key: Column, value: Column, dur: Column): DataFrame =
    df.groupBy(key).agg(
      n.as("trip_count"),
      moneySum(value).as("total_value"),
      moneyAvg(value).as("avg_value"),
      round(percentile(value, lit(0.5)), 2).as("median_value"),
      moneyAvg(dur).as("avg_duration"))

  /** A2/A3-style demand: count + sum + mean per bucket. */
  def demand(df: DataFrame, bucket: Column, value: Column): DataFrame =
    df.groupBy(bucket).agg(
      n.as("trip_count"),
      moneySum(value).as("total_value"),
      moneyAvg(value).as("avg_value"))

  /** A5-style multi-key monthly summary. */
  def monthlySummary(df: DataFrame, y: Column, m: Column, value: Column): DataFrame =
    df.groupBy(y.cast("long").as("year"), m.cast("long").as("month")).agg(
      n.as("trip_count"),
      moneySum(value).as("total_value"),
      moneyAvg(value).as("avg_value"))

  /** A6 — sorted distinct values of a column. */
  def distinctSorted(df: DataFrame, c: Column): DataFrame =
    df.select(c).distinct().orderBy(c)

  /** Incremental aggregate MAINTENANCE: combine already-aggregated rollups
    * (yesterday's table + today's delta) into the up-to-date rollup
    * without rescanning raw history — the pattern that keeps a recurring
    * 100 TB ingest's metric tables O(delta) per day instead of O(total).
    * Only decomposable measures merge ((partial-)sums, counts-as-sums,
    * min, max; avg must travel as sum+count and divide at read time).
    * One union + one grouped aggregation; the rollup tables are tiny next
    * to the raw data. */
  def mergeAggregates(parts: Seq[DataFrame], keys: Seq[String],
                      measures: Seq[(String, String)]): DataFrame = {
    require(parts.nonEmpty && measures.nonEmpty)
    val aggs = measures.map {
      case (c, "sum")   => sum(col(c)).as(c)
      case (c, "count") => sum(col(c)).as(c) // counts merge by summing
      case (c, "min")   => min(col(c)).as(c)
      case (c, "max")   => max(col(c)).as(c)
      case (c, how) => throw new IllegalArgumentException(
        s"$c: '$how' is not a decomposable merge (use sum/count/min/max)")
    }
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Order-independent Pearson correlation of two money-like columns per
    * group. Spark's builtin `corr` accumulates doubles, so two runs (or
    * two engines) can disagree in the last ulp — unacceptable for a
    * published data-quality number. Here every sum (Σx, Σy, Σxy, Σx²,
    * Σy²) runs in EXACT fixed-point: values round to integer cents and
    * accumulate as decimal(38,0) (merge-order-free), and only the final
    * closed-form division touches floating point (correctly-rounded ops
    * on identical inputs → bit-identical everywhere). Precision bound:
    * cross-moments stay within 38 digits up to ~1e12 rows of ~1e7-cent
    * values. Rows with a null on either side are excluded (pairwise
    * complete); a zero-variance side yields null, not a NaN. */
  def pearsonExact(df: DataFrame, x: Column, y: Column, groupCols: Seq[Column],
                   as: String = "corr"): DataFrame = {
    val cx = round(x * 100, 0).cast("decimal(38,0)")
    val cy = round(y * 100, 0).cast("decimal(38,0)")
    val agg = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(cx).as("__sx"), sum(cy).as("__sy"), sum(cx * cy).as("__sxy"),
        sum(cx * cx).as("__sxx"), sum(cy * cy).as("__syy"))
    val varX = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val varY = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    agg.withColumn(as,
        when(varX > 0 && varY > 0, round(num / (sqrt(varX) * sqrt(varY)), 6)))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx", "__syy")
  }
}
