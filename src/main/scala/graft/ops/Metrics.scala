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
}
