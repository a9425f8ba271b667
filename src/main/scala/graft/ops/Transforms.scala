package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column transforms (SURVEY §2.6, `data_processing.py:755-818`).
  * All are narrow projections — no shuffle, fully whole-stage-codegen.
  * Expressed generically; TaxiPipeline binds them to the taxi schema.
  */
object Transforms {

  /** D1 — duration in minutes between two timestamps (µs-exact). */
  def durationMinutes(start: Column, end: Column): Column =
    (unix_micros(end) - unix_micros(start)) / 6.0e7

  /** D2 — speed = distance / hours, clipped to [0, maxV].
    * pandas parity trap (SURVEY §7.5.3): pandas x/0 → inf → clip → maxV
    * (or 0/0 → NaN); Spark x/0 → NULL. Emulate explicitly.
    */
  def clippedSpeed(distance: Column, durationMin: Column, maxV: Double): Column = {
    val hours = durationMin / 60.0
    when(hours === 0 && distance > 0, maxV)
      .when(hours === 0 && distance === 0, Double.NaN)
      .otherwise(least(greatest(distance / hours, lit(0.0)), lit(maxV)))
  }

  /** D4 — full day name ("Monday"…): matches pandas `.dt.day_name()` and
    * DuckDB `dayname()`. */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** D6 — time-of-day bucket; right-closed bins [0,6](6,12](12,18](18,24]
    * with include_lowest — hour 6 is still Night (pandas `pd.cut` parity,
    * SURVEY §7.5.3). */
  def timeOfDay(hour: Column): Column =
    when(hour <= 6, "Night")
      .when(hour <= 12, "Morning")
      .when(hour <= 18, "Afternoon")
      .otherwise("Evening")

  /** D9 — weekend flag. pandas dayofweek Monday=0 ⇒ weekend = {5,6};
    * Spark dayofweek Sunday=1 ⇒ weekend = {1,7}. */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** D10 — value bucketing, right-closed, NO include_lowest: v ≤ first edge
    * → null (pandas parity). `edges` are the interior right edges; the last
    * bucket is open-ended. */
  def segment(v: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == edges.length + 1)
    // v <= lowest bound (0) → null, then right-closed buckets
    val start = when(v <= 0.0, lit(null: String))
    val mid = edges.zip(labels.init).foldLeft(start) { case (acc, (e, l)) => acc.when(v <= e, l) }
    mid.otherwise(labels.last)
  }

  /** D11 — ratio with pandas inf/NaN → 0 semantics. Spark 4 runs ANSI by
    * default (x/0 THROWS, not NULL — SURVEY §7.5.3 predates that default),
    * so the division must be `try_divide`; the coalesce then maps the
    * null-on-zero (pandas inf/NaN) to 0. */
  def safeRatio(num: Column, den: Column, scale: Double = 100.0): Column =
    coalesce(try_divide(num, den) * scale, lit(0.0))

  /** Calendar features D3/D5 in one map. */
  def calendar(ts: Column): Map[String, Column] = Map(
    "hour" -> hour(ts), "month" -> month(ts), "year" -> year(ts),
    "day_of_week" -> dayName(ts))
}
