package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-window anomaly detection over an event stream: flag the
  * rows whose value deviates from the trailing per-key history by more than
  * a z-score threshold. The reference has nothing stream-shaped, but a
  * continuously-fed pipeline needs exactly this gate (drop/route telemetry
  * spikes before they poison downstream aggregates).
  *
  * Everything is EXACT integer arithmetic — the z-test
  * `(x − μ)² > τ² σ²` is cleared of divisions by multiplying through by
  * `n²`: with `s1 = Σx`, `s2 = Σx²` over the window,
  *
  *   (n·x − s1)² · τden > τnum · (n·s2 − s1²),   τ² = τnum / τden
  *
  * so two engines can agree bit-for-bit (no float mean/stddev whose
  * summation order differs). Caller supplies values pre-scaled to integers
  * (e.g. cents).
  *
  * Plan shape: ONE shuffle on the key, one in-partition sort, and a RANGE
  * window frame that Spark evaluates incrementally (sliding frame, each row
  * enters/leaves once — O(rows), not O(rows × window)). The trailing frame
  * `[t − windowSec, t − 1]` excludes the current instant's peers, so a
  * burst arriving in one second never vouches for itself. Scale-safe: cost
  * is linear per key, skew only where one key dominates (same boundary as
  * any per-key window).
  */
object Anomaly {

  /** Adds `n_win`/`dev2`/`nvar` over the trailing window and keeps only
    * rows with at least `minN` history rows whose scaled deviation clears
    * the threshold. `sec` is an epoch-seconds LONG column, `cents` the
    * integer-scaled value; both must be non-null (filter upstream).
    *
    *   dev2 = (n·x − s1)²      nvar = n·s2 − s1²      flag ⇔
    *   thrDen · dev2 > thrNum · nvar   (threshold z = √(thrNum/thrDen))
    */
  def rollingDeviationFlags(df: DataFrame, key: String, sec: String,
                            cents: String, windowSec: Long, minN: Long,
                            thrNum: Long, thrDen: Long): DataFrame = {
    val win = Window.partitionBy(key).orderBy(sec)
      .rangeBetween(-windowSec, -1L)
    val x = col(cents)
    val withStats = df
      .withColumn("n_win", count(lit(1)).over(win))
      .withColumn("__s1", sum(x).over(win))
      .withColumn("__s2", sum(x * x).over(win))
    withStats
      .withColumn("dev2",
        (col("n_win") * x - col("__s1")) * (col("n_win") * x - col("__s1")))
      .withColumn("nvar",
        col("n_win") * col("__s2") - col("__s1") * col("__s1"))
      .filter(col("n_win") >= minN &&
        col("dev2") * thrDen > col("nvar") * thrNum)
      .drop("__s1", "__s2")
  }
}
