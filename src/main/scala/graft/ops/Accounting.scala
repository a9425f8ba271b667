package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** C9 — row-count accounting (`data_processing.py:77,92,118,...,202-208`).
  * The reference materializes the frame and calls len() after every
  * cleaning step; the Spark-native shape is `observe()`: metrics ride
  * along with the NEXT action, zero extra passes over the data.
  */
object Accounting {

  /** Attach named observation metrics to a frame; read them from the
    * returned Observation AFTER the next action completes. */
  def observe(df: DataFrame, name: String, metrics: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** The standard cleaning-stage metric set: total rows plus per-column
    * null counts (what the reference logs as "filled X nulls"). */
  def stageCounts(df: DataFrame, stage: String, nullCols: Seq[String]): (DataFrame, Observation) = {
    val metrics = ("rows" -> count(lit(1))) +:
      nullCols.filter(df.columns.contains).map(c =>
        s"nulls_$c" -> sum(when(col(c).isNull, 1L).otherwise(0L)))
    observe(df, stage, metrics: _*)
  }

  /** Removed-rows accounting across a filter: rows_before − rows_after,
    * both observed on the same pass pipeline (before on the input frame,
    * after on the filtered frame). */
  def filterAccounting(df: DataFrame, pred: Column, stage: String): (DataFrame, Observation, Observation) = {
    val (in, before) = observe(df, s"${stage}_before", "rows" -> count(lit(1)))
    val (out, after) = observe(in.filter(pred), s"${stage}_after", "rows" -> count(lit(1)))
    (out, before, after)
  }
}
