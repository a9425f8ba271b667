package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the per-column accounting a pipeline publishes
  * before anyone trains on a new dump: row count, null count, distinct
  * count per column, in ONE aggregation job (the naive loop runs a scan
  * per column; at 100 TB that is #columns full reads).
  *
  * Exact distincts plan through Catalyst's Expand (one shuffle carrying
  * #cols replicas of the distinct-relevant columns); at very large scale
  * set `exact = false` for HyperLogLog (`approx_count_distinct`, one
  * ordinary partial agg, ~2% error) — same output shape.
  */
object Profile {

  /** Long-format profile: (column, n_rows, n_nulls, n_distinct), one row
    * per requested column (nulls excluded from distinct, SQL semantics). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__dist_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __nulls_$c, __dist_$c").mkString(", ")
    row.selectExpr(s"stack(${cols.size}, $stacked) as (column, n_nulls, n_distinct)",
        "__n as n_rows")
      .select(col("column"), col("n_rows"), col("n_nulls"), col("n_distinct"))
  }
}
