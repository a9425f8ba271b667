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
    * per requested column (nulls excluded from distinct, SQL semantics).
    * Internal aliases are INDEX-based and the unpivot is pure Column API —
    * a user column name never reaches a SQL parser, so names with spaces,
    * quotes or dots profile fine. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(df(c).isNull.cast("long")).as(s"__nulls_$i"),
        (if (exact) count_distinct(df(c)) else approx_count_distinct(df(c)))
          .as(s"__dist_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          col(s"__nulls_$i").as("n_nulls"), col(s"__dist_$i").cast("long").as("n_distinct"))
      }: _*)).as("__e"))
      .select(col("__e.column"), col("__e.n_rows"), col("__e.n_nulls"), col("__e.n_distinct"))
  }
}
