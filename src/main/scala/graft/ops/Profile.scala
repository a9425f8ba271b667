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
    * Internal aliases are INDEX-based, the unpivot is pure Column API, and
    * input names resolve backtick-quoted — a user column name never
    * reaches a SQL parser and a dotted name is a column, not a struct
    * path, so names with spaces, quotes or dots profile fine. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // df("a.b") parses the unquoted dot as nested-field access; quote the
    // identifier (embedded backticks escape by doubling) to resolve the
    // literal column name
    def c0(c: String) = df(s"`${c.replace("`", "``")}`")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(c0(c).isNull.cast("long")).as(s"__nulls_$i"),
        (if (exact) count_distinct(c0(c)) else approx_count_distinct(c0(c)))
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
