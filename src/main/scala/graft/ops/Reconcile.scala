package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: record-level diff of two versions of a table
  * by key — `added` / `removed` / `changed` / `unchanged` per record. The
  * audit companion of [[Upsert]]: what a recurring ingest must publish so
  * a bad upstream dump (half the records silently vanished) is caught at
  * the gate instead of in a trained model.
  *
  * Shape: one full-outer equi-join on the key — each side shuffles once;
  * comparison is a codegen'd null-safe conjunction over `compareCols`
  * (no digests — exact semantics, and the same `IS NOT DISTINCT FROM`
  * logic is expressible in any SQL engine for cross-checking). Presence
  * is tracked with explicit marker columns, so null keys and null values
  * never masquerade as absence. At 100 TB, partition both snapshots the
  * same way and the join co-locates; the non-`unchanged` slice is
  * normally tiny and broadcast-friendly downstream.
  */
object Reconcile {

  /** Row-level diff: (keys…, status). `compareCols` define record
    * equality; columns outside keys ∪ compareCols are ignored. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val b = before.select((keys ++ compareCols).map(c => col(c).as(s"__b_$c"))
      :+ lit(1).as("__b_present"): _*)
    val a = after.select((keys ++ compareCols).map(c => col(c).as(s"__a_$c"))
      :+ lit(1).as("__a_present"): _*)
    val keyEq = keys.map(c => col(s"__b_$c") <=> col(s"__a_$c")).reduce(_ && _)
    val same = compareCols.map(c => col(s"__b_$c") <=> col(s"__a_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    b.join(a, keyEq, "full_outer")
      .withColumn("status",
        when(col("__a_present").isNull, "removed")
          .when(col("__b_present").isNull, "added")
          .when(!same, "changed")
          .otherwise("unchanged"))
      .select(keys.map(c => coalesce(col(s"__b_$c"), col(s"__a_$c")).as(c))
        :+ col("status"): _*)
  }

  /** The publishable summary: (status, n_rows). */
  def diffSummary(before: DataFrame, after: DataFrame, keys: Seq[String],
                  compareCols: Seq[String]): DataFrame =
    diff(before, after, keys, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n_rows"))
}
