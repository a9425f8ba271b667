package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.4) plus the set-membership anti-join
  * (§2.3 J1).
  */
object Dedup {

  /** DD1 — argmax dedup (`data_processing.py:212-224`): per `keys`, keep the
    * single row maximizing `ord` (ties broken by `tieBreak` for
    * determinism — the reference iterates dict-ordered, we pin an explicit
    * total order). One shuffle on `keys`; whole-stage-codegen window.
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ord: Column, tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy((ord.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** DD2 — exact full-row dedup (`DP:116-121`); null-safe like pandas
    * `drop_duplicates`. Keeps an arbitrary row of each duplicate class
    * (SURVEY §7.5.8) — invisible for full-row dedup.
    */
  def exact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** DD2 keyed variant with deterministic retention: keep min(`order`) row. */
  def exactByKey(df: DataFrame, keys: Seq[Column], keep: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(keep.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J1 — idempotency anti-join (`DP:342-345`): rows of `left` whose key has
    * no match in `right`. `right` is auto-broadcast when small; force it for
    * the tracker-sized case.
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column, broadcastRight: Boolean = true): DataFrame =
    left.join(if (broadcastRight) broadcast(right) else right, cond, "left_anti")

  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")
}
