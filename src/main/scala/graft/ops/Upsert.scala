package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD1 upsert — the `MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED
  * INSERT` of warehouse SQL, as a pure DataFrame computation: every target
  * row whose key appears in `updates` is replaced by the update row, keys
  * absent from the target are inserted, everything else survives untouched.
  *
  * Shape: updates ∪ (target ANTI-JOIN update-keys). The incremental-ingest
  * case (daily update batch ≪ accumulated target) broadcasts the update
  * KEY SET — the target is never shuffled, only streamed through a
  * broadcast anti-join. Set `broadcastKeys = false` when the update batch
  * itself is huge; the join then falls back to a shuffle anti-join on the
  * key.
  *
  * At 100 TB the companion write matters as much as the compute: pair with
  * dynamic partition overwrite ([[graft.io.Layout]]) so only partitions
  * containing updated keys rewrite, not the whole table.
  *
  * Contract: both frames share a schema (any column order); `updates` is
  * key-unique (duplicate update keys pass through — ANSI MERGE would
  * error; dedupe upstream with [[Dedup.exactByKey]]). Null update keys
  * never match a target row (SQL join semantics) and arrive as inserts.
  */
object Upsert {

  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
            broadcastKeys: Boolean = true): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: target ${target.columns.sorted.mkString(",")} vs " +
        s"updates ${updates.columns.sorted.mkString(",")}")
    val keySet = updates.select(keys.map(col): _*)
    val survivors = target.join(
      if (broadcastKeys) broadcast(keySet) else keySet, keys, "left_anti")
    updates.unionByName(survivors)
  }
}
