package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, greatest, hll_sketch_agg, hll_union, least, lit, max, min, sum, when}

/** INCREMENTAL VIEW MAINTENANCE over a snapshot table's change feed —
  * keep `SELECT dims…, count(*), sum(m)…, min(m), max(m)… GROUP BY dims`
  * current WITHOUT ever rescanning the table: each CDC version
  * ([[ChangeFeed]]) folds into the maintained aggregate as signed deltas
  *
  *   insert → +1 row at (dims_after, measures_after)
  *   delete → −1 row at (dims_before, measures_before)
  *   update → both (so a row MOVING between groups debits one group and
  *            credits the other — the case naive "re-aggregate the upserts"
  *            maintenance gets wrong)
  *
  * because count and sum form a group under addition (the classic
  * delta-propagation rule for distributive aggregates). Groups whose
  * count reaches zero stay stored as identity rows and are filtered by
  * [[readView]] — keeping the catch-up a SINGLE transactional MERGE
  * instead of a merge-plus-delete pair.
  *
  * CATCH-UP IS BATCHED: all pending feed versions fold into ONE
  * transactional MERGE per [[maintain]] call. Signed deltas are additive
  * across versions (the same group algebra that makes per-version folding
  * correct makes their sum correct), so a consumer that lags k versions
  * pays one transaction's fixed cost, not k — the dominant cost of a
  * maintained view at high commit cadence is per-commit overhead, and
  * batching collapses it.
  *
  * MIN/MAX are NOT self-maintainable under deletion (removing the
  * current minimum says nothing about the runner-up), and neither is an
  * APPROX-DISTINCT sketch (`distinct` measures: Datasketches HLL via
  * `hll_sketch_agg` — values cannot be un-added, so ANY deletion of a
  * non-null value dirties the group while inserts fold free as
  * `hll_union`). Both follow the textbook two-path rule: inserts fold for
  * free (`least`/`greatest` with the stored bound), while a batch whose
  * deletions COULD have removed a group's stored bound (a delete at or
  * below the stored min / at or above the stored max — or ANY delete when
  * the group has no stored bound yet, the new-group-within-batch case)
  * marks that group DIRTY and recomputes exactly the dirty groups from
  * the source table AS OF the batch's newest version. The recompute read
  * is ZONE-MAP PRUNED on the dirty groups' own dim value ranges
  * ([[Snapshots.readPrunedRanges]]): when the source commits recorded
  * stats on the dims (`statsCols`), it opens O(files overlapping the
  * dirty dims' ranges); without dim stats it degrades to scanning the
  * live file list, still row-filtered by a broadcast semi-join on the
  * dirty groups. Clean groups never touch the table.
  *
  * Scale posture — the whole point at 100 TB: a direct refresh of the
  * aggregate costs O(table) per cadence; maintenance costs O(changes) +
  * O(view) per catch-up (the delta is change-sized and BROADCAST; the
  * view scan is dim-cardinality-sized, unrelated to table size; the
  * view's own rewrite is [[Snapshots.mergeInto]]-pruned; the dirty-group
  * recompute is file-pruned as above). A feed of point merges into a
  * 100 TB corpus maintains its per-source token accounting for the cost
  * of the points.
  *
  * Exactly-once across crash replays: the view table's manifest is the
  * ledger — the batched commit carries note `ivm-v<N>` for EVERY version
  * it folds, and a replay skips noted versions ([[Snapshots.mergeInto]]
  * discipline, same as [[graft.streaming.MergeGate]]). A crash
  * mid-derivation commits nothing and replays cleanly; a crash after the
  * commit skips on notes.
  *
  * Contracts: `dims` non-empty and NON-NULL-valued (they key the view's
  * MERGE; coalesce at the source), `measures`/`minMax` numeric, a dim or
  * measure that IS a source key resolves to the CDC's unsuffixed key
  * column. SUM/MIN/MAX ignore null measures on both the direct and the
  * incremental path (same SQL semantics), so parity holds. Reference
  * analog: none (north-star extension).
  */
object ViewMaintenance {

  def noteFor(version: Long): String = s"ivm-v$version"

  private def viewCols(dims: Seq[String], measures: Seq[String],
                       minMax: Seq[String], distinct: Seq[String]): Seq[String] =
    dims ++ ("n_rows" +: measures.map(m => s"sum_$m")) ++
      minMax.flatMap(m => Seq(s"min_$m", s"max_$m")) ++
      distinct.map(m => s"hll_$m")

  /** Catch the view table up with the source's change feed: sync the feed,
    * then fold every unapplied version into `viewTable` as ONE batched
    * MERGE ([[applyDeltaBatch]]). Returns the feed versions applied. */
  def maintain(spark: SparkSession, sourceTable: String, keys: Seq[String],
               dims: Seq[String], measures: Seq[String],
               feedDir: String, viewTable: String,
               minMax: Seq[String] = Nil,
               distinct: Seq[String] = Nil): Seq[Long] = {
    require(dims.nonEmpty, "maintain needs at least one dimension column")
    ChangeFeed.sync(spark, sourceTable, keys, feedDir)
    val cur = ChangeFeed.cursor(spark, feedDir)
    val noted = Snapshots.notes(spark, viewTable).toSet
    val pending = (1L to cur).filterNot(v => noted.contains(noteFor(v)))
    if (pending.isEmpty) Seq.empty
    else {
      // the CDC shape is a pure function of the source's recorded schema
      // ([[ChangeFeed.cdcSchema]]), so read the pending dirs under that
      // explicit schema instead of `mergeSchema=true` — schema merging
      // opens every dir's footers and unions them on the driver, O(lagged
      // versions) metadata work per catch-up that the derived schema
      // answers for free (dirs written before a widening commit resolve
      // null-padded, same as the merge)
      val sc = Snapshots.tableSchema(spark, sourceTable)
      val read = sc match {
        case Some(s) => spark.read.schema(ChangeFeed.cdcSchema(s, keys))
        case None    => spark.read.option("mergeSchema", "true")
      }
      applyDeltaBatch(spark, sourceTable, viewTable,
        read.parquet(pending.map(x => f"$feedDir/v$x%010d"): _*),
        keys, dims, measures, minMax, distinct)
    }
  }

  /** Fold ONE batch of CDC rows — any set of whole feed versions, e.g. a
    * streaming micro-batch from [[graft.streaming.CdcStream]] — into the
    * view as one transactional MERGE. Versions already in the note
    * ledger are skipped row-by-row (the exactly-once contract holds
    * across checkpoint replays AND across a batch/stream consumer mix on
    * the same view). Returns the versions applied. */
  def applyDeltaBatch(spark: SparkSession, sourceTable: String,
                      viewTable: String, cdcBatch: DataFrame,
                      keys: Seq[String], dims: Seq[String],
                      measures: Seq[String],
                      minMax: Seq[String] = Nil,
                      distinct: Seq[String] = Nil): Seq[Long] = {
    require(dims.nonEmpty, "applyDeltaBatch needs at least one dimension column")
    val aggNames = ("n_rows" +: measures.map(m => s"sum_$m")) ++
      minMax.flatMap(m => Seq(s"min_$m", s"max_$m")) ++
      distinct.map(m => s"hll_$m")
    // O(#versions in the batch) driver rows — metadata-sized by the
    // feed's own granularity
    val batchVersions = cdcBatch.select(col("version")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (batchVersions.isEmpty) return Seq.empty
    val appliedNow = scala.collection.mutable.ArrayBuffer.empty[Long]
    // two maintainers racing one view (or a replica replay) serialize
    // through the optimistic commit: each attempt re-reads the note
    // ledger — the winner may have applied any subset of the pending
    // versions — and re-derives the batch against the fresh state
    // (MergeGate discipline). One pass through the loop with no racer is
    // the common case: derive once, merge once, ledger covers the batch.
    var attempts = 0
    var done = false
    // change-sized frames materialized per attempt ([[localCheckpoint]])
    // — released before the next attempt / on exit
    val ckpts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def ckpt(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(); ckpts += c; c
    }
    while (!done) try {
      val noted = Snapshots.notes(spark, viewTable).toSet
      val pending = batchVersions.filterNot(v => noted.contains(noteFor(v)))
      if (pending.isEmpty) done = true
      else {
        // the recompute anchor: dirty groups re-derive from the source AS
        // OF the batch's newest version (the replay must not see later
        // source commits)
        val vMax = pending.max
        val cdc = cdcBatch.filter(col("version").isin(pending: _*))
        // a source key has no _before/_after split in the CDC shape — it
        // is identical on both sides by definition
        def side(c: String, s: String): Column =
          if (keys.contains(c)) col(c) else col(s"${c}_$s")
        val valCols = (measures ++ minMax ++ distinct).distinct
        def signed(suffix: String, changes: Seq[String], sign: Long) =
          cdc.filter(col("change").isin(changes: _*))
            .select(dims.map(d => side(d, suffix).as(d)) ++
              valCols.map(m => side(m, suffix).as(m)) :+
              lit(sign).as("__sign"): _*)
        val deltaAggs: Seq[Column] =
          (sum(col("__sign")).as("n_rows") +:
            measures.map(m => sum(col(m) * col("__sign")).as(s"sum_$m"))) ++
            minMax.flatMap(m => Seq(
              min(when(col("__sign") === 1, col(m))).as(s"__ins_min_$m"),
              max(when(col("__sign") === 1, col(m))).as(s"__ins_max_$m"),
              min(when(col("__sign") === -1, col(m))).as(s"__del_min_$m"),
              max(when(col("__sign") === -1, col(m))).as(s"__del_max_$m"))) ++
            distinct.flatMap(m => Seq(
              hll_sketch_agg(when(col("__sign") === 1, col(m))).as(s"__ins_hll_$m"),
              max(when(col("__sign") === -1 && col(m).isNotNull, lit(1L))
                .otherwise(lit(0L))).as(s"__del_any_$m")))
        val delta = signed("after", Seq("insert", "update"), 1L)
          .unionByName(signed("before", Seq("delete", "update"), -1L))
          .groupBy(dims.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)
        // merged view rows for the affected groups only: the (big-ish)
        // view never joins more than a broadcast of the change-sized delta.
        // "Fresh" = no data files AND no recorded schema — not version 0:
        // a catalog-created view ([[graft.sql.GraftProcedures]] create_mv)
        // is born at v1 carrying only its mv.* properties.
        val joined =
          if (Snapshots.liveFiles(spark, viewTable).isEmpty &&
              Snapshots.tableSchema(spark, viewTable).isEmpty)
            aggNames.foldLeft(delta)((df, c) => df.withColumn(s"__st_$c", lit(null)))
          else {
            val affected = Snapshots.readAt(spark, viewTable)
              .join(broadcast(delta.select(dims.map(col): _*)), dims, "left_semi")
              .withColumnsRenamed(aggNames.map(c => c -> s"__st_$c").toMap)
            delta.join(affected, dims, "left_outer")
          }
        val newRows = coalesce(col("__st_n_rows"), lit(0L)) + col("n_rows")
        val baseCols: Seq[Column] = dims.map(col) ++ (
          newRows.as("n_rows") +:
            measures.map(m =>
              (coalesce(col(s"__st_sum_$m"), lit(0L)) +
                coalesce(col(s"sum_$m"), lit(0L))).as(s"sum_$m")))
        val merged: DataFrame =
          if (minMax.isEmpty && distinct.isEmpty) joined.select(baseCols: _*)
          else {
            // the delta pipeline (CDC read → signed union → groupBy →
            // view semi-join → outer join) is consumed by THREE separate
            // actions below (the dirty-group emptiness probe, the dirty
            // bounds agg, and the final merge — which itself evaluates
            // its source 2–3×, [[Snapshots.mergeInto]]): materialize the
            // change-sized `joined` once instead of re-deriving it per
            // action (guide §5 — it is O(affected groups), never table-
            // sized). Unpersisted by the caller-side finally below.
            // a group is DIRTY when a deleted value could have invalidated
            // non-subtractable state: it could have been a stored min/max
            // bound (≤ min or ≥ max — or the group has NO stored bound,
            // the batched insert-then-delete-within-batch case, where the
            // ins-fold alone would keep a value the batch also removed),
            // or ANY deletion under an HLL distinct sketch (values cannot
            // be un-added from a sketch). A group emptied this batch
            // resets to the identity (null bounds / null sketch) without
            // a recompute.
            val dirty = (minMax.map { m =>
              (col(s"__del_min_$m").isNotNull &&
                (col(s"__st_min_$m").isNull ||
                  col(s"__del_min_$m") <= col(s"__st_min_$m"))) ||
                (col(s"__del_max_$m").isNotNull &&
                  (col(s"__st_max_$m").isNull ||
                    col(s"__del_max_$m") >= col(s"__st_max_$m")))
            } ++ distinct.map(m => col(s"__del_any_$m") === 1L))
              .reduce(_ || _) && newRows > 0
            val cleanMm: Seq[Column] = minMax.flatMap(m => Seq(
              when(newRows === 0, lit(null))
                .otherwise(least(col(s"__st_min_$m"), col(s"__ins_min_$m"))).as(s"min_$m"),
              when(newRows === 0, lit(null))
                .otherwise(greatest(col(s"__st_max_$m"), col(s"__ins_max_$m"))).as(s"max_$m"))) ++
              distinct.map { m =>
                val st = col(s"__st_hll_$m"); val ins = col(s"__ins_hll_$m")
                when(newRows === 0, lit(null))
                  .otherwise(when(st.isNull, ins).when(ins.isNull, st)
                    .otherwise(hll_union(st, ins))).as(s"hll_$m")
              }
            val j = ckpt(joined.withColumn("__dirty", dirty))
            val clean = j.filter(!col("__dirty")).select(baseCols ++ cleanMm: _*)
            val dirtyGroups = j.filter(col("__dirty"))
            if (dirtyGroups.isEmpty) clean
            else {
              // recompute ONLY the dirty groups, from the source AS OF the
              // batch's newest version, opening only the files whose zone
              // maps overlap the dirty groups' own dim ranges (dims
              // without recorded stats prune nothing — conservative)
              val boundAggs = dims.flatMap(d => Seq(
                min(col(d)).cast("string").as(s"__lo_$d"),
                max(col(d)).cast("string").as(s"__hi_$d")))
              val b = dirtyGroups.agg(boundAggs.head, boundAggs.tail: _*).first()
              val ranges = dims.zipWithIndex.flatMap { case (d, i) =>
                val lo = b.getString(2 * i); val hi = b.getString(2 * i + 1)
                if (lo == null || hi == null) None else Some((d, lo, hi))
              }
              val recAggs = minMax.flatMap(m =>
                Seq(min(col(m)).as(s"__rec_min_$m"), max(col(m)).as(s"__rec_max_$m"))) ++
                distinct.map(m => hll_sketch_agg(col(m)).as(s"__rec_hll_$m"))
              val rec = Snapshots.readPrunedRanges(spark, sourceTable, ranges, Some(vMax))
                .join(broadcast(dirtyGroups.select(dims.map(col): _*)), dims, "left_semi")
                .groupBy(dims.map(col): _*)
                .agg(recAggs.head, recAggs.tail: _*)
              val recMm: Seq[Column] = minMax.flatMap(m => Seq(
                col(s"__rec_min_$m").as(s"min_$m"), col(s"__rec_max_$m").as(s"max_$m"))) ++
                distinct.map(m => col(s"__rec_hll_$m").as(s"hll_$m"))
              clean.unionByName(
                dirtyGroups.join(broadcast(rec), dims, "left_outer")
                  .select(baseCols ++ recMm: _*))
            }
          }
        try {
          // the merge evaluates its source 2–3× (prune bounds, key-set
          // semi-join, rewrite — [[Snapshots.mergeInto]]); hand it the
          // MATERIALIZED change-sized result instead of the live plan
          Snapshots.mergeInto(spark, viewTable,
            ckpt(merged.select(
              viewCols(dims, measures, minMax, distinct).map(col): _*)),
            keys = dims, extraNotes = pending.map(noteFor))
          appliedNow ++= pending
          done = true
        } catch {
          case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
            attempts += 1
        }
      }
    } finally {
      ckpts.foreach(_.unpersist(blocking = false))
      ckpts.clear()
    }
    appliedNow.toSeq
  }

  /** The maintained aggregate — identity (count-zero) groups filtered. */
  def readView(spark: SparkSession, viewTable: String): DataFrame =
    Snapshots.readAt(spark, viewTable).filter(col("n_rows") > 0)
}
