package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, sum}

/** INCREMENTAL VIEW MAINTENANCE over a snapshot table's change feed —
  * keep `SELECT dims…, count(*), sum(measure)… GROUP BY dims…` current
  * WITHOUT ever rescanning the table: each CDC version ([[ChangeFeed]])
  * folds into the maintained aggregate as signed deltas
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
  * [[readView]] — keeping the per-version write a SINGLE transactional
  * MERGE instead of a merge-plus-delete pair.
  *
  * Scale posture — the whole point at 100 TB: a direct refresh of the
  * aggregate costs O(table) per cadence; maintenance costs O(changes) +
  * O(view) per version (the delta is change-sized and BROADCAST; the
  * view scan is dim-cardinality-sized, unrelated to table size; the
  * view's own rewrite is [[Snapshots.mergeInto]]-pruned). A feed of
  * point merges into a 100 TB corpus maintains its per-source token
  * accounting for the cost of the points.
  *
  * Exactly-once across crash replays: the view table's manifest is the
  * ledger — each feed version commits under note `ivm-v<N>` and a replay
  * skips noted versions ([[Snapshots.mergeInto]] discipline, same as
  * [[graft.streaming.MergeGate]]). A crash mid-derivation commits
  * nothing and replays cleanly; a crash after the commit skips on note.
  *
  * Contracts: `dims` non-empty and NON-NULL-valued (they key the view's
  * MERGE; coalesce at the source), `measures` numeric, both disjoint
  * from nothing — a dim or measure that IS a source key resolves to the
  * CDC's unsuffixed key column. SUM ignores null measures on both the
  * direct and the incremental path (same SQL semantics), so parity
  * holds. Reference analog: none (north-star extension).
  */
object ViewMaintenance {

  def noteFor(version: Long): String = s"ivm-v$version"

  private def viewCols(dims: Seq[String], measures: Seq[String]): Seq[String] =
    dims ++ ("n_rows" +: measures.map(m => s"sum_$m"))

  /** Catch the view table up with the source's change feed: sync the feed,
    * then fold every unapplied version into `viewTable` (one MERGE each).
    * Returns the feed versions applied this call. */
  def maintain(spark: SparkSession, sourceTable: String, keys: Seq[String],
               dims: Seq[String], measures: Seq[String],
               feedDir: String, viewTable: String): Seq[Long] = {
    require(dims.nonEmpty, "maintain needs at least one dimension column")
    ChangeFeed.sync(spark, sourceTable, keys, feedDir)
    val cur = ChangeFeed.cursor(spark, feedDir)
    val applied = Snapshots.notes(spark, viewTable).toSet
    val pending = (1L to cur).filterNot(v => applied.contains(noteFor(v)))
    pending.foreach { v =>
      val cdc = spark.read.parquet(f"$feedDir/v$v%010d")
      // a source key has no _before/_after split in the CDC shape — it is
      // identical on both sides by definition
      def side(c: String, s: String): Column =
        if (keys.contains(c)) col(c) else col(s"${c}_$s")
      def signed(suffix: String, changes: Seq[String], sign: Long) =
        cdc.filter(col("change").isin(changes: _*))
          .select(dims.map(d => side(d, suffix).as(d)) ++
            measures.map(m => side(m, suffix).as(m)) :+
            lit(sign).as("__sign"): _*)
      val delta = signed("after", Seq("insert", "update"), 1L)
        .unionByName(signed("before", Seq("delete", "update"), -1L))
        .groupBy(dims.map(col): _*)
        .agg(sum(col("__sign")).as("n_rows"),
          measures.map(m => sum(col(m) * col("__sign")).as(s"sum_$m")): _*)
      // merged view rows for the affected groups only: the (big-ish) view
      // never joins more than a broadcast of the change-sized delta.
      // Derived INSIDE the commit loop: readAt resolves the view's live
      // set eagerly, so a lost race must re-derive against the new state.
      def merged() = if (Snapshots.currentVersion(spark, viewTable) == 0L) delta
      else {
        val aggCols = "n_rows" +: measures.map(m => s"sum_$m")
        val affected = Snapshots.readAt(spark, viewTable)
          .join(broadcast(delta.select(dims.map(col): _*)), dims, "left_semi")
          .withColumnsRenamed(aggCols.map(c => c -> s"__st_$c").toMap)
        val outCols: Seq[Column] = dims.map(col) ++ (
          (coalesce(col("__st_n_rows"), lit(0L)) + col("n_rows")).as("n_rows") +:
            measures.map(m =>
              (coalesce(col(s"__st_sum_$m"), lit(0L)) +
                coalesce(col(s"sum_$m"), lit(0L))).as(s"sum_$m")))
        delta.join(affected, dims, "left_outer").select(outCols: _*)
      }
      // two maintainers racing one view (or a replica replay) serialize
      // through the optimistic commit: the loser re-checks the note ledger
      // — the winner may have BEEN this version's apply — and re-derives
      // against the new state otherwise (MergeGate discipline)
      var attempts = 0
      var committed = false
      while (!committed)
        if (Snapshots.notes(spark, viewTable).contains(noteFor(v))) committed = true
        else
          try {
            Snapshots.mergeInto(spark, viewTable,
              merged().select(viewCols(dims, measures).map(col): _*),
              keys = dims, note = Some(noteFor(v)))
            committed = true
          } catch {
            case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
              attempts += 1
          }
    }
    pending
  }

  /** The maintained aggregate — identity (count-zero) groups filtered. */
  def readView(spark: SparkSession, viewTable: String): DataFrame =
    Snapshots.readAt(spark, viewTable).filter(col("n_rows") > 0)
}
