package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based session windows per key. The reference has no
  * session concept (SURVEY §2.10: "session windows: absent"); at training-
  * pipeline scale it's the canonical stateful operator, so both execution
  * shapes are provided:
  *
  *   - batch: lag + cumulative-sum over a per-key window — one shuffle on
  *     the key, SQL-expressible (DuckDB-oracle-checkable);
  *   - streaming: `mapGroupsWithState` with event-time timeout — true
  *     incremental state, emitting sessions as they close.
  */
object Sessionize {

  /** Batch gap-sessionize: assigns each row a `session_id` (0-based per
    * key, in time order); a new session starts when the gap from the
    * previous event exceeds `gapSeconds`. */
  def assignSessions(df: DataFrame, key: String, tsCol: String,
                     gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__newsess",
        when(col("__prev").isNull, 1L)
          .when(unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__newsess")).over(w) - 1L)
      .drop("__prev", "__newsess")
  }

  /** Batch session summary: one row per (key, session) with bounds and
    * event count. */
  def sessionSummary(df: DataFrame, key: String, tsCol: String,
                     gapSeconds: Long): DataFrame =
    assignSessions(df, key, tsCol, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  // ---- streaming variant -------------------------------------------------

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Long)

  /** The per-group state transition (public so TestGroupState can drive it
    * directly in specs). Event-time semantics: the timeout is anchored to
    * the session's last EVENT time, not wall clock, so a backlog replayed
    * under Trigger.AvailableNow closes exactly the sessions the batch
    * variant would — wall-clock pauses between microbatches never split a
    * session. Two cases Spark does NOT handle for us and the function
    * must:
    *
    *   - a group that receives data in the very batch its timer expired is
    *     invoked with `hasTimedOut = false`; if the new events sit beyond
    *     the gap, the stale open session must be closed here, not merged;
    *   - one batch can contain several gap splits for one key (backlog
    *     replay with coarse batches), so the transition emits an ITERATOR
    *     of closed sessions — every segment but the last closes, the last
    *     stays open in state.
    */
  def updateSession(gapSeconds: Long)(user: Long, evts: Iterator[SessionEvent],
                                      state: GroupState[SessionState]): Iterator[ClosedSession] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(ClosedSession(user, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n))
    } else {
      val gapMs = gapSeconds * 1000L
      // fold the sorted event times into gap-delimited segments, seeded
      // with the open session (if any) so a close-then-reopen in one batch
      // resolves here instead of merging across the gap
      val times = evts.map(_.ts.getTime).toArray.sorted
      val seed = state.getOption.toList
      if (times.isEmpty && seed.isEmpty) return Iterator.empty
      val segments = times.foldLeft(seed) {
        case (Nil, t) => SessionState(t, t, 1L) :: Nil
        case (cur :: closed, t) if t - cur.end <= gapMs =>
          SessionState(math.min(cur.start, t), math.max(cur.end, t), cur.n + 1) :: closed
        case (acc, t) => SessionState(t, t, 1L) :: acc
      }.reverse
      val open = segments.last
      state.update(open)
      // close when the watermark passes last-event + gap; the timestamp must
      // sit strictly above the current watermark or Spark rejects it (a
      // just-under-the-wire late event can otherwise land at/below it)
      state.setTimeoutTimestamp(math.max(open.end + gapMs,
        state.getCurrentWatermarkMs() + 1L))
      segments.init.iterator.map(s => ClosedSession(user,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n))
    }

  /** Streaming gap-sessionize via flatMapGroupsWithState with EVENT-TIME
    * timeouts: buffers the open session per user; when the watermark
    * passes the session's last event + `gapSeconds` (or later events prove
    * the gap), the session closes and is emitted (update output mode).
    * `watermarkDelay` is the out-of-order tolerance — events later than
    * that are dropped, exactly the contract a 100 TB backlog replay needs
    * for deterministic output. */
  def streamingSessions(events: Dataset[SessionEvent], gapSeconds: Long,
                        watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(updateSession(gapSeconds))
  }
}
