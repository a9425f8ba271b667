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
    * directly in specs): merge incoming events into the open session, or
    * close and emit it when the gap timeout fires. */
  def updateSession(gapSeconds: Long)(user: Long, evts: Iterator[SessionEvent],
                                      state: GroupState[SessionState]): Option[ClosedSession] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Some(ClosedSession(user, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n))
    } else {
      val times = evts.map(_.ts.getTime).toSeq
      val merged = state.getOption match {
        case Some(s) => SessionState(math.min(s.start, times.min),
          math.max(s.end, times.max), s.n + times.size)
        case None => SessionState(times.min, times.max, times.size.toLong)
      }
      state.update(merged)
      state.setTimeoutDuration(gapSeconds * 1000)
      None
    }

  /** Streaming gap-sessionize via mapGroupsWithState: buffers the open
    * session per user; when the processing-time timeout fires (no events
    * for `gapSeconds`), the session closes and is emitted. Append-mode
    * compatible. */
  def streamingSessions(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Option[ClosedSession]](
        GroupStateTimeout.ProcessingTimeTimeout)(updateSession(gapSeconds))
      .flatMap(_.toSeq)
  }
}
