package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

/** Gap-based sessionization: batch window shape and the streaming
  * mapGroupsWithState transition function (driven via TestGroupState).
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize._

  private def ev(u: Long, t: String) = (u, java.sql.Timestamp.valueOf(t))

  test("assignSessions splits on gaps > threshold, per key, 0-based") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"), // session 0
      ev(1, "2024-01-01 12:00:00"),                               // session 1 (110 min gap)
      ev(2, "2024-01-01 10:00:00")                                // other key: session 0
    ).toDF("user_id", "ts")
    val out = assignSessions(df, "user_id", "ts", gapSeconds = 3600)
      .select("user_id", "ts", "session_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(out === Set(
      (1L, "2024-01-01 10:00:00.0", 0L), (1L, "2024-01-01 10:10:00.0", 0L),
      (1L, "2024-01-01 12:00:00.0", 1L), (2L, "2024-01-01 10:00:00.0", 0L)))
  }

  test("gap exactly equal to the threshold does NOT split") {
    val df = Seq(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 11:00:00")).toDF("user_id", "ts")
    val out = assignSessions(df, "user_id", "ts", gapSeconds = 3600)
    assert(out.agg(max($"session_id")).first().getLong(0) === 0L)
  }

  test("sessionSummary emits bounds and counts per session") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:30:00"),
      ev(1, "2024-01-01 15:00:00")).toDF("user_id", "ts")
    val out = sessionSummary(df, "user_id", "ts", 3600).orderBy("session_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[java.sql.Timestamp]("session_end").toString === "2024-01-01 10:30:00.0")
    assert(out(1).getAs[Long]("n_events") === 1L)
  }

  test("streaming transition: events merge into open state, timeout closes the session") {
    val gap = 1800L
    // batch 1: two events → state opens, nothing emitted
    val s1 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessionState](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out1 = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"))), s1)
    assert(out1 === None)
    assert(s1.get.n === 2L)

    // batch 2: one more event → state grows
    val s2 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out2 = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"))), s2)
    assert(out2 === None)
    assert(s2.get.n === 3L)

    // timeout fires → session closes with full bounds, state removed
    val s3 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(s2.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out3 = updateSession(gap)(7L, Iterator.empty, s3)
    assert(out3.isDefined)
    assert(out3.get.n_events === 3L)
    assert(out3.get.session_start.toString === "2024-01-01 10:00:00.0")
    assert(out3.get.session_end.toString === "2024-01-01 10:10:00.0")
    assert(!s3.exists)
  }
}
