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
    def wm(ms: Long) = org.apache.spark.api.java.Optional.of(ms)
    // batch 1: two events → state opens, timeout anchored to last event + gap
    val s1 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessionState](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = wm(0L), hasTimedOut = false)
    val out1 = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"))), s1)
    assert(out1.isEmpty)
    assert(s1.get.n === 2L)
    assert(s1.getTimeoutTimestampMs.get ===
      java.sql.Timestamp.valueOf("2024-01-01 10:05:00").getTime + gap * 1000)

    // batch 2: one more event → state grows, timeout advances with it
    val s2 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = wm(java.sql.Timestamp.valueOf("2024-01-01 10:05:00").getTime), hasTimedOut = false)
    val out2 = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"))), s2)
    assert(out2.isEmpty)
    assert(s2.get.n === 3L)
    assert(s2.getTimeoutTimestampMs.get ===
      java.sql.Timestamp.valueOf("2024-01-01 10:10:00").getTime + gap * 1000)

    // watermark passes end+gap → timeout fires → session closes, state removed
    val s3 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(s2.get), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = wm(java.sql.Timestamp.valueOf("2024-01-01 11:00:00").getTime), hasTimedOut = true)
    val out3 = updateSession(gap)(7L, Iterator.empty, s3).toList
    assert(out3.length === 1)
    assert(out3.head.n_events === 3L)
    assert(out3.head.session_start.toString === "2024-01-01 10:00:00.0")
    assert(out3.head.session_end.toString === "2024-01-01 10:10:00.0")
    assert(!s3.exists)
  }

  test("data arriving in the timed-out batch closes the stale session instead of merging") {
    // the hasTimedOut=false path must split on the gap itself: one batch
    // delivers an event far beyond the open session AND another split
    val gap = 1800L
    val open = SessionState(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime,
      java.sql.Timestamp.valueOf("2024-01-01 10:20:00").getTime, 3L)
    val s = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(open),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(
        java.sql.Timestamp.valueOf("2024-01-01 11:30:00").getTime),
      hasTimedOut = false)
    val out = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 12:00:00")),
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 14:00:00"))), s).toList
    // closed: the stale 10:00-10:20 session AND the singleton 12:00 session
    assert(out.map(c => (c.session_start.toString, c.session_end.toString, c.n_events)) ===
      List(("2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 3L),
           ("2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)))
    // open state: the 14:00 singleton, timer re-anchored to its end + gap
    assert(s.get === SessionState(
      java.sql.Timestamp.valueOf("2024-01-01 14:00:00").getTime,
      java.sql.Timestamp.valueOf("2024-01-01 14:00:00").getTime, 1L))
    assert(s.getTimeoutTimestampMs.get ===
      java.sql.Timestamp.valueOf("2024-01-01 14:00:00").getTime + gap * 1000)
  }

  test("a late event at/below the watermark never sets an invalid timeout timestamp") {
    // end+gap can land at or below the watermark (late-but-admitted event);
    // the transition must clamp to watermark+1 instead of throwing
    val gap = 60L
    val wmMs = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val s = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty[SessionState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(wmMs),
      hasTimedOut = false)
    val out = updateSession(gap)(7L, Iterator(
      SessionEvent(7, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))), s)
    assert(out.isEmpty)
    assert(s.getTimeoutTimestampMs.get === wmMs + 1)
  }

  test("AvailableNow backlog replay reproduces the batch sessions exactly") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_replay").toFile
    try {
      // three users, gaps straddling the 30-min threshold, split across
      // files replayed one per microbatch; two far-future sentinels at the
      // tail push the watermark past every real session's end+gap while a
      // data batch is still running (timers fire against the PREVIOUS
      // batch's watermark, so one sentinel alone would need a trailing
      // no-data batch)
      val files = Seq(
        Seq(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:10:00"), ev(2, "2024-01-01 10:05:00")),
        Seq(ev(1, "2024-01-01 10:20:00"), ev(2, "2024-01-01 11:30:00")),
        Seq(ev(1, "2024-01-01 12:00:00"), ev(3, "2024-01-01 12:15:00")),
        Seq(ev(-1, "2024-06-01 00:00:00")),
        Seq(ev(-1, "2024-06-02 00:00:00")))
      files.zipWithIndex.foreach { case (rows, i) =>
        // file-source order is mtime-based; pin each append to its own tick
        val before = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
        rows.toDF("user_id", "ts").coalesce(1)
          .write.mode("append").parquet(dir.getAbsolutePath)
        dir.listFiles().filter(f => f.getName.endsWith(".parquet") && !before(f.getName))
          .foreach(_.setLastModified(1700000000000L + i * 60000L))
      }
      val all = files.flatten.filter(_._1 >= 0).toDF("user_id", "ts")
      val want = sessionSummary(all, "user_id", "ts", 1800)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet

      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.getAbsolutePath)
        .as[SessionEvent]
      val q = streamingSessions(stream, gapSeconds = 1800)
        .writeStream.format("memory").queryName("sess_replay")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("sess_replay").filter($"user_id" >= 0)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
      assert(got === want, s"streaming replay diverged from batch sessions:\n got=$got\nwant=$want")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
