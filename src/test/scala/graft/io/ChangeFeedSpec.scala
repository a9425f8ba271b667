package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ChangeFeed: per-version CDC materialization with an exactly-once
  * cursor — contiguous delta dirs, no-op when current, crash-replay
  * overwrite idempotence (lost cursor re-materializes identical
  * content), and merge-on-read deletes surfacing as dv-only diffs.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_cf").toString

  private def mkTable(root: String): String = {
    val t = s"$root/tbl"
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("id", "v").coalesce(1), t,
      recordSchema = true)
    Snapshots.commitAppend(Seq((3L, 30L)).toDF("id", "v").coalesce(1), t,
      recordSchema = true)
    t
  }

  test("sync materializes one dir per version; second sync is a no-op") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === Seq(1L, 2L))
    assert(ChangeFeed.cursor(spark, feed) === 2L)
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === Seq.empty)
    val rows = ChangeFeed.read(spark, feed)
      .select("version", "id", "change").as[(Long, Long, String)].collect().toSet
    assert(rows === Set((1L, 1L, "insert"), (2L, 3L, "insert"), (1L, 2L, "insert")))
  }

  test("a deeply lagging consumer catches up in one sync (concurrent derivation)") {
    val root = tmp()
    val t = s"$root/tbl"
    // 12 pending versions — well past the derivation pool size, so the
    // concurrent path runs with queueing; every dir must land with its
    // exact per-version diff, in version order, before the cursor moves
    (1 to 12).foreach(i =>
      Snapshots.commitAppend(Seq((i.toLong, i * 10L)).toDF("id", "v").coalesce(1),
        t, recordSchema = true))
    val feed = s"$root/feed"
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === (1L to 12L))
    assert(ChangeFeed.cursor(spark, feed) === 12L)
    val all = ChangeFeed.read(spark, feed)
      .select("id", "change", "version").as[(Long, String, Long)]
      .collect().toSet
    assert(all === (1 to 12).map(i => (i.toLong, "insert", i.toLong)).toSet)
  }

  test("new commits extend the feed from the cursor, old dirs untouched") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    ChangeFeed.sync(spark, t, Seq("id"), feed)
    Snapshots.mergeInto(spark, t, Seq((2L, 200L)).toDF("id", "v"), keys = Seq("id"))
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === Seq(3L))
    val v3 = ChangeFeed.read(spark, feed).filter($"version" === 3L)
      .select("id", "change", "v_before", "v_after")
      .as[(Long, String, Option[Long], Option[Long])].collect().toSeq
    assert(v3 === Seq((2L, "update", Some(20L), Some(200L))))
  }

  test("crash replay: a lost cursor re-materializes identical content (overwrite)") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    ChangeFeed.sync(spark, t, Seq("id"), feed)
    val before = ChangeFeed.read(spark, feed)
      .select("version", "id", "change").as[(Long, Long, String)].collect().toSet
    // simulate a crash after data write, before cursor advance
    new java.io.File(s"$feed/_cursor").delete()
    assert(ChangeFeed.cursor(spark, feed) === 0L)
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === Seq(1L, 2L)) // replays
    val after = ChangeFeed.read(spark, feed)
      .select("version", "id", "change").as[(Long, Long, String)].collect().toSet
    assert(after === before)
  }

  test("read is cursor-scoped: unacknowledged dirs are invisible; empty feed rejects") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    // nothing acknowledged yet → loud error, not a scan of whatever's on disk
    intercept[IllegalArgumentException] { ChangeFeed.read(spark, feed) }
    ChangeFeed.sync(spark, t, Seq("id"), feed)
    // simulate a crashed/racing sync: a v3 dir exists but its cursor
    // advance never landed — the feed must not surface it
    Snapshots.mergeInto(spark, t, Seq((2L, 200L)).toDF("id", "v"), keys = Seq("id"))
    Snapshots.rowDiff(spark, t, 2, 3, Seq("id"))
      .withColumn("version", lit(3L))
      .write.mode("overwrite").parquet(f"$feed/v${3L}%010d")
    assert(ChangeFeed.read(spark, feed).agg(max("version")).as[Long].head() === 2L)
    // the next sync acknowledges it (idempotent overwrite) and it appears
    assert(ChangeFeed.sync(spark, t, Seq("id"), feed) === Seq(3L))
    assert(ChangeFeed.read(spark, feed).agg(max("version")).as[Long].head() === 3L)
  }

  test("readOrEmpty: an early-polling consumer gets an empty typed frame at cursor 0") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    val early = ChangeFeed.readOrEmpty(spark, t, Seq("id"), feed)
    assert(early.isEmpty)
    // the empty frame already carries the CDC shape the synced feed will have
    assert(early.columns.toSeq ===
      Seq("id", "change", "v_before", "v_after", "version"))
    ChangeFeed.sync(spark, t, Seq("id"), feed)
    val synced = ChangeFeed.readOrEmpty(spark, t, Seq("id"), feed)
    assert(synced.columns.toSeq === early.columns.toSeq)
    assert(early.schema.fields.map(f => f.name -> f.dataType).toSeq ===
      synced.schema.fields.map(f => f.name -> f.dataType).toSeq)
    assert(synced.count() === 3L)
  }

  test("a merge-on-read delete surfaces as a dv-only diff version") {
    val root = tmp()
    val t = mkTable(root)
    val feed = s"$root/feed"
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    ChangeFeed.sync(spark, t, Seq("id"), feed)
    val v3 = ChangeFeed.read(spark, feed).filter($"version" === 3L)
      .select("id", "change").as[(Long, String)].collect().toSeq
    assert(v3 === Seq((1L, "delete")))
  }
}
