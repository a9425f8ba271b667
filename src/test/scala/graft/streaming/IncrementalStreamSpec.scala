package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured-Streaming incremental drain: the checkpoint gives
  * exactly-once file handling (subsumes the reference's watermark+tracker),
  * and AvailableNow drains the backlog then stops.
  */
class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("drain processes a backlog exactly once across invocations") {
    val root = Files.createTempDirectory("graft_stream_spec").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
      .write.parquet(s"$root/src/batch1")
    val schema = spark.read.parquet(s"$root/src/batch1").schema

    IncrementalStream.drain(spark, s"$root/src", schema,
      s"$root/chk", s"$root/out")(df => df.withColumn("value", col("value") * 2))
    assert(spark.read.parquet(s"$root/out").count() === 2)

    // second drain with no new files: no duplicates
    IncrementalStream.drain(spark, s"$root/src", schema,
      s"$root/chk", s"$root/out")(df => df.withColumn("value", col("value") * 2))
    assert(spark.read.parquet(s"$root/out").count() === 2)

    // late-arriving file is picked up incrementally
    Seq((3L, 30.0)).toDF("id", "value").write.parquet(s"$root/src/batch2")
    IncrementalStream.drain(spark, s"$root/src", schema,
      s"$root/chk", s"$root/out")(df => df.withColumn("value", col("value") * 2))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() === 3)
    assert(out.agg(sum("value")).first().getDouble(0) === 120.0)
  }

  test("foreachBatch upsert state survives a mid-backlog crash + checkpoint restart") {
    // the st09 pattern under failure: crash the drain between batches,
    // resume from the checkpoint, and prove (a) committed batches are NOT
    // re-run, (b) the recovered state — re-derived by LISTING the state
    // root, never from in-memory pointers — equals an uninterrupted run's
    import graft.ops.Dedup
    import org.apache.spark.sql.DataFrame
    val root = Files.createTempDirectory("graft_restart_spec").toString
    val slices = Seq(
      Seq((1L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-01 10:05:00", 2L)),
      Seq((1L, "2024-01-01 11:00:00", 3L), (3L, "2024-01-01 11:05:00", 4L)),
      // slice 2's user-2 row is OLDER — argmax-merge must keep event 2
      Seq((2L, "2024-01-01 09:00:00", 5L), (3L, "2024-01-01 12:00:00", 6L)))
    slices.zipWithIndex.foreach { case (rows, i) =>
      rows.map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
        .toDF("user_id", "ts", "event_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/src/slice$i")
      new java.io.File(s"$root/src/slice$i").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    def latestState(stateRoot: String): Option[String] = {
      val dirs = Option(new java.io.File(stateRoot).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("state_v"))
      if (dirs.isEmpty) None
      else Some(dirs.maxBy(_.getName.stripPrefix("state_v").toLong).getAbsolutePath)
    }
    def drain(stateRoot: String, ckpt: String, failAtBatch: Option[Long],
              seen: scala.collection.mutable.Buffer[Long]): Unit = {
      val q = spark.readStream.schema("user_id LONG, ts TIMESTAMP, event_id LONG")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(s"$root/src")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (failAtBatch.contains(id)) throw new RuntimeException("injected crash")
          seen += id
          val updates = Dedup.latestPerKey(batch,
            Seq(col("user_id")), ord = col("ts"), col("event_id"))
          val merged = latestState(stateRoot) match {
            case Some(prev) => Dedup.latestPerKey(
              spark.read.parquet(prev).unionByName(updates),
              Seq(col("user_id")), ord = col("ts"), col("event_id"))
            case None => updates
          }
          merged.write.mode("overwrite").parquet(s"$stateRoot/state_v$id")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException
          if failAtBatch.isDefined && e.getMessage.contains("injected crash") => ()
      }
    }
    // interrupted run: batch 0 commits, batch 1 crashes before any write
    val seenA = scala.collection.mutable.Buffer.empty[Long]
    drain(s"$root/stateA", s"$root/ckptA", Some(1L), seenA)
    assert(seenA.toSeq === Seq(0L))
    assert(latestState(s"$root/stateA").get.endsWith("state_v0"))
    // resume from the SAME checkpoint: committed batch 0 is skipped,
    // batches 1 and 2 run — exactly-once ACROSS the restart
    drain(s"$root/stateA", s"$root/ckptA", None, seenA)
    assert(seenA.toSeq === Seq(0L, 1L, 2L))
    // uninterrupted reference run
    val seenB = scala.collection.mutable.Buffer.empty[Long]
    drain(s"$root/stateB", s"$root/ckptB", None, seenB)
    assert(seenB.toSeq === Seq(0L, 1L, 2L))
    def state(stateRoot: String) = spark.read.parquet(latestState(stateRoot).get)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = state(s"$root/stateA")
    assert(recovered === state(s"$root/stateB"))
    assert(recovered === Set((1L, 3L), (2L, 2L), (3L, 6L))) // batch argmax
  }

  test("windowedCounts runs as a REAL stream: watermark finalizes windows, late row dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = IncrementalStream.windowedCounts(
      mem.toDF().toDF("ts", "value"), "ts", "1 hour", lateness = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("graft_win")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((t("2024-01-01 10:05:00"), 1.0), (t("2024-01-01 10:50:00"), 2.0))
      q.processAllAvailable()
      // watermark = 10:50 - 30min = 10:20 → window [10,11) still open
      assert(spark.table("graft_win").count() === 0)
      // advance event time far enough to close [10,11); then a LATE row
      // for the closed window must be dropped
      mem.addData((t("2024-01-01 12:00:00"), 4.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 10:10:00"), 8.0)) // late beyond watermark
      q.processAllAvailable()
      val rows = spark.table("graft_win")
        .select(col("window.start").cast("string"), col("n"), col("total_value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSet === Set(("2024-01-01 10:00:00", 2L, 3.0))) // late 8.0 absent
    } finally q.stop()
  }

  test("dedupedStream drops duplicate ids arriving within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val dedup = IncrementalStream.dedupedStream(
      mem.toDF().toDF("id", "ts"), Seq("id"), "ts", lateness = "1 hour")
    val q = dedup.writeStream.format("memory").queryName("graft_dedup")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      mem.addData((1L, t("2024-01-01 10:02:00"))) // dup id within horizon
      q.processAllAvailable()
      assert(spark.table("graft_dedup").count() === 2)
    } finally q.stop()
  }

  test("windowedCounts groups into tumbling event-time windows") {
    val events = Seq(
      ("2024-01-01 10:05:00", 1.0),
      ("2024-01-01 10:55:00", 2.0),
      ("2024-01-01 11:05:00", 4.0)
    ).toDF("ts", "value").select(to_timestamp($"ts").as("ts"), $"value")
    // batch DataFrame through the same plan shape (windowed agg is identical)
    val out = IncrementalStream.windowedCounts(events, "ts", "1 hour")
      .select(col("window.start").cast("string").as("w"), col("n"), col("total_value"))
      .orderBy("w").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getDouble(2) === 3.0)
    assert(out(1).getLong(1) === 1L)
  }
}
