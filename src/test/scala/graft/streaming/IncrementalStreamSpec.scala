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
