package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

class SnapshotIngestSpec extends SparkSpec {
  import spark.implicits._

  private def stage(base: String): String = {
    val src = s"$base/src"
    Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L), (5L, 9L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/slice0")
    Seq((6L, 1L), (7L, 2L), (8L, 3L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/slice1")
    Seq("slice0", "slice1").zipWithIndex.foreach { case (sl, i) =>
      new java.io.File(s"$src/$sl").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    src
  }

  private def drain(src: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    val q = SnapshotIngest.start(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(src),
      table, ckpt)
    q.awaitTermination()
  }

  test("each micro-batch commits one version; time travel spans the ingest") {
    val base = java.nio.file.Files.createTempDirectory("graft_si").toString
    val src = stage(base)
    val table = s"$base/tbl"
    drain(src, table, s"$base/ckpt1")
    assert(Snapshots.currentVersion(spark, table) === 2L)
    assert(Snapshots.readAt(spark, table, Some(1)).count() === 5L)
    assert(Snapshots.readAt(spark, table, Some(2)).count() === 8L)
    assert(Snapshots.readAt(spark, table).select("id").as[Long].collect().toSet
      === (1L to 8L).toSet)
  }

  test("full replay against a fresh checkpoint re-commits nothing (manifest is the ledger)") {
    val base = java.nio.file.Files.createTempDirectory("graft_si2").toString
    val src = stage(base)
    val table = s"$base/tbl"
    drain(src, table, s"$base/ckpt1")
    val v = Snapshots.currentVersion(spark, table)
    val files = Snapshots.liveFiles(spark, table)
    // checkpoint lost entirely — every batch replays with the same ids
    drain(src, table, s"$base/ckpt2")
    assert(Snapshots.currentVersion(spark, table) === v)
    assert(Snapshots.liveFiles(spark, table) === files)
  }

  test("a half-written batch dir from a crashed attempt is overwritten cleanly") {
    val base = java.nio.file.Files.createTempDirectory("graft_si3").toString
    val src = stage(base)
    val table = s"$base/tbl"
    // writer crashed after data write, before commit: stale bytes in batch0's dir
    Seq((99L, 99L)).toDF("id", "v").write
      .parquet(SnapshotIngest.batchDir(table, 0))
    drain(src, table, s"$base/ckpt1")
    assert(Snapshots.readAt(spark, table).select("id").as[Long].collect().toSet
      === (1L to 8L).toSet)
  }
}
