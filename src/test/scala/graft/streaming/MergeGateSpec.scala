package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

class MergeGateSpec extends SparkSpec {
  import spark.implicits._

  /** Two CDC batches over a 2-file keyed table: batch0 updates ids 1-2 and
    * inserts 100; batch1 re-updates id 2 (later batch wins) and inserts
    * 101. */
  private def stage(base: String): String = {
    val src = s"$base/src"
    Seq((1L, "b0-1"), (2L, "b0-2"), (100L, "b0-100")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/slice0")
    Seq((2L, "b1-2"), (101L, "b1-101")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/slice1")
    Seq("slice0", "slice1").zipWithIndex.foreach { case (sl, i) =>
      new java.io.File(s"$src/$sl").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    src
  }

  private def buildTable(table: String): Unit =
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        Seq.tabulate(5)(j => ((i * 5 + j).toLong, s"base-${i * 5 + j}"))
          .toDF("id", "v").coalesce(1),
        table, recordSchema = true, statsCols = Seq("id"))
    }

  private def drain(src: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    val q = MergeGate.start(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(src),
      table, Seq("id"), ckpt, pruneOn = Some("id"))
    q.awaitTermination()
  }

  test("each batch merges as one version; later batches win; inserts land") {
    val base = java.nio.file.Files.createTempDirectory("graft_mg").toString
    val src = stage(base)
    val table = s"$base/tbl"
    buildTable(table)
    drain(src, table, s"$base/ckpt1")
    assert(Snapshots.currentVersion(spark, table) === 4L) // 2 builds + 2 merges
    val now = Snapshots.readAt(spark, table)
    assert(now.count() === 12) // 10 base + 2 inserts
    val m = now.as[(Long, String)].collect().toMap
    assert(m(1L) === "b0-1" && m(2L) === "b1-2") // batch1 overrode batch0's id 2
    assert(m(100L) === "b0-100" && m(101L) === "b1-101")
    assert(m(7L) === "base-7") // untouched key intact
    // after batch0 (version 3) the table shows batch0's view of id 2
    val v3 = Snapshots.readAt(spark, table, Some(3)).as[(Long, String)].collect().toMap
    assert(v3(2L) === "b0-2" && !v3.contains(101L))
  }

  test("full replay against a fresh checkpoint re-merges nothing (notes are the ledger)") {
    val base = java.nio.file.Files.createTempDirectory("graft_mg2").toString
    val src = stage(base)
    val table = s"$base/tbl"
    buildTable(table)
    drain(src, table, s"$base/ckpt1")
    val v = Snapshots.currentVersion(spark, table)
    val files = Snapshots.liveFiles(spark, table)
    drain(src, table, s"$base/ckpt2") // checkpoint lost — same batch ids replay
    assert(Snapshots.currentVersion(spark, table) === v)
    assert(Snapshots.liveFiles(spark, table) === files)
    assert(Snapshots.notes(spark, table) ===
      Seq(MergeGate.batchNote(0), MergeGate.batchNote(1)))
  }

  test("batch key bounds prune: a batch touching one file rewrites only that file") {
    val base = java.nio.file.Files.createTempDirectory("graft_mg3").toString
    val table = s"$base/tbl"
    buildTable(table) // files [0-4] and [5-9], zone maps on id
    val res = Snapshots.mergeInto(spark, table,
      Seq((6L, "upd")).toDF("id", "v"), keys = Seq("id"), pruneOn = Some("id"))
    assert(res.rewritten.size === 1 && res.untouched === 1)
  }
}
