package graft.streaming

import graft.SparkSpec
import graft.ext.Sketches
import graft.io.Snapshots
import org.apache.spark.sql.functions._

class SketchIngestSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch is a no-op: the manifest is the idempotence ledger") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_replay").toString
    val table = s"$tmp/sketch"
    val part = Sketches.countMin(Seq("x", "y", "x").toDF("w"), col("w"),
      depth = 2, width = 8)
    Snapshots.commitBatchOnce(spark, table, 0L, part)
    val v1 = Snapshots.currentVersion(spark, table)
    // checkpoint replay re-delivers batch 0 — must not double-count
    Snapshots.commitBatchOnce(spark, table, 0L, part)
    assert(Snapshots.currentVersion(spark, table) === v1)
    val est = SketchIngest.estimate(spark, table, Seq("x").toDF("t"), col("t"),
      depth = 2, width = 8).as[(String, Long)].collect().toMap
    assert(est("x") === 2L)
  }

  test("merged serve equals a batch build over the union of batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_merge").toString
    val table = s"$tmp/sketch"
    val a = Seq.fill(5)("p") ++ Seq.fill(2)("q")
    val b = Seq.fill(3)("p") ++ Seq.fill(7)("r")
    Snapshots.commitBatchOnce(spark, table, 0L,
      Sketches.countMin(a.toDF("w"), col("w")))
    Snapshots.commitBatchOnce(spark, table, 1L,
      Sketches.countMin(b.toDF("w"), col("w")))
    val served = SketchIngest.sketch(spark, table)
      .as[(Long, Long, Long)].collect().toSet
    val batch = Sketches.countMin((a ++ b).toDF("w"), col("w"))
      .as[(Long, Long, Long)].collect().toSet
    assert(served === batch)
    // time travel: the sketch as of version 1 knows only batch a
    val est0 = SketchIngest.estimate(spark, table, Seq("r").toDF("t"), col("t"),
      version = Some(1L)).as[(String, Long)].collect().toMap
    assert(est0("r") === 0L)
  }
}
