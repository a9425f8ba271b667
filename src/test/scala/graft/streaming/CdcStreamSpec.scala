package graft.streaming

import graft.SparkSpec
import graft.io.{Snapshots, ViewMaintenance}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** CdcSource: readStream over a snapshot table's change feed — offsets
  * are table versions (checkpoint-recovered, never reprocessed), batches
  * are version-stamped CDC rows, and a foreachBatch consumer composing
  * applyDeltaBatch maintains a view exactly-once even when the streaming
  * checkpoint is lost (the note ledger is the second lock).
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def stream(t: String, feed: String) =
    spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("table", t).option("keys", "id").option("feed", feed).load()

  test("catalog-qualified names resolve in the stream source and sink") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdcname").toString
    spark.conf.set("spark.sql.catalog.gcdc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdc.root", base)
    val t = s"$base/named"
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("id", "m").coalesce(1),
      t, recordSchema = true)
    // source by catalog name — the same identifier batch SQL uses
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = spark.readStream.format("graft.streaming.CdcSourceProvider")
      .option("table", "gcdc.named").option("keys", "id")
      .option("feed", s"$base/feed").load()
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").collect().foreach(r => got.add(r.getLong(0))); ()
      }.start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.iterator().asScala.toSet === Set(1L, 2L))
    // sink by catalog name
    val src = s"$base/in"
    Seq((7L, 70L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s0")
    val schema = spark.read.parquet(s"$src/s0").schema
    val w = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(src)
      .writeStream.format("graft.streaming.SnapshotSinkProvider")
      .option("table", "gcdc.sunk").option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    w.awaitTermination()
    assert(spark.sql("SELECT id FROM gcdc.sunk").as[Long].collect().toSeq === Seq(7L))
  }

  test("offsets are table versions: a second run from the checkpoint sees only new commits") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdcs").toString
    val t = s"$base/tbl"; val feed = s"$base/feed"
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("id", "m").coalesce(1),
      t, recordSchema = true)
    Snapshots.mergeInto(spark, t, Seq((2L, 25L), (3L, 30L)).toDF("id", "m"),
      keys = Seq("id"))
    def drain(name: String): Seq[(Long, Long, String)] = {
      // micro-batches run sequentially on the query thread; the queue is
      // just crossing back to the test thread after awaitTermination
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]
      val q = stream(t, feed).writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("version", "id", "change").collect().foreach(r =>
            got.add((r.getLong(0), r.getLong(1), r.getString(2))))
          ()
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.iterator().asScala.toSeq
    }
    val first = drain("cdc_run1")
    assert(first.toSet === Set((1L, 1L, "insert"), (1L, 2L, "insert"),
      (2L, 2L, "update"), (2L, 3L, "insert")))
    // new commit → a fresh run from the same checkpoint processes ONLY it
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    val second = drain("cdc_run2")
    assert(second.toSet === Set((3L, 1L, "delete")))
  }

  test("snapshot sink format: one manifest transaction per micro-batch, replay-safe") {
    val base = java.nio.file.Files.createTempDirectory("graft_snksink").toString
    val src = s"$base/src"
    Seq((1L, 10L), (2L, 20L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s0")
    Seq((3L, 30L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s1")
    Seq("s0", "s1").zipWithIndex.foreach { case (sl, i) =>
      new java.io.File(s"$src/$sl").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    val t = s"$base/tbl"
    def drain(ckpt: String): Unit = {
      val schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(src)
        .writeStream.format("graft.streaming.SnapshotSinkProvider")
        .option("table", t).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(s"$base/ckpt1")
    assert(Snapshots.currentVersion(spark, t) === 2L) // one version per batch
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 2L)
    assert(Snapshots.readAt(spark, t).count() === 3L)
    // fresh checkpoint: full replay — the manifest ledger commits nothing
    val files = Snapshots.liveFiles(spark, t)
    drain(s"$base/ckpt2")
    assert(Snapshots.currentVersion(spark, t) === 2L)
    assert(Snapshots.liveFiles(spark, t) === files)
  }

  test("streaming view maintenance: stream-fed view equals direct GROUP BY; ledger survives checkpoint loss") {
    val base = java.nio.file.Files.createTempDirectory("graft_cdcv").toString
    val t = s"$base/tbl"; val feed = s"$base/feed"; val vt = s"$base/view"
    Snapshots.commitAppend(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "grp", "m")
        .coalesce(1), t, recordSchema = true)
    Snapshots.mergeInto(spark, t, Seq((3L, "a", 30L), (4L, "b", 40L))
      .toDF("id", "grp", "m"), keys = Seq("id")) // group move + insert
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    def run(ckpt: String): Unit = {
      val q = stream(t, feed).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          ViewMaintenance.applyDeltaBatch(spark, t, vt, batch,
            keys = Seq("id"), dims = Seq("grp"), measures = Seq("m"))
          ()
        }.start()
      q.awaitTermination()
    }
    run(s"$base/ckpt1")
    def view() = ViewMaintenance.readView(spark, vt)
      .select("grp", "n_rows", "sum_m").as[(String, Long, Long)].collect().toSet
    def direct() = Snapshots.readAt(spark, t).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("m").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(view() === direct())
    val vAfter = Snapshots.currentVersion(spark, vt)
    // checkpoint lost entirely → every batch replays; the view's note
    // ledger must refuse to double-apply (no new view version)
    run(s"$base/ckpt2")
    assert(view() === direct())
    assert(Snapshots.currentVersion(spark, vt) === vAfter)
  }

  test("branch sink: lazy fork, main frozen, resume without dups, re-fork after publish") {
    import graft.io.Branches
    val base = java.nio.file.Files.createTempDirectory("graft_brsink").toString
    val t = s"$base/tbl"; val src = s"$base/in"
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "m").coalesce(1),
      t, recordSchema = true)
    val schema = Seq((0L, 0L)).toDF("id", "m").schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).option("recursiveFileLookup", "true")
        .parquet(src)
        .writeStream.format("graft.streaming.SnapshotSinkProvider")
        .option("table", t).option("branch", "ing")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // an empty drain forks nothing — no branch until a batch lands
    new java.io.File(src).mkdirs()
    drain()
    assert(Branches.list(spark, t) === Nil)
    Seq((2L, 20L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s0")
    val v0 = Snapshots.currentVersion(spark, t)
    drain()
    assert(Branches.list(spark, t) === Seq("ing"))
    assert(Snapshots.currentVersion(spark, t) === v0) // main frozen
    // restart on the same checkpoint: only the new file lands
    Seq((3L, 30L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s1")
    drain()
    assert(Snapshots.readAt(spark, Branches.path(t, "ing")).count() === 3L)
    Branches.merge(spark, t, "ing")
    assert(Snapshots.currentVersion(spark, t) === v0 + 1)
    assert(Branches.list(spark, t) === Nil) // closed on publish
    // next drain re-forks from the published state
    Seq((4L, 40L)).toDF("id", "m").coalesce(1).write.parquet(s"$src/s2")
    drain()
    assert(Branches.list(spark, t) === Seq("ing"))
    assert(Snapshots.readAt(spark, Branches.path(t, "ing")).count() === 4L)
    assert(Snapshots.readAt(spark, t).count() === 3L)
    Branches.merge(spark, t, "ing")
    assert(Snapshots.readAt(spark, t)
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
