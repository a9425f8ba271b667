package graft.incremental

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §2.10 incremental semantics: exactly-once file processing via
  * tracker anti-join, watermark monotonicity, rerun idempotency (the
  * reference's own claimed invariant, DP:921).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_inc_spec").toString

  test("run processes each file exactly once; rerun is a no-op") {
    val root = tmp()
    Seq(1, 2, 3).toDF("v").write.parquet(s"$root/src/f1")
    Seq(4, 5).toDF("v").write.parquet(s"$root/src/f2")

    val n1 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n1 > 0)
    assert(spark.read.parquet(s"$root/out").count() === 5)

    val n2 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n2 === 0)
    assert(spark.read.parquet(s"$root/out").count() === 5) // unchanged
  }

  test("new files arriving later are picked up without reprocessing old ones") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    Seq(2, 3).toDF("v").write.parquet(s"$root/src/f2")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val vals = spark.read.parquet(s"$root/out").collect().map(_.getInt(0)).sorted.toSeq
    assert(vals === Seq(1, 2, 3))
  }

  test("watermark is monotonically non-decreasing across runs") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val w1 = Incremental.readWatermark(spark, s"$root/state")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    val w2 = Incremental.readWatermark(spark, s"$root/state")
    assert(w1 > 0L)
    assert(w2 >= w1)
  }

  test("transform is applied to each new batch") {
    val root = tmp()
    Seq(1, 2).toDF("v").write.parquet(s"$root/src/f1")
    Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(
      df => df.withColumn("v", col("v") * 10))
    val vals = spark.read.parquet(s"$root/out").collect().map(_.getInt(0)).sorted.toSeq
    assert(vals === Seq(10, 20))
  }

  test("watermark artifact is ISO-8601 text with the reference's 2000-01-01 default") {
    val root = tmp()
    // first run: the reference's datetime(2000, 1, 1) default (DP:234)
    assert(Incremental.readWatermark(spark, s"$root/state") === Incremental.DefaultWatermarkMillis)
    Incremental.writeWatermark(spark, s"$root/state", 1700000000000L)
    val raw = Files.readString(java.nio.file.Paths.get(root, "state", "watermark.txt"))
    assert(raw === "2023-11-14T22:13:20Z") // isoformat artifact, not epoch digits
    assert(Incremental.readWatermark(spark, s"$root/state") === 1700000000000L)
    // a legacy all-digits epoch-millis artifact still parses (written via
    // the Hadoop API — an NIO overwrite would leave a stale .crc sidecar)
    graft.io.Sinks.writeText(spark, s"$root/state/watermark.txt", "12345")
    assert(Incremental.readWatermark(spark, s"$root/state") === 12345L)
    // a truncated/garbled artifact (crash between create and write)
    // self-heals to the default instead of wedging every later run
    graft.io.Sinks.writeText(spark, s"$root/state/watermark.txt", "")
    assert(Incremental.readWatermark(spark, s"$root/state") === Incremental.DefaultWatermarkMillis)
    graft.io.Sinks.writeText(spark, s"$root/state/watermark.txt", "2023-11-1")
    assert(Incremental.readWatermark(spark, s"$root/state") === Incremental.DefaultWatermarkMillis)
  }

  test("a tracker dir with zero committed part files reads as empty, not an error") {
    val root = tmp()
    Files.createDirectories(java.nio.file.Paths.get(root, "state", "tracker"))
    assert(Incremental.readTracker(spark, s"$root/state").count() === 0)
  }

  test("tracker is append-only: a run never rewrites or renames live state") {
    val root = tmp()
    Incremental.appendTracker(spark, s"$root/state", Seq("a", "b"))
    def gen() = new java.io.File(s"$root/state/tracker").list()
      .filter(_.endsWith(".parquet")).toSet
    val g1 = gen()
    Incremental.appendTracker(spark, s"$root/state", Seq("c"))
    // object-store safety: earlier objects are untouched (PUT-only growth)
    assert(g1.subsetOf(gen()))
    def paths() = Incremental.readTracker(spark, s"$root/state")
      .collect().map(_.getString(0)).toSet
    assert(paths() === Set("a", "b", "c"))
    Incremental.compactTracker(spark, s"$root/state")
    assert(gen().size === 1)
    assert(paths() === Set("a", "b", "c"))
  }

  test("legacy single-file tracker layout is read alongside and folded by compaction") {
    val root = tmp()
    Seq("x").toDF("path").write.parquet(s"$root/state/tracker.parquet")
    Incremental.appendTracker(spark, s"$root/state", Seq("y"))
    def paths() = Incremental.readTracker(spark, s"$root/state")
      .collect().map(_.getString(0)).toSet
    assert(paths() === Set("x", "y"))
    Incremental.compactTracker(spark, s"$root/state")
    assert(!new java.io.File(s"$root/state/tracker.parquet").exists())
    assert(paths() === Set("x", "y"))
  }

  test("state artifacts resolve through the Hadoop Path scheme (explicit file: URI)") {
    // every state op goes Path → Path.getFileSystem(conf) — the same code
    // path an s3a://bucket/prefix URI takes once CloudConf is applied
    val root = "file:" + tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/f1")
    assert(Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity) === 1)
    assert(Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity) === 0)
    assert(Incremental.readWatermark(spark, s"$root/state") > Incremental.DefaultWatermarkMillis)
  }

  test("bucket-scale discovery: listing distributed, only the batch collected") {
    val root = tmp()
    // many-file synthetic listing: 12 subdirs × 25 files, mtimes pinned
    // strictly increasing across (dir, file) so ordering is deterministic
    val base = 1700000000000L
    (0 until 12).foreach { d =>
      Files.createDirectories(java.nio.file.Paths.get(root, "src", s"d$d"))
      (0 until 25).foreach { i =>
        val f = java.nio.file.Paths.get(root, "src", s"d$d", f"part_$d%02d_$i%02d.parquet")
        Files.writeString(f, "x")
        f.toFile.setLastModified(base + (d * 25 + i) * 1000L)
      }
    }
    Files.writeString(java.nio.file.Paths.get(root, "src", "skip.txt"), "no")
    val listing = Incremental.listingDf(spark, s"$root/src")
    assert(listing.count() === 300) // pattern filter dropped the .txt
    // watermark filter runs inside the plan
    assert(Incremental.listingDf(spark, s"$root/src",
      watermark = base + 150 * 1000L - 1).count() === 150)
    // tracker anti-join + mtime order + top-k: oldest UNTRACKED files win
    val first10 = Incremental.takeBatch(spark, listing, Seq.empty[String].toDF("path"), 10)
    assert(first10.map(_.mtime) === (0 until 10).map(i => base + i * 1000L))
    val tracker = first10.map(_.path).toDF("path")
    val batch = Incremental.takeBatch(spark, listing, tracker, 5)
    assert(batch.map(_.mtime) === (10 until 15).map(i => base + i * 1000L))
    // bounded-collect proof: the limit sits UNDER the collect (GlobalLimit
    // in the optimized plan; sort+limit fuse to TakeOrderedAndProject in
    // the physical plan — only k rows ever reach the driver, no full sort)
    val qe = Incremental.batchDf(listing, tracker, 5).queryExecution
    assert(qe.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => g
    }.nonEmpty)
    assert(qe.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("flat-bucket discovery: root-level files list via the executor path, once") {
    val root = tmp()
    val base = 1700000000000L
    // a mostly-FLAT bucket: files directly under the root (the shape that
    // used to buffer on the driver) plus one subdir to prove the root task
    // is non-recursive — subtrees are owned by their subdir tasks, so
    // nothing is listed twice
    (0 until 40).foreach { i =>
      val f = java.nio.file.Paths.get(root, "src", f"flat_$i%02d.parquet")
      Files.createDirectories(f.getParent)
      Files.writeString(f, "x")
      f.toFile.setLastModified(base + i * 1000L)
    }
    (0 until 5).foreach { i =>
      val f = java.nio.file.Paths.get(root, "src", "sub", s"nested_$i.parquet")
      Files.createDirectories(f.getParent)
      Files.writeString(f, "x")
      f.toFile.setLastModified(base + (100 + i) * 1000L)
    }
    val listing = Incremental.listingDf(spark, s"$root/src")
    assert(listing.count() === 45)
    assert(listing.select("path").distinct().count() === 45)
    // flat files reach the driver exclusively through the bounded collect
    val batch = Incremental.takeBatch(spark, listing, Seq.empty[String].toDF("path"), 3)
    assert(batch.map(_.mtime) === (0 until 3).map(i => base + i * 1000L))
    assert(batch.forall(_.path.contains("flat_")))
  }

  test("discover filters by pattern and sorts by mtime") {
    val root = tmp()
    Seq(1).toDF("v").write.parquet(s"$root/src/a")
    Files.writeString(java.nio.file.Paths.get(root, "src", "note.txt"), "skip me")
    val metas = Incremental.discover(spark, s"$root/src")
    assert(metas.nonEmpty)
    assert(metas.forall(_.path.endsWith(".parquet")))
    assert(metas.map(_.mtime) === metas.map(_.mtime).sorted)
  }
}
