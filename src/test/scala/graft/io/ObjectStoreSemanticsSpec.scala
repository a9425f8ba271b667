package graft.io

import graft.SparkSpec
import graft.incremental.Incremental
import org.apache.spark.sql.functions._

/** The incremental state machine and the sinks driven end-to-end through
  * [[ObjectStoreFs]] — a filesystem that refuses `append` and records every
  * rename/delete/create — proving the object-store layout discipline the
  * scaladocs claim: watermark = single-key PUT, tracker = append-only
  * directory of new objects, compaction = write-new-then-delete-old,
  * copyToLatest never mutates its source. */
class ObjectStoreSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val root: String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftos.impl", classOf[ObjectStoreFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft_objstore").toString
    s"graftos://$local"
  }

  private def writeSlice(i: Int): Unit =
    Seq((i.toLong, s"row$i")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/src/slice$i")

  test("incremental run is exactly-once on an object store and never appends or mutates live state") {
    ObjectStoreFs.reset()
    writeSlice(1); writeSlice(2)
    val n1 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n1 === 2)
    // rerun: no new files → no-op (tracker anti-join), output unchanged
    val n2 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n2 === 0)
    writeSlice(3)
    val n3 = Incremental.run(spark, s"$root/src", s"$root/state", s"$root/out")(identity)
    assert(n3 === 1)
    assert(spark.read.parquet(s"$root/out").count() === 3)
    assert(spark.read.parquet(s"$root/out").select("id").as[Long].collect().sorted
      === Array(1L, 2L, 3L))

    val ops = ObjectStoreFs.ops
    assert(ops.nonEmpty, "the graftos filesystem must actually be in the path")
    // S3 discipline 1: nothing ever calls append
    assert(ops.filter(_.op == "append").isEmpty)
    // staging machinery (what the magic committer replaces with multipart
    // uploads on real s3a): _temporary trees and .spark-staging dirs
    def staging(p: String) =
      p.contains("_temporary") || p.contains(".spark-staging") || p.contains("_SUCCESS")
    // S3 discipline 2: every rename is committer staging → final; live
    // state objects are never renamed
    val badRenames = ops.filter(o => o.op == "rename" && !staging(o.path))
    assert(badRenames.isEmpty, s"live-state renames: $badRenames")
    // S3 discipline 3: under the state dir, only staging machinery is ever
    // deleted — watermark and committed tracker parts stay put
    val stateDeletes = ops.filter(o => o.op == "delete" && o.path.contains("/state/")
      && !staging(o.path))
    assert(stateDeletes.isEmpty, s"live-state deletes: $stateDeletes")
    // the watermark is a pure PUT (create-overwrite), parseable, and current
    assert(ops.exists(o => o.op == "create" && o.path.endsWith("watermark.txt")))
    assert(Incremental.readWatermark(spark, s"$root/state") > Incremental.DefaultWatermarkMillis)
  }

  test("compactTracker commits the new generation before deleting old parts") {
    ObjectStoreFs.reset()
    val before = Incremental.readTracker(spark, s"$root/state")
      .as[String].collect().sorted
    assert(before.length === 3)
    Incremental.compactTracker(spark, s"$root/state")
    val ops = ObjectStoreFs.ops
    val partDeletes = ops.filter(o => o.op == "delete"
      && o.path.contains("/tracker/") && !o.path.contains("_temporary")
      && !o.path.contains("_SUCCESS"))
    assert(partDeletes.nonEmpty, "compaction must remove the superseded parts")
    // the new generation's commit (rename out of _temporary into tracker/)
    // must precede the first delete of an old part — the crash window
    // between them duplicates entries (readers dedup), never loses them
    val commitSeq = ops.filter(o => o.op == "rename" && o.dst.contains("/tracker/"))
      .map(_.seq)
    assert(commitSeq.nonEmpty)
    assert(commitSeq.min < partDeletes.map(_.seq).min,
      "old parts were deleted before the compacted generation was committed")
    val after = Incremental.readTracker(spark, s"$root/state").as[String].collect().sorted
    assert(after === before)
  }

  test("copyToLatest replicates to the stable key without touching the source") {
    ObjectStoreFs.reset()
    Sinks.copyToLatest(spark, s"$root/out", s"$root/latest")
    // second copy: overwrite path (delete latest, re-copy)
    Sinks.copyToLatest(spark, s"$root/out", s"$root/latest")
    val ops = ObjectStoreFs.ops
    val srcMutations = ops.filter(o => (o.op == "delete" || o.op == "rename")
      && o.path.contains("/out"))
    assert(srcMutations.isEmpty, s"copyToLatest mutated its source: $srcMutations")
    assert(spark.read.parquet(s"$root/latest").count() === 3)
  }

  test("the store itself refuses append, so the discipline is enforced not assumed") {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[ObjectStoreFs])
    intercept[UnsupportedOperationException] {
      fs.append(new org.apache.hadoop.fs.Path(s"$root/state/watermark.txt"), 4096, null)
    }
  }
}
