package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming semantic-dedup gate: cross-batch drops, and the
  * [[graft.ext.Similarity.IvfDrift]]-triggered quantizer refresh — a
  * planted distribution shift must produce exactly ONE rebuild commit
  * (new centroid artifact + `_rebased` history generation) while dedup
  * semantics hold across the rebase. */
class SemDedupGateSpec extends SparkSpec {
  import spark.implicits._

  // cluster A lives near e1, cluster B (the planted shift) near e3 —
  // mean assignment cosine of B against A-trained centroids collapses
  private def aVec(i: Int): Array[Float] =
    Array(1f, 0.1f * i, 0f, 0f)
  private def bVec(i: Int): Array[Float] =
    Array(0f, 0f, 1f, 0.1f * i)

  private def stage(root: String, slices: Seq[Seq[(Long, Array[Float])]]): Unit =
    slices.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/src/slice$i")
      new java.io.File(s"$root/src/slice$i").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }

  private def runGate(root: String, cents: Array[Array[Double]],
                      ref: Option[Double]): Unit = {
    val schema = spark.read.parquet(s"$root/src/slice0").schema
    graft.queries.Staging.withShufflePartitions(spark, 4) {
      SemDedupGate.start(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$root/src"),
        cents, histDir = s"$root/hist", outDir = s"$root/out",
        checkpoint = s"$root/ckpt", threshold = 0.9999, nprobe = 2,
        refMeanSim = ref, driftMargin = 0.05)
        .awaitTermination()
    }
  }

  private def keptIds(root: String): Set[Long] =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$root/out")
      .select("vec_id").as[Long].collect().toSet

  test("planted shift triggers ONE rebuild; dedup holds across the rebase") {
    val root = Files.createTempDirectory("graft_sdg_drift").toString
    val aTrain = (0 until 10).map(i => (i.toLong, aVec(i))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(aTrain, nlist = 2, iters = 3)
    val ref = Similarity.ivfAssignQuality(aTrain, cents)
    assert(ref > 0.9, s"calibration ref=$ref")
    stage(root, Seq(
      // batch 0: cluster A; id 2 is an exact dup of id 1 (within-batch)
      Seq((1L, aVec(1)), (2L, aVec(1)), (3L, aVec(5)), (4L, aVec(9))),
      // batch 1: the SHIFT — cluster B, plus an exact dup of kept id 3
      // (must drop against the re-exploded history during the rebase)
      Seq((100L, bVec(0)), (101L, bVec(4)), (102L, bVec(8)), (120L, aVec(5))),
      // batch 2: post-rebase — exact dup of kept id 101 must still drop
      // under the REFRESHED quantizer artifact
      Seq((200L, bVec(4)), (201L, bVec(9)))))
    runGate(root, cents, Some(ref))
    assert(keptIds(root) === Set(1L, 3L, 4L, 100L, 101L, 102L, 201L),
      s"got ${keptIds(root)}")
    // exactly one rebuild commit: the batch-1 centroid artifact + marker
    val hist = new java.io.File(s"$root/hist")
    val artifacts = hist.listFiles().filter(_.getName.startsWith("centroids-b"))
    assert(artifacts.map(_.getName).toSeq === Seq("centroids-b1"))
    assert(new java.io.File(s"$root/hist/b1/_rebased").exists())
    assert(!new java.io.File(s"$root/hist/b0/_rebased").exists())
    // the rebased generation carries the WHOLE kept history: batch 2's
    // read uses only b1+b2 (b0's stale layout is dead)
    val b1Ids = spark.read.parquet(s"$root/hist/b1")
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(b1Ids === Set(1L, 3L, 4L, 100L, 101L, 102L))
  }

  test("without a calibration reference the quantizer stays frozen (no artifacts)") {
    val root = Files.createTempDirectory("graft_sdg_frozen").toString
    val aTrain = (0 until 10).map(i => (i.toLong, aVec(i))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(aTrain, nlist = 2, iters = 3)
    stage(root, Seq(
      Seq((1L, aVec(1)), (2L, aVec(5))),
      Seq((100L, bVec(0)), (101L, aVec(5))))) // shift, but no ref → no rebuild
    runGate(root, cents, None)
    assert(keptIds(root) === Set(1L, 2L, 100L))
    val hist = new java.io.File(s"$root/hist")
    assert(!hist.listFiles().exists(_.getName.startsWith("centroids-b")))
    assert(!new java.io.File(s"$root/hist/b1/_rebased").exists())
  }
}
