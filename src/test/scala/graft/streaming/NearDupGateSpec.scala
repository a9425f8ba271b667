package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming near-dup ingest gate: cross-batch drops against the growing
  * persisted signature history, kept-only history semantics, and the
  * replay guard that keeps a crashed batch idempotent. */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the patient cat " +
      "watches from the garden wall near the old stone well every morning"

  private def stage(root: String, slices: Seq[Seq[(Long, String)]]): Unit =
    slices.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/src/slice$i")
      new java.io.File(s"$root/src/slice$i").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }

  private def runGate(root: String): Unit = {
    val schema = spark.read.parquet(s"$root/src/slice0").schema
    graft.queries.Staging.withShufflePartitions(spark, 4) {
      NearDupGate.start(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$root/src"),
        "doc_id", "text",
        sigDir = s"$root/sigs", outDir = s"$root/out",
        checkpoint = s"$root/ckpt")
        .awaitTermination()
    }
  }

  private def keptIds(root: String): Set[Long] =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet

  test("a dup arriving in a LATER batch than its original is dropped; the original kept") {
    val root = Files.createTempDirectory("graft_ndg_spec").toString
    stage(root, Seq(
      Seq((1L, base), (2L, base.replace("fox", "owl").replace("dog", "hen")
        .replace("cat", "bee").replace("wall", "gate").replace("well", "pond")
        .replace("quick", "slow").replace("lazy", "calm").replace("brown", "grey"))),
      Seq((3L, "completely different words about parquet shuffles and " +
        "broadcast joins inside a spark cluster running at scale today")),
      // batch 2: near-dup of doc 1 (batch 0) and of doc 3 (batch 1)
      Seq((4L, base + " extra tail"), (5L, "completely different words about " +
        "parquet shuffles and broadcast joins inside a spark cluster " +
        "running at scale today again"))))
    runGate(root)
    assert(keptIds(root) === Set(1L, 2L, 3L),
      "originals kept; later-batch dups of batch-0 AND batch-1 docs dropped")
  }

  test("kept-only history: a dropped dup never shadows future arrivals") {
    // B is a dup of A (dropped). C arrives later, near-dups BOTH A and B.
    // C must be judged against the KEPT history (A) — still dropped — but
    // the history artifact must contain only A's and C's absence, i.e.
    // sigs dirs hold exactly the kept doc ids.
    val root = Files.createTempDirectory("graft_ndg_spec2").toString
    stage(root, Seq(
      Seq((10L, base)),
      Seq((11L, base + " tail one")),
      Seq((12L, base + " tail two"))))
    runGate(root)
    assert(keptIds(root) === Set(10L))
    val histIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/sigs").select("doc_id").as[Long].collect().toSet
    assert(histIds === Set(10L), "only kept docs become history")
  }

  test("replay guard: history for batch N excludes its own and later sigs dirs") {
    val root = Files.createTempDirectory("graft_ndg_spec3").toString
    // simulate a crashed-then-replayed batch 1: its own partial sigs dir
    // (and a stray later dir) already exist on disk
    Seq((1L, base)).toDF("doc_id", "text")
      .write.parquet(s"$root/sigs/b0")
    Seq((2L, base)).toDF("doc_id", "text")
      .write.parquet(s"$root/sigs/b1")
    Seq((3L, base)).toDF("doc_id", "text")
      .write.parquet(s"$root/sigs/b2")
    val hist = NearDupGate.historySigs(spark, s"$root/sigs", batchId = 1L)
    assert(hist.isDefined)
    assert(hist.get.select("doc_id").as[Long].collect().toSeq === Seq(1L),
      "batch 1 must see only b0 — not its own partial b1, not the stray b2")
    assert(NearDupGate.historySigs(spark, s"$root/sigs", batchId = 0L).isEmpty,
      "first batch has no history")
    assert(NearDupGate.historySigs(spark, s"$root/nope", batchId = 5L).isEmpty,
      "missing sig root is an empty history, not an error")
  }
}
