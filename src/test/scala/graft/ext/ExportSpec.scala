package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deterministic shuffle-shard export: exact permutation, equal shard
  * sizes, seed-controlled order, bounded file sizes on write. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  test("ranks are an exact permutation and shard sizes differ by at most one") {
    val sharded = Export.shuffleShards(corpus(1000), $"doc_id", "epoch0", 7)
    val ranks = sharded.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks === (0L until 1000L).toArray)
    val sizes = sharded.groupBy("shard").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes.keySet === (0L until 7L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("order is deterministic per seed and changes with the seed") {
    def order(seed: String) =
      Export.shuffleShards(corpus(200), $"doc_id", seed, 4)
        .orderBy("rank").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order("epoch0") === order("epoch0"))
    assert(order("epoch0") !== order("epoch1"))
    // a seeded shuffle is not the identity order
    assert(order("epoch0") !== (0L until 200L).toSeq)
  }

  test("no global one-task window over data rows: row_number is bucket-partitioned") {
    val plan = Export.shuffleShards(corpus(100), $"doc_id", "s", 3)
      .queryExecution.executedPlan.toString
    // the data-row window (row_number) must carry the bucket partition
    // spec; an unpartitioned ORDER BY hash would funnel the corpus
    // through one task
    val rowNumberSpecs = "row_number\\(\\) windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(rowNumberSpecs.nonEmpty, s"no row_number window found:\n$plan")
    assert(rowNumberSpecs.forall(_.contains("__bkt")),
      s"row_number window not partitioned by bucket:\n$plan")
  }

  test("writeShards round-trips content with bounded files per shard") {
    val dir = Files.createTempDirectory("graft_export").toString + "/out"
    val sharded = Export.shuffleShards(corpus(500), $"doc_id", "epoch0", 4)
    Export.writeShards(sharded, dir, 4, maxRecordsPerFile = 50L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted
      === (0L until 500L).toArray)
    // shard dirs exist and each file holds at most maxRecordsPerFile rows
    val shardDirs = new java.io.File(dir).list().count(_.startsWith("shard="))
    assert(shardDirs === 4)
    val files = back.inputFiles
    assert(files.length >= 8, s"expected multiple bounded files, got ${files.length}")
  }
}
