package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** ShardExport: micro-batches become versioned tar-shard commits; the
  * read-back walk reconstructs every document exactly once; fresh-
  * checkpoint replay re-commits nothing; shard layout is deterministic
  * (doc-id-sorted entries), so a replayed batch produces byte-identical
  * shards.
  */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "alpha doc", "s0"), (2L, "beta doc", "s1"), (3L, "gamma", "s0"),
    (4L, "delta text", "s1"), (5L, "epsilon", "s0"), (6L, (null: String), "s1"))
    .toDF("doc_id", "text", "source")

  private def stage(base: String): String = {
    val src = s"$base/src"
    docsDf.filter($"doc_id" <= 3).coalesce(1).write.parquet(s"$src/slice0")
    docsDf.filter($"doc_id" > 3).coalesce(1).write.parquet(s"$src/slice1")
    Seq("slice0", "slice1").zipWithIndex.foreach { case (sl, i) =>
      new java.io.File(s"$src/$sl").listFiles()
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
    src
  }

  private def drain(src: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    val q = ShardExport.start(spark,
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(src),
      table, ckpt, buckets = 2)
    q.awaitTermination()
  }

  private def unpack(table: String): Set[(Long, String)] =
    Snapshots.readAt(spark, table)
      .select(explode(graft.functions.TarExprs.tarEntries($"tar_file")).as("e"))
      .filter($"e.name".endsWith(".txt"))
      .select(expr("CAST(substring(e.name, 1, length(e.name) - 4) AS BIGINT)"),
        expr("decode(e.payload, 'UTF-8')"))
      .as[(Long, String)].collect().toSet

  test("two batches → two shard-table versions; walk reconstructs every non-null doc") {
    val base = java.nio.file.Files.createTempDirectory("graft_se").toString
    val table = s"$base/tbl"
    drain(stage(base), table, s"$base/ckpt")
    assert(Snapshots.currentVersion(spark, table) === 2L)
    assert(unpack(table) === Set(1L -> "alpha doc", 2L -> "beta doc", 3L -> "gamma",
      4L -> "delta text", 5L -> "epsilon")) // null-text doc 6 filtered at pack
    // version 1 holds only the first batch's shards
    assert(Snapshots.readAt(spark, table, Some(1)).count() > 0)
  }

  test("fresh-checkpoint replay re-commits nothing and shards stay byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_se2").toString
    val src = stage(base)
    val table = s"$base/tbl"
    drain(src, table, s"$base/ckpt1")
    val v = Snapshots.currentVersion(spark, table)
    val bytes = Snapshots.readAt(spark, table).orderBy("bucket")
      .select(md5($"tar_file")).as[String].collect().toSeq
    drain(src, table, s"$base/ckpt2") // checkpoint lost, all batches replay
    assert(Snapshots.currentVersion(spark, table) === v)
    assert(Snapshots.readAt(spark, table).orderBy("bucket")
      .select(md5($"tar_file")).as[String].collect().toSeq === bytes)
  }

  test("null doc_id rows are dropped at pack, never a null shard") {
    val withNullId = docsDf.union(Seq((null.asInstanceOf[java.lang.Long], "orphan text", "s0"))
      .toDF("doc_id", "text", "source"))
    val shards = ShardExport.packShards(withNullId, 1).collect()
    assert(shards.length === 1)
    // the shard packs the 5 valid docs — not null (whole-bucket refusal)
    assert(!shards.head.isNullAt(1), "shard must not be a null tar_file")
    val names = Seq(Tuple1(shards.head.getAs[Array[Byte]]("tar_file"))).toDF("t")
      .select(explode(graft.functions.TarExprs.tarEntries($"t")).as("e"))
      .select($"e.name").as[String].collect()
    assert(names.count(_.endsWith(".txt")) === 5)
  }

  test("packShards is deterministic: entries doc-id-sorted within a shard") {
    val a = ShardExport.packShards(docsDf.orderBy($"doc_id".desc), 1)
      .select(md5($"tar_file")).as[String].head()
    val b = ShardExport.packShards(docsDf.orderBy("source", "doc_id"), 1)
      .select(md5($"tar_file")).as[String].head()
    assert(a === b)
  }
}
