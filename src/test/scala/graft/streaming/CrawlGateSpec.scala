package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CrawlGate: the streaming compressed-crawl gate's decode contract —
  * corrupt containers degrade to data loss (never a crashed query), the
  * Gopher verdicts match the batch filter, and replaying a batch is
  * idempotent (same directory, same kept set).
  */
class CrawlGateSpec extends SparkSpec {
  import spark.implicits._

  // 56 fluent words → passes every Gopher rule (incl. word_count ≥ 50)
  private val fluentText = ("the cat and the dog have been to town with all of " +
    "that gear because they wanted to see what the other side of the river " +
    "looked like and the walk turned out to be worth every single step they " +
    "took that bright morning with friends and the second walk was even " +
    "better for everyone there").trim

  private def container(docs: Seq[(Long, String)]): Array[Byte] =
    docs.map { case (id, text) =>
      val line = Seq((id, text)).toDF("id", "text")
        .select(graft.functions.ZstdExprs.zstdFrame(
          concat(to_json(struct($"id", $"text")), lit("\n"))).as("z"))
        .head().getAs[Array[Byte]]("z")
      line
    }.reduce(_ ++ _)

  private def runGate(containers: Seq[Array[Byte]]): Seq[Long] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_crawlgate_spec").toString
    containers.zipWithIndex.foreach { case (c, i) =>
      Seq(Tuple1(c)).toDF("zst_file").write.parquet(s"$tmp/src/f$i")
    }
    val q = CrawlGate.start(spark,
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("zst_file BINARY"))
        .option("recursiveFileLookup", "true").parquet(s"$tmp/src"),
      "zst_file", outDir = s"$tmp/out", checkpoint = s"$tmp/ckpt")
    q.awaitTermination()
    spark.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSeq.sorted
  }

  test("keeps Gopher passers, drops junk, and survives a corrupt container") {
    val good = container(Seq(1L -> fluentText, 2L -> "too short"))
    val corrupt = "not zstd at all".getBytes("UTF-8")
    val alsoGood = container(Seq(3L -> fluentText))
    // corrupt container → null text → zero parsed lines, not a crash
    assert(runGate(Seq(good, corrupt, alsoGood)) === Seq(1L, 3L))
  }

  test("a corrupt tail inside a container keeps the decoded prefix") {
    val salvage = container(Seq(5L -> fluentText)) ++ Array[Byte](9, 9, 9, 9)
    assert(runGate(Seq(salvage)) === Seq(5L))
  }

  test("batch replay is idempotent: same kept set after a second drain") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_crawlgate_replay").toString
    Seq(Tuple1(container(Seq(7L -> fluentText)))).toDF("zst_file")
      .write.parquet(s"$tmp/src/f0")
    def drain(): Seq[Long] = {
      val q = CrawlGate.start(spark,
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("zst_file BINARY"))
          .option("recursiveFileLookup", "true").parquet(s"$tmp/src"),
        "zst_file", outDir = s"$tmp/out", checkpoint = s"$tmp/ckpt")
      q.awaitTermination()
      spark.read.option("recursiveFileLookup", "true").parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSeq.sorted
    }
    val first = drain()
    // second drain: checkpoint says all files committed → no new batch,
    // and the output directory still holds exactly the first kept set
    val second = drain()
    assert(first === Seq(7L) && second === first)
  }
}
