package graft.streaming

import graft.SparkSpec
import graft.ext.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming IVF ingest: exactly-once across replays and mid-append
  * crashes (the two-phase marker protocol), and drain ≡ batch appends. */
class VectorIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Int): Seq[Float] =
    Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat).toSeq

  private def embDf(ids: Seq[Int]) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def freshIndex(table: String): Array[Array[Double]] = {
    val base = embDf(0 until 80)
    val centroids = Similarity.kmeansCentroids(base, nlist = 4, iters = 2)
    Similarity.writeIvfIndex(base, table, centroids, numBuckets = 4)
    centroids
  }

  private def indexIds(table: String): Seq[Long] =
    spark.table(table).select("neighbor_id").collect().map(_.getLong(0)).toSeq

  test("committed batch replays are skipped; content appended exactly once") {
    val table = "graft_vi_replay"
    try {
      val centroids = freshIndex(table)
      val tracker = Files.createTempDirectory("graft_vi_trk").toString
      val batch = embDf(100 until 120)
      VectorIngest.ingestBatch(spark, batch, table, centroids, tracker, 0L, 4)
      assert(indexIds(table).sorted === ((0 until 80) ++ (100 until 120)).map(_.toLong))
      // replay of a fully-committed batch: no-op
      VectorIngest.ingestBatch(spark, batch, table, centroids, tracker, 0L, 4)
      assert(indexIds(table).length === 100)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("crash mid-append: replay lands only the missing rows") {
    val table = "graft_vi_crash"
    try {
      val centroids = freshIndex(table)
      val tracker = Files.createTempDirectory("graft_vi_trk2").toString
      val batch = embDf(200 until 220)
      // simulate a crash: the started marker exists and an unknown PREFIX
      // of the batch already landed, but no committed marker
      val fs = new org.apache.hadoop.fs.Path(tracker)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.create(new org.apache.hadoop.fs.Path(tracker, "b0.started"), true).close()
      Similarity.appendToIvfIndex(embDf(200 until 207), table, centroids, 4)
      assert(indexIds(table).length === 87)

      VectorIngest.ingestBatch(spark, batch, table, centroids, tracker, 0L, 4)
      val ids = indexIds(table)
      assert(ids.length === 100, s"expected no duplicates, got ${ids.length}")
      assert(ids.sorted === ((0 until 80) ++ (200 until 220)).map(_.toLong))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("streamed drain ≡ batch appends, and the index serves ingested vectors") {
    val table = "graft_vi_stream"
    try {
      val centroids = freshIndex(table)
      val root = Files.createTempDirectory("graft_vi_src").toString
      // two slices; the second contains an exact twin of base vector 3
      Seq(300 until 320, 320 until 330).zipWithIndex.foreach { case (ids, i) =>
        val rows = (ids.map(i => (i.toLong, vec(i))) ++
          (if (i == 1) Seq((999L, vec(3))) else Nil)).toDF("vec_id", "embedding")
        rows.coalesce(1).write.mode("overwrite").parquet(s"$root/src/slice$i")
        new java.io.File(s"$root/src/slice$i").listFiles()
          .foreach(_.setLastModified(1700000000000L + i * 60000L))
      }
      val tracker = Files.createTempDirectory("graft_vi_trk3").toString
      val q = VectorIngest.start(spark,
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .option("maxFilesPerTrigger", 1)
          .option("recursiveFileLookup", "true").parquet(s"$root/src"),
        table, centroids, tracker,
        Files.createTempDirectory("graft_vi_ckpt").toString, 4)
      q.awaitTermination()
      assert(indexIds(table).length === 80 + 31)
      // the twin (ingested, never trained on) must serve at rank 1
      val top = Similarity.ivfTopKIndexed(spark, embDf(Seq(3)), table, centroids,
        k = 1, nprobe = 2)
      assert(top.select("neighbor_id").collect().map(_.getLong(0)).toSet
        .subsetOf(Set(3L, 999L)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
