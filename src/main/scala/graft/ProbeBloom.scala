package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the ProbeMor pattern): bloom file-index
  * ECONOMICS at a given sf dir — storage overhead (index bytes vs table
  * bytes vs keys) and point-lookup cost (probe wall + candidate files vs
  * live files), so the "≈1.2 bytes/key, reads O(matching files)" claims
  * in BASELINE are measured, not asserted.
  *
  *   sbt "runMain graft.ProbeBloom benchdata/sf10"
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Snapshots
    val docs = Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("ukey"))
    val w = docs.agg(max(col("doc_id"))).first().getLong(0) / 8 + 1
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_bloom").toString
    val tbl = s"$tmp/tbl"
    (0 until 8).foreach { i =>
      Snapshots.commitAppend(
        docs.filter(col("doc_id") >= i * w && col("doc_id") < (i + 1) * w).coalesce(1),
        tbl, recordSchema = true)
    }
    val nKeys = docs.count()
    val fsys = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytes(paths: Seq[String]) = paths.map(p =>
      fsys.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen).sum
    val tableBytes = bytes(Snapshots.liveFiles(spark, tbl))
    val t0 = System.nanoTime()
    Snapshots.buildBloomIndex(spark, tbl, "ukey", fpp = 0.001)
    val buildS = (System.nanoTime() - t0) / 1e9
    val indexBytes = bytes(Snapshots.liveBloomFiles(spark, tbl))
    val md = java.security.MessageDigest.getInstance("MD5")
    val probes = Seq(1L, w + 1, 2 * w + 1).map(i =>
      docs.filter(col("doc_id") >= i).agg(min(col("doc_id"))).first().getLong(0))
      .map(i => md.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val t1 = System.nanoTime()
    val (kept, skipped) = Snapshots.bloomPrune(spark, tbl, "ukey", probes)
    val rows = Snapshots.readPoint(spark, tbl, "ukey", probes).count()
    val lookupS = (System.nanoTime() - t1) / 1e9
    println(f"[probe-bloom] sf=$d keys=$nKeys tableBytes=$tableBytes " +
      f"indexBytes=$indexBytes bytesPerKey=${indexBytes.toDouble / nKeys}%.2f " +
      f"overheadPct=${100.0 * indexBytes / tableBytes}%.2f buildS=$buildS%.2f " +
      f"lookupS=$lookupS%.2f kept=${kept.size} skipped=${skipped.size} rows=$rows")
    spark.stop()
  }
}
