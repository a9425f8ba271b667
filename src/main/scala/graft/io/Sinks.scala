package graft.io

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side operators (SURVEY §2.1 S4-S8).
  *
  * The reference writes a versioned object per run and copies it to a
  * stable `latest/` key (`data_processing.py:465-538`, `s3_uploader.py:
  * 185-203`). Here: parquet/CSV writers plus a Hadoop-FS copy for the
  * "latest symlink" — identical layout on any Hadoop FS (s3a://, file://).
  */
object Sinks {

  /** S4 — versioned parquet sink (snappy is Spark's default codec). */
  def parquet(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Parquet sink with an explicit ROW-GROUP size — the layout knob that
    * decides a file's scan parallelism: a row group is parquet's split
    * unit, so a single 1 GB file written with the default 128 MB block
    * is ≤ 8 tasks, while 8 MB row groups fan the same file out to ~128.
    * The BASELINE q08 finding in one knob: a small table landing in ONE
    * file caps the first stage at rowGroups(file) tasks no matter how
    * many cores the cluster has — writers of single-file tables should
    * set `rowGroupBytes` ≈ bytes / desired-parallelism. (Many-file
    * tables don't need it: the file count already splits.) */
  def parquetRowGroups(df: DataFrame, dir: String, rowGroupBytes: Long): Unit = {
    require(rowGroupBytes >= 64 * 1024,
      s"rowGroupBytes must be >= 64 KiB, got $rowGroupBytes")
    df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(dir)
  }

  /** S5 — single-file CSV metric sink with header (`df.to_csv`,
    * `DP:508-514`). Metric tables are small aggregates — coalesce(1) is
    * deliberate and safe. */
  def metricsCsv(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)

  /** JSON-lines sink — the interchange format LLM-corpus pipelines speak
    * (one JSON object per line; newlines inside strings are escaped). */
  def jsonl(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  /** ORC sink (columnar alternative when the downstream stack is
    * Hive/ORC-native; Spark's reader is vectorized for both). */
  def orc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  /** S8 — "latest" copy: replicate a written directory to a stable path
    * (`s3.copy_object` → FS-level copy; works on s3a/file/hdfs alike). */
  def copyToLatest(spark: SparkSession, srcDir: String, latestDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val dst = new Path(latestDir)
    val fs: FileSystem = src.getFileSystem(conf)
    if (fs.exists(dst)) fs.delete(dst, true)
    FileUtil.copy(fs, src, fs, dst, false, true, conf)
  }

  /** S6 — one-line text artifact (the reference's watermark file shape). */
  def writeText(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readText(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }
}
