package graft.incremental

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.time.Instant

/** Batch-mode incremental file processing (SURVEY §2.10, ST1-ST6):
  * a persisted low-watermark plus a processed-files tracker give
  * exactly-once *file*-granularity processing, like the reference's
  * `_metadata/last_processed_watermark.txt` + `processed_files.json`
  * (`data_processing.py:226-307,342-380`) — re-expressed on Hadoop FS.
  *
  * The tracker is a tiny parquet table anti-joined (broadcast) against the
  * discovered listing; the watermark is a driver-side mtime filter. For the
  * streaming-native equivalent (checkpoint subsumes both) see
  * graft.streaming.IncrementalStream.
  */
object Incremental {
  final case class FileMeta(path: String, mtime: Long, size: Long)

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S2/P1/P2/O1 — recursive listing, pattern + watermark filter, mtime asc.
    * Driver state is the full MATCHING set — fine for thousands of files;
    * for bucket-scale trees use [[listingDf]] + [[takeBatch]], which keep
    * the listing distributed and collect only the mtime-ordered batch. */
  def discover(spark: SparkSession, dir: String, pattern: String = ".*\\.parquet$",
               watermark: Long = 0L): Seq[FileMeta] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Seq.empty
    val it = f.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[FileMeta]()
    while (it.hasNext) {
      val s: FileStatus = it.next()
      if (s.isFile && s.getPath.getName.matches(pattern) && s.getModificationTime > watermark)
        out += FileMeta(s.getPath.toString, s.getModificationTime, s.getLen)
    }
    out.sortBy(m => (m.mtime, m.path)).toSeq
  }

  /** DISTRIBUTED recursive listing as a DataFrame (path, mtime, size):
    * the driver streams the root's immediate children keeping only subdir
    * paths; executor tasks then stream each subtree — and the root's own
    * file level — through RemoteIterators (never a whole-subtree buffer),
    * and the pattern/watermark filters run inside the plan. At 10⁷ objects
    * (a realistic 100 TB raw bucket, even a FLAT one) the driver never
    * materializes the listing — compose with [[takeBatch]] so only the
    * batch it actually processes ever reaches driver heap. */
  def listingDf(spark: SparkSession, dir: String, pattern: String = ".*\\.parquet$",
                watermark: Long = 0L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at, split}
    val f = fs(spark, dir)
    val p = new Path(dir)
    // The driver STREAMS the root's immediate children (RemoteIterator) and
    // retains ONLY subdirectory paths; root-level FILES are re-listed by a
    // dedicated non-recursive executor task below, so a FLAT bucket with
    // 10⁷ objects directly under the root never materializes on the driver
    // (an earlier revision buffered them via listStatus). Driver state is
    // O(subdirectory count) — prefixes, not objects.
    val exists = f.exists(p)
    val subDirs = scala.collection.mutable.ArrayBuffer[String]()
    if (exists) {
      val rit = f.listStatusIterator(p)
      while (rit.hasNext) {
        val s = rit.next()
        if (s.isDirectory) subDirs += s.getPath.toString
      }
    }
    // (path, recursive): each subdir streams its whole subtree; the root
    // task streams only the root's own file level (depth 1 — subtrees are
    // owned by their subdir tasks, so nothing is listed twice)
    val tasks: Seq[(String, Boolean)] =
      if (!exists) Seq.empty
      else subDirs.toSeq.map(d => (d, true)) :+ ((dir, false))
    // hadoop Configuration is not serializable — ship its entries and
    // rebuild per task (keeps custom fs.* schemes working on executors)
    val confEntries = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    }
    val bc = spark.sparkContext.broadcast(confEntries)
    val parallelism = math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val metas = spark.sparkContext
      .parallelize(tasks, parallelism)
      .flatMap { case (d, recursive) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        val dp = new Path(d)
        val dfs = dp.getFileSystem(conf)
        if (recursive) {
          val it = dfs.listFiles(dp, true)
          new Iterator[FileMeta] {
            def hasNext: Boolean = it.hasNext
            def next(): FileMeta = {
              val s = it.next()
              FileMeta(s.getPath.toString, s.getModificationTime, s.getLen)
            }
          }
        } else {
          val it = dfs.listStatusIterator(dp)
          new Iterator[FileStatus] {
            def hasNext: Boolean = it.hasNext
            def next(): FileStatus = it.next()
          }.collect { case s if s.isFile =>
            FileMeta(s.getPath.toString, s.getModificationTime, s.getLen)
          }
        }
      }
    metas.toDF()
      // anchored: [[discover]] uses String.matches (full match); RLIKE alone
      // is a find() and would accept e.g. "xyellow_tripdata…" for a stem
      .filter(element_at(split(col("path"), "/"), -1).rlike(s"^(?:$pattern)$$"))
      .filter(col("mtime") > watermark)
  }

  /** The batch frame: `listing` minus tracked paths (anti-join — Spark
    * picks broadcast when the tracker is small), mtime-then-path ordered,
    * limited to `maxFiles`. The GlobalLimit sits UNDER the collect, so
    * driver state is O(maxFiles) however large the bucket. */
  def batchDf(listing: DataFrame, tracker: DataFrame, maxFiles: Int = Int.MaxValue): DataFrame = {
    val fresh = listing.join(tracker.select("path"), Seq("path"), "left_anti")
      .sort("mtime", "path")
    if (maxFiles == Int.MaxValue) fresh else fresh.limit(maxFiles)
  }

  /** [[batchDf]], collected into the driver-side batch. */
  def takeBatch(spark: SparkSession, listing: DataFrame, tracker: DataFrame,
                maxFiles: Int = Int.MaxValue): Seq[FileMeta] = {
    import spark.implicits._
    batchDf(listing, tracker, maxFiles).as[FileMeta].collect()
      .sortBy(m => (m.mtime, m.path)).toSeq
  }

  /** The reference's first-run watermark: `datetime(2000, 1, 1, tzinfo=utc)`
    * (`DP:234`), as epoch millis. */
  val DefaultWatermarkMillis: Long =
    Instant.parse("2000-01-01T00:00:00Z").toEpochMilli

  // ST1 — watermark as a one-line ISO-8601 text file, the reference's
  // artifact format (`DP:226-249` persists `datetime.isoformat()` and
  // defaults to 2000-01-01 when absent). A legacy all-digits epoch-millis
  // file (this repo's round-1 format) still parses.
  def readWatermark(spark: SparkSession, stateDir: String): Long = {
    val p = new Path(s"$stateDir/watermark.txt")
    val f = fs(spark, stateDir)
    if (!f.exists(p)) DefaultWatermarkMillis
    else {
      val in = f.open(p)
      val s = try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8).trim
        finally in.close()
      // self-heal an empty/truncated file (crash between create's truncate
      // and write): fall back to the initial watermark instead of wedging
      // every later run. Reprocessing is safe — the tracker anti-join (ST2)
      // keeps the pipeline exactly-once.
      try {
        if (s.nonEmpty && s.forall(_.isDigit)) s.toLong else Instant.parse(s).toEpochMilli
      } catch {
        case e: Exception =>
          System.err.println(s"[incremental] unreadable watermark '$s' (${e.getMessage}); using default")
          DefaultWatermarkMillis
      }
    }
  }

  def writeWatermark(spark: SparkSession, stateDir: String, wm: Long): Unit = {
    val f = fs(spark, stateDir)
    val out = f.create(new Path(s"$stateDir/watermark.txt"), true)
    try out.write(Instant.ofEpochMilli(wm).toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ST2 — processed-files tracker as an APPEND-ONLY parquet directory:
  // each run adds one small file holding just that run's paths. No
  // read-merge-rewrite (the round-1 shape was O(all files) per run) and —
  // critically for object stores — no rename/delete of live state: on s3a,
  // rename is a non-atomic copy+delete, so a crash mid-"rename" could lose
  // the whole tracker. A PUT of a new object is atomic everywhere.
  // Readers ignore in-flight `_temporary` output and dedup on read.
  private val trackerSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType)))

  def readTracker(spark: SparkSession, stateDir: String): DataFrame = {
    val f = fs(spark, stateDir)
    val sources = Seq(s"$stateDir/tracker", s"$stateDir/tracker.parquet")
      .filter(p => f.exists(new Path(p))) // legacy single-file layout still read
    if (sources.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], trackerSchema)
    else
      // explicit schema, not inference: a tracker dir left with zero
      // committed part files (crash on the very first append) must read as
      // empty, not throw "unable to infer schema" and wedge every run
      spark.read.schema(trackerSchema).parquet(sources: _*).select("path").distinct()
  }

  def appendTracker(spark: SparkSession, stateDir: String, paths: Seq[String]): Unit = {
    import spark.implicits._
    paths.toDF("path").coalesce(1).write.mode("append").parquet(s"$stateDir/tracker")
  }

  /** Optional maintenance: fold the append-only tracker directory (plus any
    * legacy single file) into one compacted file. Writes the compacted
    * generation FIRST, deletes the old pieces after — a crash in between
    * leaves duplicate paths, which readers dedup, never a lost entry. */
  def compactTracker(spark: SparkSession, stateDir: String): Unit = {
    val f = fs(spark, stateDir)
    val dir = new Path(s"$stateDir/tracker")
    val legacy = new Path(s"$stateDir/tracker.parquet")
    if (!f.exists(dir) && !f.exists(legacy)) return
    val old =
      (if (f.exists(dir)) f.listStatus(dir).toSeq.filter(_.isFile) else Nil).map(_.getPath)
    readTracker(spark, stateDir).coalesce(1).write.mode("append").parquet(dir.toString)
    old.foreach(p => f.delete(p, false))
    if (f.exists(legacy)) f.delete(legacy, true) // legacy layout is a directory
  }

  /** One incremental run: discover → anti-join tracker (J1) → process new
    * files through `transform` → append to `outDir` → update tracker +
    * watermark. Idempotent: re-running with no new files is a no-op.
    * Returns the number of files processed this run.
    */
  def run(spark: SparkSession, srcDir: String, stateDir: String, outDir: String)
         (transform: DataFrame => DataFrame): Int = {
    val wm = readWatermark(spark, stateDir)
    // watermark=0 is deliberate: the mtime watermark is an optimization,
    // the tracker is the exactly-once authority. The listing stays
    // DISTRIBUTED (listingDf) and only unprocessed paths are collected —
    // driver state is O(this run's batch), not O(bucket).
    val listing = listingDf(spark, srcDir, watermark = 0L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (listing.isEmpty) return 0
      val tracker = readTracker(spark, stateDir)
      val fresh = takeBatch(spark, listing, tracker)
      if (fresh.isEmpty) { writeWatermark(spark, stateDir, Instant.now.toEpochMilli); return 0 }
      val batch = spark.read.parquet(fresh.map(_.path): _*)
      transform(batch).write.mode("append").parquet(outDir)
      appendTracker(spark, stateDir, fresh.map(_.path))
      writeWatermark(spark, stateDir, math.max(wm, fresh.map(_.mtime).max))
      fresh.length
    } finally listing.unpersist()
  }
}
