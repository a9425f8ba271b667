package graft.queries

/** Staged INPUTS for file-shaped queries (streaming slices, renamed raw
  * drops) are deterministic functions of the sf dir — stage once per
  * (kind, sfDir) per JVM and reuse. The bench's min-of-N reruns must time
  * the operator, not the re-staging of identical input files; correctness
  * runs see the same bytes either way. Anything MUTABLE per run
  * (checkpoints, state dirs, outputs) must NOT go through this cache.
  */
object Staging {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Returns the staged temp root; `write` runs once per (kind, sfDir). */
  def dir(kind: String, sfDir: String)(write: String => Unit): String =
    cache.computeIfAbsent((kind, sfDir), { _ =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_$kind").toString
      write(tmp)
      tmp
    })

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily lowered —
    * for STATEFUL streaming queries whose state is tiny (hundreds of keys):
    * every state-store partition writes its own snapshot/delta files per
    * microbatch, so 32 partitions × stores × batches is pure checkpoint
    * fan-out with no parallelism benefit. Batch queries keep the session
    * default. The stateful operator's partition count is fixed at first
    * checkpoint anyway — this also documents that choice explicitly. */
  def withShufflePartitions[A](spark: org.apache.spark.sql.SparkSession, n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** [[dir]] for multi-slice STREAM sources: `write` stages into
    * `$tmp/src/<slice>` and returns the slices in drain order; file mtimes
    * are pinned strictly increasing so the file source's oldest-first
    * ordering (and thus watermark advance) stays deterministic even when
    * writes land within one clock tick. */
  def slicedSource(kind: String, sfDir: String)(write: String => Seq[String]): String =
    dir(kind, sfDir) { tmp =>
      val slices = write(tmp)
      slices.zipWithIndex.foreach { case (sl, i) =>
        new java.io.File(s"$tmp/src/$sl").listFiles()
          .foreach(_.setLastModified(1700000000000L + i * 60000L))
      }
    }

  /** Row-group size (bytes) for staged SLICE writes. Slices are staged as
    * ONE file each so `maxFilesPerTrigger=1` maps micro-batches 1:1 onto
    * slices (watermark order is the whole point of the staging) — but a
    * single file with the default 128 MB row group is one unsplittable
    * scan task, which at sf10 serializes the entire per-batch decode (and
    * everything fused above it) onto one core. Small row groups keep the
    * one-file contract AND let the scan split: with [[drainTuning]]'s
    * matching `maxPartitionBytes`, a 25 MB slice fans out to ~12 tasks. */
  val sliceRowGroupBytes: Long = 2L * 1024 * 1024

  /** Stage one slice as ONE file with [[sliceRowGroupBytes]] row groups. */
  def writeSlice(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", sliceRowGroupBytes.toString)
      .parquet(path)

  /** Run a staged-source drain with scan-split and shuffle parallelism
    * sized from the actual staged bytes: tiny slices keep the low-
    * partition shape [[withShufflePartitions]] exists for (state-store
    * snapshot fan-out dominates when state is small), big slices get the
    * cores. This is the local stand-in for what a real cluster job gets
    * from dynamic allocation + file splitting — the OPERATORS are
    * partition-parallel throughout; only the drain harness needs sizing. */
  def drainTuning[A](spark: org.apache.spark.sql.SparkSession, stagedRoot: String,
                     nSlices: Int)(body: => A): A = {
    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()
    val sliceBytes = du(new java.io.File(stagedRoot, "src")) / math.max(nSlices, 1)
    val parts = math.min(32L, math.max(8L, sliceBytes / (2L * 1024 * 1024))).toInt
    val maxPart = math.min(128L * 1024 * 1024,
      math.max(1L * 1024 * 1024, sliceBytes / 32))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxPart)
    try body finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
    }
  }
}
