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
}
