package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB posture (SURVEY §7.4):
  * hive-style partitioned writes (reads prune partitions from the path
  * tree) and bucketed+sorted tables (equi-joins on the bucket key need no
  * shuffle at all).
  */
object Layout {

  /** Partitioned parquet write — `partitionBy` columns become directory
    * levels (`.../col=value/...`); a filter on them prunes whole
    * directories at planning time (shows as PartitionFilters in explain,
    * with PartitionCount < total). */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(dir)

  /** Bucketed + sorted table write: rows are hash-bucketed on `bucketCol`
    * into `numBuckets` files per partition and sorted within each. Joins
    * and aggregations keyed on `bucketCol` between same-bucketed tables
    * reuse the layout — no Exchange in the plan. Requires the session
    * catalog (saveAsTable), which is how Spark persists bucket metadata.
    *
    * Overwrite holds ACROSS sessions: with the default in-memory catalog a
    * previous session's managed-table LOCATION survives on disk while its
    * catalog entry does not, and saveAsTable then fails with
    * LOCATION_ALREADY_EXISTS — so a stale unregistered location is removed
    * first (`table` must be a simple, default-database name). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    require(!table.contains("."), s"writeBucketed expects a simple table name, got $table")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Append new rows to an EXISTING bucketed table with the same bucket
    * spec: new files land beside the old ones per bucket (no rewrite of
    * committed data — object-store safe), and the catalog keeps the
    * bucket metadata, so bucket-pruned scans and shuffle-free joins hold
    * over base ∪ appended. Spark validates the spec against the catalog
    * and fails loudly on a mismatch. Each append adds up to one file per
    * bucket; periodic compaction (rewrite via [[writeBucketed]]) is the
    * maintenance knob when append frequency is high. */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String,
                     numBuckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Convenience: read a catalog table (bucketed layout honored). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Morton (Z-order) value of two non-negative dimension keys, each
    * already normalized to `[0, 2^bits)` — bit-interleaved so that rows
    * close in EITHER dimension are close in z. Pure column arithmetic
    * (static `bits`-term sum of shift/mask terms — codegen'd, no UDF, no
    * interpreted HOF); `bits ≤ 31` keeps the result in a long.
    *
    * This is the clustering key behind multi-dimension file skipping: a
    * single-column sort gives tight parquet min/max stats on that column
    * only, while a z-sort gives each file a bounded RECTANGLE in (a, b) —
    * filters on either dimension skip most files. The classic layout
    * technique for two-filter-column fact tables at 100 TB. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    zValueK(Seq(a, b), bits)
  }

  /** K-dimension Morton value: bit `i` of dimension `j` lands at position
    * `i·k + j`, so the 2-column [[zValue]] is exactly `zValueK(Seq(a, b))`
    * and 3-4-column clustering (the common real-world fact-table ask:
    * tenant × time × region) is the same static shift/mask sum — still
    * pure column arithmetic, still codegen'd. Each dimension must already
    * be normalized to `[0, 2^bits)`; `bits·k ≤ 63` keeps the value in a
    * long. Locality degrades gracefully with k (each file covers a
    * bounded k-rectangle whose side grows as the 1/k-th power of its row
    * range) — 2-4 dims is the useful regime, which the bound enforces
    * loosely and the caller should respect deliberately. */
  def zValueK(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    // k = 1 is the degenerate-but-useful case: the "interleave" of one
    // NORMALIZED dimension is the value itself, so OPTIMIZE ZORDER BY a
    // single column is exactly range clustering on it — tight zone maps
    // per file with no second key diluting the split. The normalization
    // precondition is LOAD-BEARING for every k, this one included:
    // values >= 2^bits are masked to their low `bits` bits and would
    // cluster by value MOD 2^bits ([[Snapshots.optimizeZorder]] min-max
    // scales its numeric dims before calling here for exactly that
    // reason — a caller passing raw columns must do the same).
    require(k >= 1, s"zValueK needs at least 1 dimension, got $k")
    require(bits >= 1 && bits * k <= 63,
      s"bits*dims must be in [1, 63] to fit a long, got $bits*$k")
    val longs = cols.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (k * i + j))
      }
    }.reduce(_ + _)
  }

  /** Z-order-clustered parquet write: range-partition on the z-value into
    * `numFiles` output files, z-sort within each, drop the helper column.
    * Each file then covers a bounded rectangle of the (a, b) plane — its
    * parquet column stats are tight in BOTH dimensions, so predicate
    * pushdown on either key skips most files (a plain sort can do this
    * for one dimension only). One shuffle (the range exchange), same cost
    * shape as any clustered write. Dimensions are min-max scaled into
    * `[0, 2^bits)` here (one extra aggregation pass), honoring
    * [[zValue]]'s normalization precondition for any input domain. */
  def zorderWrite(df: DataFrame, dir: String, a: Column, b: Column,
                  numFiles: Int, bits: Int = 16): Unit = {
    val maxZ = (1L << bits) - 1
    val r = df.agg(min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).head()
    def scale(c: Column, i: Int): Column = {
      if (r.isNullAt(2 * i)) return lit(0L)
      val (mn, mx) = (r.getDouble(2 * i), r.getDouble(2 * i + 1))
      if (!(mx > mn)) lit(0L)
      else coalesce(least(lit(maxZ), greatest(lit(0L),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(maxZ.toDouble)))),
        lit(0L))
    }
    df.withColumn("__z", zValue(scale(a, 0), scale(b, 1), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Compact a bucketed table back to ONE file per bucket — the
    * maintenance pass that [[appendBucketed]]'s scaladoc promises: each
    * append lays up to one new file beside every bucket, so a
    * daily-ingest table accretes O(appends × buckets) small files and
    * scan/open overhead grows with file count even though the data
    * doesn't. The compacted layout is written in ONE data pass under a
    * SWAP name, then swapped in with metadata-only ops (drop + rename) —
    * rewriting the target name in place would destroy the table on a
    * mid-rewrite crash, while here the original stays readable until the
    * new layout is fully committed (a crash inside the final swap leaves
    * the complete data under the swap name). Bucket metadata, pruning,
    * and shuffle-free joins are unchanged — same key, count, and sort.
    *
    * Returns (filesBefore, filesAfter) so callers can log/alert on the
    * reclaimed file count. */
  def compactBucketed(spark: SparkSession, table: String, bucketCol: String,
                      numBuckets: Int): (Long, Long) = {
    require(!table.contains("."), s"compactBucketed expects a simple table name, got $table")
    def fileCount(name: String): Long =
      spark.table(name).inputFiles.length.toLong
    val before = fileCount(table)
    val swap = s"${table}__compact_swap"
    // one task per bucket writes exactly one file: repartition(numBuckets,
    // key) is the same Murmur3 HashPartitioning the bucketed writer
    // derives bucket ids from, so every task holds exactly one bucket
    // (and if that alignment ever changed, the write would still be
    // CORRECT — just more files per bucket). Bucketed READING is disabled
    // for the rewrite's scan: the bucketed scan advertises the very
    // HashPartitioning the repartition asks for, the planner then drops
    // the exchange, and execution falls back to size-packed file splits —
    // tasks holding a mix of buckets, one file per (task, bucket) run.
    // A plain scan keeps the exchange, and the exchange restores the
    // one-bucket-per-task layout deterministically.
    val prevBucketedRead = spark.conf.get("spark.sql.sources.bucketing.enabled")
    try {
      // read-path-only flag: the bucketBy WRITE below still lays bucket
      // files and registers bucket metadata regardless
      spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
      writeBucketed(
        spark.table(table)
          .repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol)),
        swap, bucketCol, numBuckets)
    } finally spark.conf.set("spark.sql.sources.bucketing.enabled", prevBucketedRead)
    spark.sql(s"DROP TABLE IF EXISTS `$table`") // managed: drops data too
    spark.sql(s"ALTER TABLE `$swap` RENAME TO `$table`")
    (before, fileCount(table))
  }
}
