package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
