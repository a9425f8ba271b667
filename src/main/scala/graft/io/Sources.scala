package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scan-side operators (SURVEY §2.1 S1-S3/S9, §2.2 P1-P4).
  *
  * The reference downloads each S3 object to a temp file and reads it with
  * pyarrow one at a time (`data_processing.py:603-611`); here a single
  * `spark.read.parquet(paths: _*)` scans everything in place with the
  * vectorized reader — predicate pushdown and column pruning reach the
  * footer, so a filtered 2-column query reads only those pages.
  */
object Sources {

  /** S1 — schema-enforced parquet scan over many files/dirs. */
  def parquet(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).parquet(paths: _*)

  /** JSON-lines scan, schema-enforced (no inference pass — an inference
    * scan over 100 TB of JSONL is a full extra read). */
  def jsonl(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).json(paths: _*)

  /** ORC scan (vectorized; schema optional — ORC is self-describing). */
  def orc(spark: SparkSession, paths: String*): DataFrame =
    spark.read.orc(paths: _*)

  /** P1 — filename pattern predicate on a path/filename column
    * (`'yellow_tripdata_' in key and key.endswith('.parquet')`,
    * `DP:293-297`). */
  def filenamePatternFilter(c: Column, infix: String, suffix: String): Column =
    c.contains(infix) && c.endsWith(suffix)

  /** P3 — extract (year, month) from a `name_YYYY-MM.ext` filename
    * (`DP:15-25`); null when the pattern doesn't match. */
  def yearFromFilename(c: Column, stem: String = "yellow_tripdata"): Column =
    nullif(regexp_extract(c, s"${stem}_(\\d{4})-(\\d{2})\\.parquet", 1), lit("")).cast("int")

  def monthFromFilename(c: Column, stem: String = "yellow_tripdata"): Column =
    nullif(regexp_extract(c, s"${stem}_(\\d{4})-(\\d{2})\\.parquet", 2), lit("")).cast("int")

  /** Basename of a path column (`os.path.basename`, `DP:217`). */
  def basename(c: Column): Column = element_at(split(c, "/"), -1)

  /** P4 — filename-vs-data validation (`DP:27-71`): rows whose event-time
    * year/month disagree with the year/month encoded in the file they came
    * from are dropped. `fileCol` is typically `input_file_name()`.
    * A file whose basename does NOT parse as `stem_YYYY-MM.parquet` passes
    * through unfiltered — the reference returns the frame unchanged when it
    * can't extract year/month (`DP:27-33`); an equality against the null
    * extraction would otherwise silently drop every row of such a file. */
  def validateAgainstFilename(df: DataFrame, ts: Column, fileCol: Column,
                              stem: String = "yellow_tripdata"): DataFrame = {
    val base = basename(fileCol)
    df.filter(yearFromFilename(base, stem).isNull ||
      (year(ts) === yearFromFilename(base, stem) &&
        month(ts) === monthFromFilename(base, stem)))
  }

  /** P4's mismatch *report* (`DP:51-64`): count + distinct offending
    * years/months of the rows the validation filter would drop (rows from
    * unparseable filenames are never mismatches — they pass through). */
  def mismatchReport(df: DataFrame, ts: Column, fileCol: Column,
                     stem: String = "yellow_tripdata"): DataFrame = {
    val base = basename(fileCol)
    df.filter(yearFromFilename(base, stem).isNotNull &&
        !(year(ts) === yearFromFilename(base, stem) &&
          month(ts) === monthFromFilename(base, stem)))
      .agg(count(lit(1)).as("n_mismatched"),
        sort_array(collect_set(year(ts))).as("bad_years"),
        sort_array(collect_set(month(ts))).as("bad_months"))
  }
}
