package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * One normalization quirk: `events.ts` arrives in whatever physical shape
  * the data generator chose, and that shape has CHANGED across rounds —
  * so the loader normalizes every observed variant to session-zone
  * TimestampType (every session in this repo pins UTC):
  *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *     ([PARQUET_TYPE_ILLEGAL]); read with
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  *     Verify/Bench/tests) and convert nanos → micros with exact integer
  *     arithmetic (`DIV 1000`, no double round-trip);
  *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
  *     TIMESTAMP_NTZ — cast to TimestampType (the UTC session makes the
  *     wall-clock reading the same instant the nanos shape produced);
  *   - TimestampType: already the target.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      // settable at runtime; defensive for sessions not built by Verify/Bench
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events") df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
