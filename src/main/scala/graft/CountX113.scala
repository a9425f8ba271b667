package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: count x113 (edit-distance-1 fuzzy join) output
  * pairs at a given sf dir, split into intra- vs cross-replica pairs, and
  * time the full query — the BASELINE.md §C measurement that decides
  * whether the 12.4× sf1→sf10 step is output-shaped (pairs grow
  * quadratically in the replica count via the generator's one-digit
  * replica naming) or plan-shaped. Delete after the round's record.
  */
object CountX113 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("benchdata/sf1")
    val shift = args.lift(1).map(_.toLong).getOrElse(100000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.editDistanceOnePairs(
      Tables.customer(spark, dir), col("c_custkey"), col("c_name"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(((col("id_a") / shift).cast("long") =!=
        (col("id_b") / shift).cast("long")).cast("long")).as("n_cross_replica"))
      .first()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""X113COUNT {"dir":"$dir","n_pairs":${agg.getLong(0)},""" +
      s""""n_cross_replica":${agg.getLong(1)},"sec":$sec}""")
    spark.stop()
  }
}
