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
    // candidate volume BEFORE the exact verify: Σ_vh C(cnt,2) over the
    // variant-hash buckets — the self-join's true pair volume
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("__id"), col("c_name").as("__s"))
    val s = col("__s")
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val v = base.withColumn("__v", explode(array_union(array(s), dels)))
      .select(xxhash64(col("__v")).as("__vh"))
    val cand = v.groupBy("__vh").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_variants"),
        sum(expr("c * (c - 1) div 2")).as("cand_pairs")).first()
    println(s"""X113CAND {"dir":"$dir","n_variant_rows":${cand.getLong(0)},""" +
      s""""cand_pairs":${cand.getLong(1)}}""")
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.editDistanceOnePairs(
      Tables.customer(spark, dir), col("c_custkey"), col("c_name"))
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(((col("id_a") / shift).cast("long") =!=
        (col("id_b") / shift).cast("long")).cast("long")).as("n_cross_replica"))
      .first()
    val sec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    pairs.orderBy("id_a", "id_b").write.format("noop").mode("overwrite").save()
    val secSorted = (System.nanoTime() - t1) / 1e9
    println(s"""X113COUNT {"dir":"$dir","n_pairs":${agg.getLong(0)},""" +
      s""""n_cross_replica":${agg.getLong(1)},"sec":$sec,"sec_sorted_noop":$secSorted}""")
    spark.stop()
  }
}
