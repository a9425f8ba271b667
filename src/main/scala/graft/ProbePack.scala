package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the ProbeMor pattern): greedy-packing scale law.
  * [[graft.ext.Packing.packGreedy]]'s fold is sequential ONLY within a
  * shard; shards pack in parallel, so wall time should grow ~linearly
  * with rows at fixed shard count (each shard's stream grows 10× per SF
  * step) and the output invariants (every doc exactly once, no multi-doc
  * bin above capacity) hold at every size.
  *
  *   sbt "runMain graft.ProbePack benchdata/sf1"
  */
object ProbePack {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("benchdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, d, "documents")
    val s0 = System.nanoTime()
    val out = graft.ext.Packing.packGreedy(docs, col("doc_id"),
      size(split(col("text"), " ", -1)), capacity = 512L, shards = 32)
    val stats = out.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("m"))
      .agg(count(lit(1)).as("bins"), sum("m").as("docs"),
        max(when(col("m") > 1, col("fill")).otherwise(0L)).as("max_multi_fill"))
      .first()
    val e = (System.nanoTime() - s0) / 1e9
    println(f"[probe-pack] $d: ${e}%.2f s, docs=${stats.getLong(1)}, " +
      f"bins=${stats.getLong(0)}, max multi-doc fill=${stats.getLong(2)} (cap 512)")
    spark.stop()
  }
}
