package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data EXPORT: deterministic global shuffle + exact equal-size
  * shards — the last step of a corpus pipeline before a trainer reads it.
  * Training wants the corpus in a reproducible pseudo-random order (no
  * source/time clustering in a batch), cut into shards whose sizes differ
  * by at most one row (stragglers in a data-parallel loader are set by the
  * LARGEST shard).
  *
  * Shuffle order is md5(seed ∥ id) — cross-engine reproducible (any SQL
  * engine has md5; changing `seed` is a fresh epoch permutation), ties
  * broken by id so the order is total even on a hash collision. The exact
  * global rank uses the same two-phase shape as [[graft.ops.PrefixSum]]
  * (rank within 256 fixed hash-prefix buckets + each bucket's starting
  * offset from a 256-row cumsum — bucket order IS hash order because the
  * bucket is the hash's leading byte), so there is NO unpartitioned
  * global window over data rows: the classic `row_number() OVER (ORDER BY
  * hash)` one-task bottleneck is exactly what this replaces at 100 TB.
  * Shards are assigned round-robin on rank (`rank % n`), which is what
  * makes sizes exact — a range cut of sampled hash boundaries
  * (`repartitionByRange`) would be approximate and nondeterministic.
  */
object Export {

  /** Adds `shard` (0..nShards-1, sizes within one row of each other) and
    * `rank` (the exact position in the seeded shuffle order). */
  def shuffleShards(df: DataFrame, id: Column, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hx = md5(concat(lit(seed), id.cast("string")))
    // leading byte of the hash: 256 equal-probability buckets, fixed ahead
    // of time — no min/max pre-scan, and lexicographic hex order within
    // and across buckets is total hash order
    val withH = df.withColumn("__hx", hx)
      .withColumn("__bkt", conv(substring(col("__hx"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy("__bkt").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bkt"), col("__off"))
    val local = Window.partitionBy("__bkt").orderBy(col("__hx"), id)
    withH.join(broadcast(offsets), "__bkt")
      .withColumn("rank", row_number().over(local).cast("long") - 1L + col("__off"))
      .withColumn("shard", pmod(col("rank"), lit(nShards.toLong)))
      .drop("__hx", "__bkt", "__off")
  }

  /** Write the shuffled corpus as `dir/shard=<i>/...` with at most
    * `maxRecordsPerFile` rows per file — shard directories a data-parallel
    * loader maps to workers, file sizes bounded so a single file never
    * dominates a read task. Rows are written in shuffle order within each
    * shard (sortWithinPartitions on rank after repartitioning by shard —
    * one shuffle, no global sort). */
  def writeShards(sharded: DataFrame, dir: String, nShards: Int,
                  maxRecordsPerFile: Long = 1000000L): Unit =
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "rank")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(dir)
}
