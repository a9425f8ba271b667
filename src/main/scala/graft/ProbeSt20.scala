package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (the CountX113 pattern): candidate-pair counts for
  * st20's semantic-dedup workload at a given sf dir — proves whether the
  * gate's WORK scales linearly with the corpus (cell counts growing with
  * the data keep per-cell occupancy flat) before any timing claim is made
  * about the st20 curve. Prints, per micro-batch: batch rows, probed-cell
  * count, within-batch candidate pairs Σ_cell C(b_c, 2)-ordered, and
  * history candidates Σ_cell b_c · h_c.
  *
  *   sbt "runMain graft.ProbeSt20 benchdata/sf10"
  */
object ProbeSt20 {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("benchdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, d, "embeddings").select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val nlist = math.max(16L, math.min(16384L, n / 500)).toInt
    val centroids = graft.ext.Similarity.kmeansCentroids(emb, nlist)
    def cells(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
          graft.ext.Similarity.toDouble(col("embedding")).as("__v"))
        .withColumn("__cell", explode(
          graft.functions.VectorExprs.nearestCentroids(col("__v"), centroids, 2)))
        .select(col("vec_id"), col("__cell"))
    // st20's batch structure: three vec_id % 3 slices (the planted twins
    // change counts by ~20 rows — irrelevant to the scaling shape)
    var hist = Seq.empty[(Int, Long)] // (cell, kept count) — approximated by all rows
    (0 until 3).foreach { r =>
      val b = cells(emb.filter(col("vec_id") % 3 === r))
        .groupBy("__cell").agg(count(lit(1)).as("b"))
        .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      val within = b.valuesIterator.map(c => c * (c - 1) / 2).sum
      val hm = hist.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val cross = b.iterator.map { case (c, bc) => bc * hm.getOrElse(c, 0L) }.sum
      println(s"[probe-st20] sf=$d batch=$r rows=${b.values.sum} cells=${b.size} " +
        s"nlist=$nlist withinPairs=$within histPairs=$cross")
      hist = hist ++ b.toSeq
    }
    spark.stop()
  }
}
