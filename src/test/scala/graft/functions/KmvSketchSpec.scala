package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct-value sample ([[KmvValues]]): the single-pass histogram
  * primitive — exact below k, uniform distinct-sample above it, bounded
  * buffers through partial aggregation. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("NDV below k: the sketch holds every distinct value exactly once") {
    // heavy duplication: 20 distinct values across 100k rows, 8 partitions
    // (so partial buffers MERGE) — duplicates must not occupy extra slots
    val df = spark.range(100000).select((col("id") % 20).cast("double").as("v"))
      .repartition(8)
    val got = df.agg(KmvSketch.kmvValues(col("v"), 1024)).as[Seq[Double]]
      .head().sorted
    assert(got === (0 until 20).map(_.toDouble))
  }

  test("NDV above k: exactly k values, a uniform sample of the distinct set") {
    val df = spark.range(100000).select(col("id").cast("double").as("v"))
      .repartition(8)
    val got = df.agg(KmvSketch.kmvValues(col("v"), 512)).as[Seq[Double]].head()
    assert(got.size === 512)
    assert(got.distinct.size === 512)
    // uniformity smoke check: the sample's share below the true median
    // should be near 1/2 (binomial, ~±3σ = ±0.066)
    val below = got.count(_ < 50000.0).toDouble / got.size
    assert(below > 0.4 && below < 0.6, s"below-median share $below")
  }

  test("range estimate from the sample tracks the true range NDV") {
    // 10k distinct values uniform on [0, 10k); estimate NDV in [0, 1000)
    val df = spark.range(10000).select(col("id").cast("double").as("v"))
      .repartition(4)
    val sample = df.agg(KmvSketch.kmvValues(col("v"), 1000)).as[Seq[Double]].head()
    val est = 10000.0 * sample.count(_ < 1000.0) / sample.size
    assert(est > 600 && est < 1400, s"range-ndv estimate $est for true 1000")
  }

  test("nulls are skipped; 0.0 and -0.0 occupy one slot") {
    val df = Seq(Some(0.0), Some(-0.0), None, Some(1.0), None)
      .toDF("v").repartition(2)
    val got = df.agg(KmvSketch.kmvValues(col("v"), 16)).as[Seq[Double]]
      .head().sorted
    assert(got === Seq(0.0, 1.0))
  }
}
