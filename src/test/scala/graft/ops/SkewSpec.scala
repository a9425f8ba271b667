package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting is semantically invisible: salted results must equal the plain
  * shuffle results exactly, while spreading hot keys over many reducers.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) s"key_${i % 7}" else "hot", i.toDouble)
  }.toDF("k", "v")

  test("saltedSumCount equals the unsalted aggregation exactly") {
    val expected = skewed.groupBy("k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = Skew.saltedSumCount(skewed, Seq($"k"), $"v", saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("saltedJoin equals the plain equi-join exactly (no row lost or duplicated)") {
    val small = Seq(("hot", "H"), ("key_1", "K1"), ("key_3", "K3")).toDF("k", "label")
    val expected = skewed.join(small, "k")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val got = Skew.saltedJoin(skewed, small, "k", saltBuckets = 8)
      .select("k", "v", "label")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(got === expected)
  }

  test("salted partial state is actually spread (more than one salt per hot key)") {
    val salted = skewed.withColumn("__salt", pmod(monotonically_increasing_id(), lit(16)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(salted > 1)
  }
}
