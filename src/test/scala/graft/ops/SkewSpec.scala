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

  test("AQE skew-join splits the hot partition at runtime (the built-in alternative to salting)") {
    // force a sort-merge join and make the skew detector's thresholds tiny,
    // so the one hot key's partition qualifies for a runtime split
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // pad rows so the hot partition's shuffle bytes clear the threshold;
      // the right side is dimension-like (one row per key) so the join
      // output stays linear and the skew lives in the LEFT hot partition
      val big = (1 to 20000).map { i =>
        (if (i % 10 == 0) s"key_${i % 7}" else "hot", "x" * 100)
      }.toDF("k", "pad")
      val right = ("hot" +: (0 to 6).map(i => s"key_$i")).zipWithIndex
        .map { case (k, i) => (k, i.toLong) }.toDF("k", "w")
      val joined = big.join(right, "k")
      // materialize THIS Dataset's own execution — AQE decides the skew
      // split from runtime shuffle stats, and only this queryExecution's
      // final plan records it
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
