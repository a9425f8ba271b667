package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(7)("gamma") ++
      Seq.fill(1)("delta")

  test("estimates never underestimate; exact when width is generous") {
    val df = words.toDF("w")
    val sketch = Sketches.countMin(df, col("w"), depth = 4, width = 512)
    val probes = Seq("alpha", "beta", "gamma", "delta", "absent").toDF("t")
    val est = Sketches.countMinEstimate(sketch, probes, col("t"), depth = 4, width = 512)
      .as[(String, Long)].collect().toMap
    // 4 distinct keys in 512 buckets × 4 rows: no collisions — exact
    assert(est == Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 7L,
      "delta" -> 1L, "absent" -> 0L))
  }

  test("width-2 collisions overestimate but never underestimate") {
    val df = words.toDF("w")
    val sketch = Sketches.countMin(df, col("w"), depth = 2, width = 2)
    val probes = words.distinct.toDF("t")
    val est = Sketches.countMinEstimate(sketch, probes, col("t"), depth = 2, width = 2)
      .as[(String, Long)].collect().toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (w, n) => assert(est(w) >= n, s"$w: ${est(w)} < $n") }
    // total mass bound: no estimate exceeds the stream length
    est.values.foreach(v => assert(v <= words.size))
  }

  test("sketch cells are depth x width at most and counts sum to depth*N") {
    val df = words.toDF("w")
    val sketch = Sketches.countMin(df, col("w"), depth = 3, width = 4)
      .as[(Long, Long, Long)].collect()
    assert(sketch.length <= 3 * 4)
    assert(sketch.map(_._3).sum == 3L * words.size)
    // every row index present exactly once per occupied bucket set
    assert(sketch.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("building on a union equals merging cell-wise (mergeability)") {
    val a = words.take(30).toDF("w")
    val b = words.drop(30).toDF("w")
    val whole = Sketches.countMin(words.toDF("w"), col("w")).as[(Long, Long, Long)]
      .collect().toSet
    val merged = Sketches.countMin(a, col("w")).unionByName(Sketches.countMin(b, col("w")))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(whole == merged)
  }
}
