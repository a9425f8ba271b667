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

  test("KMV: below k the sketch IS the distinct set (exact estimate)") {
    val df = (words ++ words).map(("g", _)).toDF("g", "w")
    val sk = Sketches.kmvSketch(df, col("g"), col("w"), k = 64)
    assert(sk.count() === 4) // 4 distinct keys, duplicates collapse
    val est = Sketches.kmvEstimate(sk, k = 64).as[(String, Long)].collect().toMap
    assert(est("g") === 4L)
  }

  test("KMV: estimator replays the integer formula at k; estimate is sane") {
    val df = (1 to 2000).map(i => ("g", s"key$i")).toDF("g", "w")
    val k = 32
    val sk = Sketches.kmvSketch(df, col("g"), col("w"), k = k)
      .as[(String, Long)].collect().map(_._2).sorted
    assert(sk.length === k)
    val hk = sk.last
    val want = (k - 1).toLong * 281474976710656L / hk
    val est = Sketches.kmvEstimate(
      Seq.tabulate(k)(i => ("g", sk(i))).toDF("group", "h"), k = k)
      .as[(String, Long)].collect().toMap
    assert(est("g") === want)
    // within 3/sqrt(k) ≈ 53% of truth (loose CLT bound; typical ~18%)
    assert(math.abs(est("g") - 2000L) < 1100, s"est ${est("g")}")
  }

  test("KMV: merging sketches (k smallest of the union) equals sketching the union") {
    val a = (1 to 500).map(i => ("g", s"k$i")).toDF("g", "w")
    val b = (300 to 900).map(i => ("g", s"k$i")).toDF("g", "w")
    val direct = Sketches.kmvSketch(
        ((1 to 500) ++ (300 to 900)).map(i => ("g", s"k$i")).toDF("g", "w"),
        col("g"), col("w"), k = 16)
      .as[(String, Long)].collect().toSet
    // merge = union the sketch rows, dedup, re-take the k smallest —
    // NEVER re-hash (hashing the hashes would be a different sketch)
    val merged = Sketches.kmvSketch(a, col("g"), col("w"), k = 16)
      .unionByName(Sketches.kmvSketch(b, col("g"), col("w"), k = 16))
      .distinct()
      .orderBy("h").limit(16)
      .as[(String, Long)].collect().toSet
    assert(merged === direct)
  }
}
