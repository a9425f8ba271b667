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

  test("KMV overlap: identical groups give full overlap, disjoint give none") {
    val df = ((1 to 400).map(i => ("a", s"k$i")) ++
      (1 to 400).map(i => ("b", s"k$i")) ++            // b ≡ a
      (1 to 400).map(i => ("c", s"z$i"))).toDF("g", "w") // c disjoint
    val sk = Sketches.kmvSketch(df, col("g"), col("w"), k = 32)
    val ov = Sketches.kmvOverlap(sk, k = 32)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // a vs b: every merged hash is in both → overlap_k = 32, est_intersect = est_union
    val ab = ov(("a", "b"))
    assert(ab._4 === 32L && ab._5 === ab._3)
    // a vs c, b vs c: no shared keys → hash collision-free at 48 bits
    assert(ov(("a", "c"))._4 === 0L && ov(("a", "c"))._5 === 0L)
    assert(ov(("b", "c"))._4 === 0L && ov(("b", "c"))._5 === 0L)
  }

  test("KMV overlap: below-k groups are exact (j IS the intersection)") {
    // 20 ∪ 20 with 10 shared → union 30 < k=64: everything exact
    val df = ((1 to 20).map(i => ("a", s"k$i")) ++
      (11 to 30).map(i => ("b", s"k$i"))).toDF("g", "w")
    val ov = Sketches.kmvOverlap(
        Sketches.kmvSketch(df, col("g"), col("w"), k = 64), k = 64)
      .as[(String, String, Long, Long, Long)].collect()
    assert(ov.length === 1)
    val (ga, gb, eu, j, ei) = ov.head
    assert((ga, gb) === (("a", "b")))
    assert(eu === 30L && j === 10L && ei === 10L)
  }

  test("KMV overlap: estimated intersection tracks truth on half-overlapping sets") {
    // |A|=|B|=2000, |A∩B|=1000 → Jaccard 1/3
    val df = ((1 to 2000).map(i => ("a", s"k$i")) ++
      (1001 to 3000).map(i => ("b", s"k$i"))).toDF("g", "w")
    val ov = Sketches.kmvOverlap(
        Sketches.kmvSketch(df, col("g"), col("w"), k = 64), k = 64)
      .as[(String, String, Long, Long, Long)].collect().head
    // loose 3/sqrt(k) CLT bounds — deterministic given the fixed hash
    assert(math.abs(ov._3 - 3000L) < 1200, s"est_union ${ov._3}")
    assert(math.abs(ov._5 - 1000L) < 700, s"est_intersect ${ov._5}")
  }

  test("log-histogram: values below 16 bucket exactly; sub-bucket law above") {
    val df = (1L to 2000L).map(("g", _)).toDF("g", "v")
    val est = Sketches.logHistQuantiles(
        Sketches.logHist(df, col("g"), col("v")), Seq(0, 250, 500, 1000))
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    // q=0 → rank 0 → value 1 (< 16: exact); q=1000 → rank 1999 → 2000
    assert(est(0L) === 1L)
    // exact values: rank 499 → 500, rank 999 → 1000; both > 16 so the
    // estimate is the bucket lower bound, within one sub-bucket below
    def check(q: Long, exact: Long): Unit = {
      val e = est(q)
      val width = math.max(1L, 1L << (64 - java.lang.Long.numberOfLeadingZeros(exact) - 4))
      assert(e <= exact && exact < e + width, s"q=$q est=$e exact=$exact")
    }
    check(250L, 500L); check(500L, 1000L); check(1000L, 2000L)
  }

  test("log-histogram: merging sketches = summing counts, same quantiles") {
    val a = (1L to 1000L).map(("g", _)).toDF("g", "v")
    val b = (1001L to 2000L).map(("g", _)).toDF("g", "v")
    val whole = Sketches.logHist(a.unionByName(b), col("g"), col("v"))
    val merged = Sketches.logHist(a, col("g"), col("v"))
      .unionByName(Sketches.logHist(b, col("g"), col("v")))
      .groupBy("group", "bucket").agg(sum(col("cnt")).as("cnt"))
    val qw = Sketches.logHistQuantiles(whole, Seq(500, 990))
      .as[(String, Long, Long)].collect().toSet
    val qm = Sketches.logHistQuantiles(merged, Seq(500, 990))
      .as[(String, Long, Long)].collect().toSet
    assert(qw === qm)
    // and the merged sketch IS the whole-data sketch, bucket for bucket
    assert(merged.as[(String, Long, Long)].collect().toSet ===
      whole.as[(String, Long, Long)].collect().toSet)
  }

  test("log-histogram: bucket count stays bounded whatever the data") {
    val df = Seq.tabulate(5000)(i => ("g", (i.toLong * 2654435761L) % 1000000007L))
      .toDF("g", "v")
    val nBuckets = Sketches.logHist(df, col("g"), col("v")).count()
    assert(nBuckets <= 16 * 64, s"$nBuckets buckets")
  }
}
