package graft.ops

import graft.SparkSpec
import graft.util.Det
import org.apache.spark.sql.functions._

/** SURVEY §2.3/§2.4/§2.7 — dedup family, anti/semi joins, metric rollups,
  * and the Det fixed-point aggregate convention.
  */
class DedupMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("DD1 latestPerKey keeps the max-ord row with deterministic tie-break") {
    val df = Seq(
      ("a", 1L, "old"), ("a", 5L, "new"),
      ("b", 3L, "x1"), ("b", 3L, "x2") // tie on ord → tieBreak (payload desc)
    ).toDF("k", "ord", "payload")
    val out = Dedup.latestPerKey(df, Seq($"k"), $"ord", $"payload")
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("a", "new"), ("b", "x2")))
  }

  test("DD2 exact dedup is null-safe (null == null like pandas)") {
    val df = Seq(Some(1), None, None, Some(1)).toDF("v")
    assert(Dedup.exact(df).count() === 2)
  }

  test("DD2 exactByKey keeps the min-keep row per key") {
    val df = Seq(("k", 2, "second"), ("k", 1, "first")).toDF("k", "ord", "v")
    val out = Dedup.exactByKey(df, Seq($"k"), $"ord")
    assert(out.first().getString(2) === "first")
  }

  test("J1 antiJoin keeps only unmatched left rows") {
    val left = Seq(1, 2, 3).toDF("id")
    val right = Seq(2).toDF("rid")
    val out = Dedup.antiJoin(left, right, $"id" === $"rid")
    assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 3))
  }

  test("semiJoin keeps only matched left rows, no duplication from multi-match") {
    val left = Seq(1, 2).toDF("id")
    val right = Seq(2, 2, 2).toDF("rid")
    val out = Dedup.semiJoin(left, right, $"id" === $"rid")
    assert(out.collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("Det.moneySum is exact in cents; moneyAvg matches integer half-up at 1e-4") {
    // 0.1 + 0.2 in doubles is 0.30000000000000004; cents arithmetic is exact
    val df = Seq(0.1, 0.2).toDF("v")
    val r = df.agg(Det.moneySum($"v"), Det.moneyAvg($"v")).first()
    assert(r.getDouble(0) === 0.3)
    assert(r.getDouble(1) === 0.15)
    // avg of {0.01, 0.02} = 0.015 exactly on the 1e-4 grid
    val r2 = Seq(0.01, 0.02).toDF("v").agg(Det.moneyAvg($"v")).first()
    assert(r2.getDouble(0) === 0.015)
  }

  test("A1 performance rollup: count/sum/avg/median per key") {
    val df = Seq(("a", 10.0, 5.0), ("a", 20.0, 15.0), ("b", 7.0, 1.0))
      .toDF("k", "value", "dur")
    val out = Metrics.performance(df, $"k", $"value", $"dur").orderBy("k").collect()
    val a = out(0)
    assert(a.getLong(1) === 2L)            // trip_count
    assert(a.getDouble(2) === 30.0)        // total_value
    assert(a.getDouble(3) === 15.0)        // avg_value
    assert(a.getDouble(4) === 15.0)        // median_value
    assert(a.getDouble(5) === 10.0)        // avg_duration
  }

  test("approx_count_distinct (HLL) lands within 5% of exact at 50k keys") {
    val df = (1 to 50000).map(i => i % 9173).toDF("v")
    val r = df.agg(countDistinct($"v"), approx_count_distinct($"v")).first()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("A6 distinctSorted returns ordered distinct values") {
    val df = Seq("b", "a", "b", "c").toDF("v")
    assert(Metrics.distinctSorted(df, $"v").collect().map(_.getString(0)).toSeq ===
      Seq("a", "b", "c"))
  }

  test("pearsonExact: perfect / inverse / independent signals, null on zero variance") {
    def corrOf(rows: Seq[(Double, Double)]): Option[Double] = {
      val r = Metrics.pearsonExact(rows.toDF("x", "y"), $"x", $"y", Seq(lit(1).as("g")))
        .select("corr").first()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    assert(corrOf(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0))) === Some(1.0))
    assert(corrOf(Seq((1.0, 6.0), (2.0, 4.0), (3.0, 2.0))) === Some(-1.0))
    assert(corrOf(Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0))) === None) // y constant
    // matches the builtin double-path corr to well beyond its own noise
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val builtin = rows.toDF("x", "y").agg(corr($"x", $"y")).first().getDouble(0)
    val ours = corrOf(rows).get
    assert(math.abs(builtin - ours) < 1e-4, s"builtin=$builtin ours=$ours")
  }

  test("mergeAggregates: merged partial rollups equal the from-scratch rollup") {
    val raw = (1L to 100L).map(i => (if (i % 3 == 0) "a" else "b", i, i * 2))
      .toDF("g", "v", "w")
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), min($"w").as("mn"), max($"w").as("mx"))
    val parts = Seq(raw.filter($"v" <= 40), raw.filter($"v" > 40 && $"v" <= 80), raw.filter($"v" > 80))
    val merged = Metrics.mergeAggregates(parts.map(rollup), Seq("g"),
        Seq("n" -> "count", "sv" -> "sum", "mn" -> "min", "mx" -> "max"))
      .orderBy("g").collect().map(_.toString)
    val scratch = rollup(raw).orderBy("g").collect().map(_.toString)
    assert(merged.toSeq === scratch.toSeq)
  }

  test("mergeAggregates rejects non-decomposable measures loudly") {
    val r = Seq(("a", 1L)).toDF("g", "avg_v")
    intercept[IllegalArgumentException] {
      Metrics.mergeAggregates(Seq(r), Seq("g"), Seq("avg_v" -> "avg"))
    }
  }

  test("pearsonExact excludes rows with a null on either side (pairwise complete)") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(1.0)), (Some(2.0), Some(2.0)), (Some(3.0), None), (None, Some(9.0))
    ).toDF("x", "y")
    val r = Metrics.pearsonExact(df, $"x", $"y", Seq(lit(1).as("g")))
      .select("corr").first().getDouble(0)
    assert(r === 1.0) // only the two complete pairs count
  }

  test("editDistanceOnePairs finds substitution, insertion and exact pairs — misses nothing at ed≤1") {
    val df = Seq(
      (1L, "martha"),
      (2L, "marhta"),  // transposition: ed 2 → NOT a pair
      (3L, "marta"),   // deletion of 'h' from martha: ed 1
      (4L, "martha"),  // exact dup: ed 0
      (5L, "msrtha"),  // substitution: ed 1
      (6L, "zebra")    // unrelated
    ).toDF("id", "name")
    val out = Dedup.editDistanceOnePairs(df, $"id", $"name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // ed≤1 pairs of 'marta': martha(1), marhta(2) (both one deletion
    // away), martha(4); of msrtha: martha(1),(4)
    assert(out.keySet ===
      Set((1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(out((1L, 4L)) === 0L)
    assert(out((1L, 3L)) === 1L)
    assert(out((1L, 5L)) === 1L)
  }

  test("editDistanceOnePairs candidates come from an equi-join — no cartesian in the plan") {
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val p = Dedup.editDistanceOnePairs(df, $"id", $"name")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
