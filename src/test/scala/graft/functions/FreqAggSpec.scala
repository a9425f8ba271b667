package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra-Gries sketch: the membership guarantee (count > n/(k+1) ⇒ in
  * sketch), survival across partition merges and serialization, and the
  * sketch→exact-verify composition. */
class FreqAggSpec extends SparkSpec {
  import spark.implicits._

  test("an item above the n/(k+1) bound always survives, across many partitions") {
    // 900 distinct rare items + 300 copies of the heavy one; k=9 → bound
    // n/(k+1) = 1200/10 = 120 < 300, so 'heavy' MUST be in the sketch
    val rows = ((1 to 900).map(i => s"rare_$i") ++ Seq.fill(300)("heavy"))
    val df = rows.toDF("item").repartition(16) // force real partial merges
    val sketch = df.agg(FreqAgg.freqSketch($"item", 9).as("sk"))
      .select(explode($"sk").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toMap
    assert(sketch.contains("heavy"))
    assert(sketch.size <= 9)
    // undercount bounded by n/(k+1)
    assert(sketch("heavy") >= 300 - 120 && sketch("heavy") <= 300)
  }

  test("sketch of fewer than k distinct items is exact") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("item")
      .repartition(4)
    val sketch = df.agg(FreqAgg.freqSketch($"item", 10).as("sk"))
      .select(explode($"sk").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toSeq
    assert(sketch === Seq(("a", 5L), ("b", 3L), ("c", 1L))) // est desc, item asc
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    val df = Seq(Some("x"), None, None).toDF("item")
    val sk = df.agg(FreqAgg.freqSketch($"item", 4).as("sk"))
      .select(size($"sk")).first().getInt(0)
    assert(sk === 1)
    val empty = Seq.empty[String].toDF("item")
      .agg(FreqAgg.freqSketch($"item", 4).as("sk"))
      .select(size($"sk")).first().getInt(0)
    assert(empty === 0)
  }

  test("sketch plans as a two-phase object aggregate (partial before the shuffle)") {
    val df = (1 to 100).map(i => s"i$i").toDF("item").repartition(4)
    val p = df.agg(FreqAgg.freqSketch($"item", 9))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_freq_sketch"), p)
  }

  test("heavyHitters rejects a minCount at/below the n/(k+1) guarantee bound") {
    val df = (1 to 1000).map(i => s"item_$i").toDF("item")
    // n=1000, k=9 → bound 100; minCount 50 would be silently unreliable
    intercept[IllegalArgumentException] {
      graft.ext.Curation.heavyHitters(df, $"item", k = 9, minCount = 50L)
    }
  }

  test("heavyHitters returns exactly the items at/above minCount when the bound holds") {
    val rows = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      (1 to 100).map(i => s"noise_$i")
    val df = rows.toDF("item").repartition(8)
    // n=180, k=17 → bound 10 < minCount 30 → guarantee applies
    val out = graft.ext.Curation.heavyHitters(df, $"item", k = 17, minCount = 30L)
      .orderBy("item").as[(String, Long)].collect().toSeq
    assert(out === Seq(("alpha", 50L), ("beta", 30L)))
  }
}
