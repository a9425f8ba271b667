package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic data mixing and per-group quality curation. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample keeps a stable subset per quota; 0 drops all, 256 keeps all") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "fr")).toDF("id", "lang")
    val out = Curation.stratifiedSample(df, $"lang", $"id", Map("en" -> 0), defaultQuota = 256)
    assert(out.filter($"lang" === "en").count() === 0)
    assert(out.filter($"lang" === "fr").count() === 500)
    // determinism: same call → identical kept set
    val a = Curation.stratifiedSample(df, $"lang", $"id", Map("en" -> 64)).select("id")
    val b = Curation.stratifiedSample(df, $"lang", $"id", Map("en" -> 64)).select("id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // quota ≈ rate: 64/256 of en rows within a loose band
    val kept = a.join(df, "id").filter($"lang" === "en").count()
    assert(kept > 500 * 0.15 && kept < 500 * 0.35, s"en kept $kept of 500")
  }

  test("stratifiedSample rejects quotas outside 0..256") {
    val df = Seq((1L, "en")).toDF("id", "lang")
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(df, $"lang", $"id", Map("en" -> 300))
    }
  }

  test("topNPerGroup returns the n best per group, ties to the smallest id") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.7),
      ("b", 5L, 0.1), ("b", 6L, 0.2)
    ).toDF("g", "id", "score")
    val out = Curation.topNPerGroup(df, $"g", $"score", $"id", nTop = 2)
      .orderBy("group", "rk")
      .select("group", "rk", "id", "score")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 1L, 1L, 0.9), ("a", 2L, 2L, 0.9),
      ("b", 1L, 6L, 0.2), ("b", 2L, 5L, 0.1)))
  }

  test("topNPerGroup groups smaller than n return all their rows") {
    val df = Seq(("a", 1L, 0.3)).toDF("g", "id", "score")
    val out = Curation.topNPerGroup(df, $"g", $"score", $"id", nTop = 5).collect()
    assert(out.length === 1)
  }

  test("topNPerGroup accepts integer score columns (cast, not crash)") {
    val df = Seq(("a", 1L, 7), ("a", 2L, 9)).toDF("g", "id", "score")
    val out = Curation.topNPerGroup(df, $"g", $"score", $"id", nTop = 1)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(2L))
  }

  test("quantileNormalize ranks within each group on the bucket grid, no window in the plan") {
    // group a: 1..100 → with 10 buckets, value v ranks ⌊(v-1)/10⌋/10-ish;
    // group b shifted by 1000 must rank against ITS OWN boundaries
    val df = ((1 to 100).map(v => ("a", v.toDouble)) ++ (1 to 100).map(v => ("b", v + 1000.0)))
      .toDF("g", "s")
    val out = Curation.quantileNormalize(df, $"g", $"s", buckets = 10)
    val ranks = out.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(ranks(("a", 1.0)) === 0.0)
    assert(ranks(("a", 100.0)) === 0.9)
    assert(ranks(("b", 1001.0)) === 0.0) // own group's scale, not the global one
    assert(ranks(("b", 1100.0)) === 0.9)
    // same percentile in both groups → same rank despite disjoint ranges
    assert(ranks(("a", 55.0)) === ranks(("b", 1055.0)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("quantileNormalize: null scores and all-null groups rank null") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("c", Option.empty[Double])).toDF("g", "s")
    val out = Curation.quantileNormalize(df, $"g", $"s", buckets = 4)
      .collect().map(r => (r.getString(0), Option(r.get(1))) -> r.isNullAt(2)).toMap
    assert(out(("a", Some(1.0))) === false)
    assert(out(("a", None)) === true)
    assert(out(("c", None)) === true)
  }

  test("temperatureQuotas: alpha=1 keeps everything, alpha=0 equalizes kept counts in expectation") {
    val df = (Seq.fill(800)("en") ++ Seq.fill(200)("de") ++ Seq.fill(50)("fr"))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("lang", "id")
    val B = Curation.TemperatureBuckets.toLong
    val q1 = Curation.temperatureQuotas(df, col("lang"), alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q1.values.forall(_ === B)) // n^0 ratio = 1 for every group
    val q0 = Curation.temperatureQuotas(df, col("lang"), alpha = 0.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // r_g ∝ 1/n_g normalized to the smallest group: fr keeps all, en keeps 50/800
    assert(q0("fr") === B)
    assert(q0("en") === math.rint(50.0 / 800 * B).toLong)
    assert(q0("de") === math.rint(50.0 / 200 * B).toLong)
  }

  test("temperatureQuotas never zeroes a dominant group (quota floor of 1)") {
    // at alpha=0 and 200001:1 skew the keep-ratio rounds to 5e-6 and
    // 5e-6 * 65536 = 0.32768 rounds DOWN to 0 — without the floor the
    // dominant group gets quota 0 and temperatureSample deletes it
    // (100001:1 would round 0.65536 UP to 1 and not catch a regression)
    val skew = (Seq.fill(200001)("big") ++ Seq.fill(1)("tiny"))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("lang", "id")
    val q = Curation.temperatureQuotas(skew, col("lang"), alpha = 0.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q("big") === 1L) // floored, not zeroed
    assert(q("tiny") === Curation.TemperatureBuckets.toLong)
  }

  test("temperatureSample keeps null-group rows (null-safe quota join)") {
    val df = (Seq.fill(40)(Some("en")) ++ Seq.fill(40)(Option.empty[String]))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("lang", "id")
    val kept = Curation.temperatureSample(df, col("lang"), col("id"), alpha = 1.0)
    assert(kept.count() === 80) // alpha=1 is a no-op for EVERY group, null included
    assert(kept.filter(col("lang").isNull).count() === 40)
  }

  test("temperatureSample flattens shares and is a deterministic pure filter") {
    val df = (Seq.fill(800)("en") ++ Seq.fill(50)("fr"))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("lang", "id")
    val once = Curation.temperatureSample(df, col("lang"), col("id"), alpha = 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twice = Curation.temperatureSample(df, col("lang"), col("id"), alpha = 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once === twice) // rerun keeps the identical row set
    assert(once("fr") === 50L) // smallest group never downsampled
    // en's target ratio is sqrt(50/800) = 0.25 → kept ≈ 200 of 800 (md5 variance)
    assert(once("en") > 120L && once("en") < 280L)
    // flattening actually happened: en's share dropped toward fr's
    assert(once("en").toDouble / (once("en") + once("fr")) < 800.0 / 850.0)
  }

  // ---- epochMix --------------------------------------------------------

  private def mixDocs = (1L to 40L).map { i =>
    (if (i <= 20) "big" else if (i <= 30) "small" else "tiny", i, 10L)
  }.toDF("src", "id", "tok") // big: 200 tokens, small: 100, tiny: 100

  private def budgetOf(n: Long) = Seq(n).toDF("__budget")

  test("epochMix: cap binds, full+partial mixes, sub-availability emits partial only") {
    // budget 1000: big 50% → 500 → 2 full epochs + rem 100; small 30% →
    // 300 → 3 full epochs (cap 3 binds exactly, rem 0); tiny 5% → 50 <
    // 100 avail → partial only
    val out = Curation.epochMix(mixDocs, col("src"), col("id"), col("tok"),
      Map("big" -> 500000L, "small" -> 300000L, "tiny" -> 50000L),
      budgetOf(1000L), maxEpochs = 3)
    val agg = out.groupBy("source", "epoch")
      .agg(count(lit(1)).as("nd"), sum("tokens").as("tt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(agg(("big", 1L)) === ((20L, 200L)) && agg(("big", 2L)) === ((20L, 200L)))
    assert(agg(("big", 3L)) === ((10L, 100L)))   // partial cut exactly at 100
    assert(agg(("small", 1L)) === ((10L, 100L)) && agg(("small", 3L)) === ((10L, 100L)))
    assert(!agg.contains(("small", 4L)))          // cap bound: no partial
    assert(agg(("tiny", 1L)) === ((5L, 50L)))     // partial-only source
    assert(!agg.contains(("tiny", 2L)))
  }

  test("epochMix: partial epoch never overshoots rem and reruns are identical") {
    val docs = (1L to 50L).map(i => ("s", i, i % 7 + 1)).toDF("src", "id", "tok")
    val run = () => Curation.epochMix(docs, col("src"), col("id"), col("tok"),
      Map("s" -> 1000000L), budgetOf(300L), maxEpochs = 5)
    val a = run().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = run().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    val avail = docs.agg(sum("tok")).head.getLong(0)
    val rem = 300L - (300L / avail) * avail
    val partialTokens = run().filter(col("epoch") === 300L / avail + 1)
      .agg(coalesce(sum("tokens"), lit(0L))).head.getLong(0)
    assert(partialTokens <= rem)
  }

  test("epochMix: unweighted sources emit nothing; weights validated") {
    val out = Curation.epochMix(mixDocs, col("src"), col("id"), col("tok"),
      Map("big" -> 100000L), budgetOf(1000L), maxEpochs = 2)
    assert(out.select("source").distinct().collect().map(_.getString(0)).toSeq === Seq("big"))
    intercept[IllegalArgumentException] {
      Curation.epochMix(mixDocs, col("src"), col("id"), col("tok"),
        Map("big" -> 2000000L), budgetOf(10L), maxEpochs = 1)
    }
  }

  test("ppsSample: uniform weights pick exactly k, spread along the line") {
    val docs = (1L to 100L).map(i => ("g", i, 10L)).toDF("src", "id", "w")
    val out = Curation.ppsSample(docs, col("src"), col("id"), col("w"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 10)
    assert(out.forall(_._3 == 10L))
  }

  test("ppsSample: certainty units (w >= W/k) are always selected") {
    // one whale (60% of mass) among minnows
    val docs = (("g", 1L, 600L) +: (2L to 41L).map(i => ("g", i, 10L))).toDF("src", "id", "w")
    val out = Curation.ppsSample(docs, col("src"), col("id"), col("w"), k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(1L))
    assert(out.size <= 5) // whale spans 3 steps but is emitted once
  }

  test("ppsSample: selection replays the integer step rule exactly") {
    val docs = Seq(("g", 1L, 3L), ("g", 2L, 7L), ("g", 3L, 5L), ("g", 4L, 10L),
      ("g", 5L, 2L)).toDF("src", "id", "w")
    val k = 3
    // replay: md5 order of ids, cumulative weights, boundary crossings
    def b(id: Long): Long =
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 4), 16)
    val ordered = Seq((1L, 3L), (2L, 7L), (3L, 5L), (4L, 10L), (5L, 2L))
      .sortBy { case (id, _) => (b(id), id) }
    val wtot = ordered.map(_._2).sum
    var pre = 0L
    val want = ordered.flatMap { case (id, w) =>
      val sel = (pre + w) * k / wtot > pre * k / wtot
      pre += w
      if (sel) Some(id) else None
    }.toSet
    val got = Curation.ppsSample(docs, col("src"), col("id"), col("w"), k = k)
      .collect().map(_.getLong(1)).toSet
    assert(got === want)
  }

  test("ppsSample: per-group independence and zero/negative-weight drop") {
    val docs = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("b", 3L, 1L), ("b", 4L, 0L),
      ("b", 5L, -2L)).toDF("src", "id", "w")
    val out = Curation.ppsSample(docs, col("src"), col("id"), col("w"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out.contains(("b", 3L))) // only positive-weight row: the whole mass
    assert(!out.exists(p => p._2 == 4L || p._2 == 5L))
    assert(out.count(_._1 == "a") === 2) // both a-rows at w = W/k exactly
  }

  test("ppsSample: deterministic across reruns") {
    val docs = (1L to 57L).map(i => (s"s${i % 3}", i, (i % 13) + 1)).toDF("src", "id", "w")
    def run() = Curation.ppsSample(docs, col("src"), col("id"), col("w"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run() === run())
  }
}
