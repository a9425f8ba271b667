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
}
