package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TF-IDF semantics: smoothed idf, per-doc term frequency, deterministic
  * (rounded-score, term-asc) ranking, heap-bounded plan shape. */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry durian")
  ).toDF("doc_id", "text")

  test("termScores computes smoothed tf x idf, rounded to 4 dp") {
    val out = Tfidf.termScores(corpus, $"doc_id", $"text")
      .as[(Long, String, Double)].collect()
      .map { case (id, t, s) => (id, t) -> s }.toMap
    def expected(tf: Long, df: Long): Double =
      math.rint(tf * (math.log(4.0 / (df + 1.0)) + 1.0) * 10000) / 10000
    // apple: df=1 → idf ln(4/2)+1; appears twice in doc 1
    assert(out((1L, "apple")) === expected(2, 1))
    assert(out((1L, "banana")) === expected(1, 2))
    assert(out((3L, "cherry")) === expected(2, 2))
    assert(out((3L, "durian")) === expected(1, 1))
    assert(out.size === 6) // one row per (doc, distinct term)
  }

  test("topKeywords ranks by score desc then term asc, cut at nTop") {
    val top = Tfidf.topKeywords(corpus, $"doc_id", $"text", nTop = 1)
      .select($"id", $"term").as[(Long, String)].collect().toMap
    // doc 1: apple (tf 2, df 1) beats banana; doc 3: cherry tf2 beats durian?
    // cherry: 2*(ln(4/3)+1)=2.5754; durian: 1*(ln(4/2)+1)=1.6931 → cherry
    assert(top(1L) === "apple")
    assert(top(3L) === "cherry")
    // doc 2: banana vs cherry both tf=1, df=2 → equal score, term asc wins
    assert(top(2L) === "banana")
  }

  test("plan has no per-doc Window and the corpus size joins as a broadcast") {
    val plan = Tfidf.topKeywords(corpus, $"doc_id", $"text", nTop = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
