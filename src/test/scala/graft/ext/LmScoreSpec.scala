package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring: add-one smoothing arithmetic, degenerate-vs-
  * fluent ranking, held-out scoring of unseen bigrams, edge docs.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checkable corpus: exact smoothed bigram arithmetic") {
    // corpus: "a b" and "a b a" → bigrams: (a,b)×2, (b,a)×1; C(a)=2, C(b)=1; V=2
    val docs = Seq((1L, "a b"), (2L, "a b a")).toDF("doc_id", "text")
    val out = LmScore.bigramNll(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    val pAB = (2.0 + 1.0) / (2.0 + 2.0) // (C(a,b)+1)/(C(a)+V)
    val pBA = (1.0 + 1.0) / (1.0 + 2.0)
    def micro(p: Double) = math.rint(-math.log(p) * 1e6).toLong
    assert(out(0).getLong(1) === 1L)
    assert(out(0).getLong(2) === micro(pAB))
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getLong(2) === micro(pAB) + micro(pBA))
  }

  test("degenerate repetition scores more probable than fluent text (the filter signal)") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog")
    ).toDF("doc_id", "text")
    val r = LmScore.bigramNll(docs, col("doc_id"), col("text"))
      .withColumn("avg_nll", col("nll_micro") / col("n_bigrams"))
      .orderBy("id").collect()
    // per-bigram NLL of pure repetition is far below varied text
    assert(r(0).getDouble(3) < r(1).getDouble(3) / 2)
  }

  test("held-out model: unseen bigrams get the smoothing floor, not a crash") {
    val train = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val score = Seq((9L, "c d")).toDF("doc_id", "text")
    val r = LmScore.bigramNll(score, col("doc_id"), col("text"), train = Some(train))
      .first()
    // unseen context: p = (0+1)/(0+V), V=2 → NLL = ln 2
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === math.rint(math.log(2.0) * 1e6).toLong)
  }

  test("docs with fewer than two tokens emit no row; empty tokens dropped") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "  a   b  ")).toDF("doc_id", "text")
    val out = LmScore.bigramNll(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L))
    assert(out(0).getLong(1) === 1L) // whitespace runs collapse → one bigram
  }
}
