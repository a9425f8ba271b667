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

  test("perplexityBuckets cuts at 1/3 and 2/3 of cumulative token mass") {
    // nine equal-mass docs (23 bigrams each) spanning fluent → junk: with
    // equal masses the token-mass thirds are exactly 3/3/3 docs, and the
    // per-bigram scores must ascend head → middle → tail
    val fluent = (1L to 3L).map(i => (i, "the cat sat on the mat " * 4))
    val mid = (4L to 6L).map(i => (i, s"the cat ran far away now x$i y$i z$i a$i b$i c$i " * 2))
    val junk = (7L to 9L).map(i => (i, s"q$i w$i e$i r$i t$i u$i j$i s$i d$i f$i g$i h$i " * 2))
    val docs = (fluent ++ mid ++ junk).toDF("doc_id", "text")
    val out = LmScore.perplexityBuckets(docs, col("doc_id"), col("text"))
      .orderBy("id").collect()
    assert(out.length === 9)
    assert(out.forall(_.getLong(1) === 23L)) // equal mass by construction
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(r => r.getLong(0) -> r.getAs[Long]("avg_micro"))).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket.values.forall(_.length === 3))
    // scores ascend across the cut points; identical fluent docs rank first
    assert(byBucket("head").map(_._2).max <= byBucket("middle").map(_._2).min)
    assert(byBucket("middle").map(_._2).max <= byBucket("tail").map(_._2).min)
    assert(byBucket("head").map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("perplexityBuckets: cumulative rule replayed exactly on a hand case") {
    // token masses in ascending score order decide the cut, not doc count
    val docs = Seq(
      (1L, "a a a a a a a a a a a a a a a a a a a a a"), // 20 bigrams, fluent
      (2L, "a b c d"),                                   // 3 bigrams
      (3L, "z y x w v u t s r q p o n m")                // 13 bigrams
    ).toDF("doc_id", "text")
    val out = LmScore.perplexityBuckets(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    // total 36; doc1 cum 20 → 60 > 36 → not head; 60 ≤ 72 → middle
    assert(out(1L) === "middle")
    // remaining docs (higher score) must be tail
    assert(out(2L) === "tail" && out(3L) === "tail")
  }
}
