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

  test("knBigramNll: hand-computed Kneser-Ney arithmetic on 'a b a b a c'") {
    // bigrams (a,b)x2 (b,a)x2 (a,c)x1; C(a·)=3 C(b·)=2; N1+(a·)=2 N1+(b·)=1;
    // N1+(·b)=1 N1+(·a)=1 N1+(·c)=1; N1+(··)=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = LmScore.knBigramNll(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    def micro(p: Double): Long = math.round(-math.log(p) * 1e6)
    val pBgivenA = (2 - 0.75 + 0.75 * 2 * (1.0 / 3)) / 3
    val pAgivenB = (2 - 0.75 + 0.75 * 1 * (1.0 / 3)) / 2
    val pCgivenA = (math.max(1 - 0.75, 0) + 0.75 * 2 * (1.0 / 3)) / 3
    val want = 2 * micro(pBgivenA) + 2 * micro(pAgivenB) + micro(pCgivenA)
    assert(out === ((1L, 5L, want)))
  }

  test("knBigramNll: p(·|w1) sums to 1 over the corpus continuation vocab") {
    // interpolated KN is a proper distribution over seen continuation
    // types: Σ_w2 max(c12−D,0) = c1 − D·N1fw and Σ_w2 Pcont = 1, so the
    // per-context total is exactly 1 — replay the model counts and check
    val docs = Seq((1L, "x y x z y x w z x y w"),
      (2L, "y x y z w x x y")).toDF("doc_id", "text")
    val toks = docs.collect().flatMap(_.getString(1).split(" ")) // per doc!
    val bgs = docs.collect().flatMap(r => r.getString(1).split(" ").sliding(2)
      .map(p => (p(0), p(1))).toSeq)
    val c12 = bgs.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = bgs.groupBy(_._1).view.mapValues(_.size).toMap
    val n1fw = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    val n1pw = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val ntypes = c12.size.toDouble
    val w2s = n1pw.keySet
    for (w1 <- c1.keys) {
      val total = w2s.toSeq.map { w2 =>
        (math.max(c12.getOrElse((w1, w2), 0) - 0.75, 0.0) +
          0.75 * n1fw(w1) * (n1pw(w2) / ntypes)) / c1(w1)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $w1 sums to $total")
    }
    // and the operator agrees with the same counts on one planted bigram
    val scored = LmScore.knBigramNll(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored.keySet === Set(1L, 2L))
    assert(toks.nonEmpty) // silence unused warning paranoia
  }

  test("knBigramNll: repetitive doc scores more fluent than noise") {
    val docs = (1L to 6L).map(i => (i, "the cat sat on the mat")) :+
      (7L, "qq zz pp rr ss tt") :+ (8L, "the cat sat on the mat")
    val out = LmScore.knBigramNll(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .withColumn("avg", expr("nll_micro div n_bigrams"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("avg")).toMap
    assert(out(1L) < out(7L)) // corpus-typical text beats one-off noise
  }

  test("knBigramNll: docs with <2 tokens emit no row; empty input is empty") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = LmScore.knBigramNll(docs, col("doc_id"), col("text"))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(3L))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LmScore.knBigramNll(empty, col("doc_id"), col("text")).count() === 0L)
  }
}
