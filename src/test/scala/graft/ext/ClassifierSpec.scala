package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = ((1L to 20L).map { i =>
    if (i % 2 == 0) (i, "good clean prose with spark inside it")
    else (i, "junk junk noise noise keyword stuffing")
  }).toDF("doc_id", "text")

  private def labels = corpus.select(col("doc_id").as("id"),
    array_contains(split(lower(col("text")), "\\s+"), "spark")
      .cast("double").as("y"))

  test("learns the planted signal: scoring separates the classes") {
    val feats = Classifier.hashedFeatures(corpus, col("doc_id"), col("text"), 32)
    val w = Classifier.trainLogistic(feats, labels, buckets = 32, iters = 5)
    val scored = Classifier.score(feats, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach { i =>
      if (i % 2 == 0) assert(scored(i) > 0, s"doc $i should gate in")
      else assert(scored(i) < 0, s"doc $i should gate out")
    }
  }

  test("first-round update replayed by hand (integer gradient algebra)") {
    val docs = Seq((1L, "aa bb"), (2L, "cc")).toDF("doc_id", "text")
    val lbl = Seq((1L, 1.0), (2L, 0.0)).toDF("id", "y")
    val feats = Classifier.hashedFeatures(docs, col("doc_id"), col("text"), 8)
    val w1 = Classifier.trainLogistic(feats, lbl, buckets = 8, iters = 1, lrDen = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // w0 = 0 → σ(0) = 0.5 for both docs; per-(doc, bin) gradient micro =
    // x·(y−0.5)·1e6; update = floor(g / (lrDen · N)) with N = 2 labels
    val fx = feats.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val y = Map(1L -> 1.0, 2L -> 0.0)
    val g = fx.groupBy(_._2).view.mapValues(_.map { case (id, _, x) =>
      math.round(x * (y(id) - 0.5) * 1e6)
    }.sum).toMap
    (0L to 8L).foreach { j =>
      val want = g.getOrElse(j, 0L) / 20L // truncating, like div and //
      assert(w1(j) === want, s"bin $j")
    }
  }

  test("negative gradients truncate toward zero (div ≡ DuckDB //)") {
    // single doc, y=0: gradient = 1·(0−0.5)·1e6 = −500000 on its bins;
    // update with lrDen=3, N=1: trunc(−500000/3) = −166666 (floor would
    // give −166667 — DuckDB's // truncates, so must we)
    val docs = Seq((1L, "zz")).toDF("doc_id", "text")
    val lbl = Seq((1L, 0.0)).toDF("id", "y")
    val feats = Classifier.hashedFeatures(docs, col("doc_id"), col("text"), 4)
    val w = Classifier.trainLogistic(feats, lbl, buckets = 4, iters = 1, lrDen = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(4L) === -166666L) // bias bin always fires
  }

  test("reruns are bit-identical (no RNG, no order sensitivity)") {
    val feats = Classifier.hashedFeatures(corpus, col("doc_id"), col("text"), 32)
    def run() = Classifier.trainLogistic(feats, labels, buckets = 32, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() === run())
  }

  test("docs without tokens still carry the bias feature") {
    val docs = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val feats = Classifier.hashedFeatures(docs, col("doc_id"), col("text"), 4)
    val bias = feats.filter(col("j") === 4L).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(bias === Set(1L, 2L))
  }
}
