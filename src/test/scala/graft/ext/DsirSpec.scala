package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance scoring/resampling: hand-computed micro-nat scores on a
  * tiny corpus, target-tilt ordering, and deterministic Gumbel selection.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceScores matches hand-computed add-one micro-nats") {
    // corpus: 4 tokens, V=2; target = doc 1 only (nt=2)
    // p_t(a)=(2+1)/(2+2), p_s(a)=(2+1)/(4+2) → wm(a)=round(ln(1.5)·1e6)
    // p_t(b)=(0+1)/(2+2), p_s(b)=(2+1)/(4+2) → wm(b)=round(ln(0.5)·1e6)
    val docs = Seq((1L, "a a", true), (2L, "b b", false)).toDF("id", "text", "tgt")
    val r = Dsir.importanceScores(docs, col("id"), col("text"), col("tgt"))
      .orderBy("id").collect()
    val wa = math.round(math.log(1.5) * 1e6) // 405465
    val wb = math.round(math.log(0.5) * 1e6) // -693147
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ===
      Seq((1L, 2L, 2 * wa), (2L, 2L, 2 * wb)))
  }

  test("scores tilt toward the target distribution") {
    val docs = (1L to 20L).map { i =>
      val tgt = i <= 8
      (i, if (tgt) "alpha alpha beta" else "gamma gamma beta", tgt)
    }.toDF("id", "text", "tgt")
    val scored = Dsir.importanceScores(docs, col("id"), col("text"), col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every target-looking doc outranks every source-looking doc
    assert((1L to 8L).map(scored).min > (9L to 20L).map(scored).max)
  }

  test("resample is deterministic, n-bounded, and ordered by perturbed key") {
    val docs = (1L to 50L).map(i => (i, s"w$i common tok", i % 3 == 0))
      .toDF("id", "text", "tgt")
    def run() = Dsir.resample(docs, col("id"), col("text"), col("tgt"), n = 10)
      .collect().map(_.getLong(0)).toSeq
    val a = run()
    assert(a === run()) // pure function of the corpus
    assert(a.size === 10)
    // n beyond the corpus: everything comes back
    assert(Dsir.resample(docs, col("id"), col("text"), col("tgt"), n = 99)
      .count() === 50L)
  }

  test("scoreAgainst a self-trained weightTable reproduces importanceScores") {
    val docs = (1L to 12L).map(i =>
      (i, s"tok$i shared words here", i % 2 == 0)).toDF("id", "text", "tgt")
    val wt = Dsir.weightTable(docs, col("text"), col("tgt"))
    val served = Dsir.scoreAgainst(docs, col("id"), col("text"), wt)
      .orderBy("id").collect().toSeq
    val trained = Dsir.importanceScores(docs, col("id"), col("text"), col("tgt"))
      .orderBy("id").collect().toSeq
    assert(served === trained)
  }

  test("out-of-vocabulary tokens score the unseen-floor row exactly") {
    val ref = Seq((1L, "a a", true), (2L, "b b", false)).toDF("id", "text", "tgt")
    val wt = Dsir.weightTable(ref, col("text"), col("tgt"))
    // ns=4, nt=2, V=2 → floor = round((ln(1/4) − ln(1/6))·1e6) = ln(1.5)·1e6
    val floor = math.round(math.log(1.5) * 1e6)
    val r = Dsir.scoreAgainst(Seq((9L, "novel novel novel")).toDF("id", "text"),
      col("id"), col("text"), wt).first()
    assert((r.getLong(1), r.getLong(2)) === ((3L, 3 * floor)))
  }

  test("weightTable round-trips through parquet with its unseen row") {
    val ref = Seq((1L, "a b", true), (2L, "b c", false)).toDF("id", "text", "tgt")
    val dir = java.nio.file.Files.createTempDirectory("dsirw").toString
    Dsir.weightTable(ref, col("text"), col("tgt")).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4L) // a, b, c + the "" floor row
    assert(back.filter(col("w") === Dsir.UnseenKey).count() === 1L)
  }

  test("gumbelKeyMicro derives u from the md5 bucket — exact dyadic uniform") {
    val df = Seq(7L).toDF("id")
    val b16 = df.select(TextAnalysis.hashBucket16(col("id"))).first().getLong(0)
    val u = (2.0 * b16 + 1) / 131072.0
    val expected = 1000L + math.round(-math.log(-math.log(u)) * 1e6)
    val got = df.select(Dsir.gumbelKeyMicro(col("id"), lit(1000L))).first().getLong(0)
    assert(got === expected)
  }
}
