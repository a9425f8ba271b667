package graft

import graft.ops.{Cleaning, Dedup}
import graft.ext.TextDedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties (SURVEY §5.3): cleaning idempotence,
  * dedup idempotence, clamp bounds, Jaccard range — deterministic seeds
  * (no scalatestplus bridge in the offline cache, so we sample Gen
  * directly).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong * 7919 + 1)))

  private val doubleLists = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))

  test("property: imputeMedian is idempotent (clean ∘ clean = clean)") {
    samples(Gen.nonEmptyListOf(Gen.option(Gen.chooseNum(-100.0, 100.0))), 8).foreach { vs =>
      val df = vs.toDF("v")
      val once = Cleaning.imputeMedian(df, Seq("v"))
      val twice = Cleaning.imputeMedian(once, Seq("v"))
      assert(once.collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0)).sorted.toSeq ===
        twice.collect().map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0)).sorted.toSeq)
    }
  }

  test("property: dedup is idempotent and never increases distinct rows") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(0, 5)), 8).foreach { vs =>
      val df = vs.toDF("v")
      val once = Dedup.exact(df)
      assert(Dedup.exact(once).count() === once.count())
      assert(once.count() <= df.count())
    }
  }

  test("property: clamp output always within [lo, hi]") {
    samples(doubleLists, 8).foreach { vs =>
      val out = vs.toDF("v")
        .select(Cleaning.clamp(col("v"), lit(-5.0), lit(5.0)).as("c"))
        .collect().map(_.getDouble(0))
      assert(out.forall(v => v >= -5.0 && v <= 5.0))
    }
  }

  test("property: jaccard of any two shingle sets lies in [0, 1]") {
    val words = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
    samples(Gen.zip(words, words), 8).foreach { case (t1, t2) =>
      val df = Seq((t1, t2)).toDF("a", "b")
      val j = df.select(TextDedup.jaccard(
        TextDedup.shingles(col("a"), 2), TextDedup.shingles(col("b"), 2))).first().getDouble(0)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("property: native shingles equal the HOF formulation on fuzzed strings") {
    import org.apache.spark.sql.functions._
    val chars = Gen.oneOf(('a' to 'e') ++ Seq(' ', ' ', 'Z', '0', 'ß', '中'))
    val texts = Gen.listOfN(14, chars).map(_.mkString)
    val inputs = samples(texts, 40)
    val df = inputs.toDF("text")
    val t = split(lower(col("text")), " ")
    val k = 2
    val hof = array_distinct(
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
        .otherwise(array(concat_ws(" ", t))))
    val rows = df.select(
      graft.functions.TextExprs.wordShingles(col("text"), k).as("native"), hof.as("ref")).collect()
    rows.zip(inputs).foreach { case (r, in) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), s"input='$in'")
    }
  }

  test("property: moneySum equals exact cents arithmetic") {
    samples(doubleLists, 8).foreach { vs =>
      val got = vs.toDF("v").agg(util.Det.moneySum(col("v"))).first().getDouble(0)
      val exact = vs.map(v => math.rint(v * 100).toLong).sum / 100.0
      assert(got === exact)
    }
  }

  test("property: bucketed prefix sum equals the sequential scan for any keys/buckets") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L)).map(_.distinct)
      vals <- Gen.listOfN(keys.length, Gen.chooseNum(0L, 1000L))
      buckets <- Gen.chooseNum(1, 64)
    } yield (keys, vals, buckets)
    samples(gen, 8).foreach { case (keys, vals, buckets) =>
      val df = keys.zip(vals).toDF("k", "v")
      val got = graft.ops.PrefixSum.exclusivePrefixSum(df, "k", "v", "cum", buckets)
        .orderBy("k").select("cum").as[Long].collect().toSeq
      val expected = keys.zip(vals).sortBy(_._1).map(_._2).scanLeft(0L)(_ + _).init
      assert(got === expected, s"buckets=$buckets n=${keys.length}")
    }
  }
}
