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

  test("property: rangeJoin equals the naive inequality join on random interval sets") {
    val gen = for {
      nIv <- Gen.chooseNum(1, 25)
      nPt <- Gen.chooseNum(1, 60)
      ivs <- Gen.listOfN(nIv, for {
        k <- Gen.chooseNum(0L, 2L); s <- Gen.chooseNum(0L, 5000L); len <- Gen.chooseNum(0L, 2000L)
      } yield (k, s, s + len))
      pts <- Gen.listOfN(nPt, for {
        k <- Gen.chooseNum(0L, 2L); t <- Gen.chooseNum(0L, 7000L)
      } yield (k, t))
    } yield (ivs, pts)
    samples(gen, 6).foreach { case (ivs, pts) =>
      val base = 1700000000000L
      val intervals = ivs.zipWithIndex.map { case ((k, s, e), i) =>
        (k, i.toLong, new java.sql.Timestamp(base + s), new java.sql.Timestamp(base + e))
      }.toDF("k", "iv", "s", "e")
      val points = pts.zipWithIndex.map { case ((k, t), i) =>
        (k, i.toLong, new java.sql.Timestamp(base + t))
      }.toDF("k", "pid", "t")
      val grid = ops.Temporal.rangeJoin(points, "t", intervals, "s", "e", Seq("k"), 500L * 1000)
        .select($"pid", $"iv").as[(Long, Long)].collect().sorted.toSeq
      val naive = points.join(intervals, Seq("k")).filter($"t" >= $"s" && $"t" < $"e")
        .select($"pid", $"iv").as[(Long, Long)].collect().sorted.toSeq
      assert(grid === naive, s"ivs=${ivs.size} pts=${pts.size}")
    }
  }

  test("property: Upsert.merge is idempotent and preserves the key universe") {
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.alphaStr.map(_.take(4))))
    samples(Gen.zip(rows, rows), 6).foreach { case (t, u) =>
      val target = t.toDF("k", "v")
      // merge contract: updates key-unique
      val updates = u.toDF("k", "v").dropDuplicates("k")
      val once = ops.Upsert.merge(target, updates, Seq("k"))
      val twice = ops.Upsert.merge(once, updates, Seq("k"))
      assert(once.collect().map(_.toString).sorted.toSeq === twice.collect().map(_.toString).sorted.toSeq)
      val expectedKeys = (t.map(_._1) ++ u.map(_._1)).toSet
      assert(once.select("k").distinct().as[Long].collect().toSet === expectedKeys)
    }
  }

  test("property: quantileNormalize ranks lie on the bucket grid in [0, 1)") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)), 6).foreach { vs =>
      val df = vs.map(("g", _)).toDF("g", "s")
      val ranks = ext.Curation.quantileNormalize(df, $"g", $"s", buckets = 8)
        .select("qrank").as[Double].collect()
      assert(ranks.forall(r => r >= 0.0 && r < 1.0))
      assert(ranks.forall(r => math.abs(r * 8 - math.rint(r * 8)) < 1e-12)) // grid-aligned
      // max element must sit in the top bucket once there are ≥ buckets rows
      if (vs.size >= 8) assert(ranks.max === 0.875)
    }
  }

  test("property: PSI is zero on identical snapshots and non-negative otherwise") {
    val dist = Gen.nonEmptyListOf(Gen.chooseNum(0, 4)).map(_.map(b => s"b$b"))
    samples(Gen.zip(dist, dist), 6).foreach { case (a, b) =>
      val ra = a.toDF("bucket")
      val rb = b.toDF("bucket")
      assert(ext.Drift.psi(ra, ra, $"bucket").first().getDouble(0) === 0.0)
      // PSI = Σ (p−q)·ln(p/q): every term non-negative (same sign factors)
      assert(ext.Drift.psi(ra, rb, $"bucket").first().getDouble(0) >= 0.0)
    }
  }
}
