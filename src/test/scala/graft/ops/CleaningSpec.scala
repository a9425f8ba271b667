package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SURVEY §2.5 cleaning semantics: two-pass global-aggregate
  * rewrites, pandas-parity medians/modes, cap-includes-outliers, and the
  * impute→dedup→cap→fix→remove ordering (§7.5.2).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("C1 imputeMedian uses the exact interpolating median, nulls excluded") {
    // values 1,2,3,100 → median = 2.5 (interpolated), nulls not counted
    val df = Seq(Some(1.0), Some(2.0), None, Some(3.0), Some(100.0)).toDF("v")
    val out = Cleaning.imputeMedian(df, Seq("v"))
    assert(out.filter($"v" === 2.5).count() === 1)
    assert(out.filter($"v".isNull).count() === 0)
  }

  test("C1 imputeMedian leaves an all-null column untouched") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    assert(Cleaning.imputeMedian(df, Seq("v")).filter($"v".isNull).count() === 2)
  }

  test("C1 imputeMedian skips absent columns") {
    val df = Seq(1.0).toDF("v")
    assert(Cleaning.imputeMedian(df, Seq("nope")).collect().map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("C2 imputeMode breaks count ties by smallest value (pandas mode()[0])") {
    // 5 and 7 both appear twice → pandas mode picks 5
    val df = Seq(Some(5), Some(5), Some(7), Some(7), None).toDF("v")
    val out = Cleaning.imputeMode(df, Seq("v"))
    assert(out.filter($"v" === 5).count() === 3)
  }

  test("C2 imputeMode leaves an all-null column untouched (DP:100 notna().any() guard)") {
    // the reference SKIPS imputation when a column has no non-null values —
    // its 'Unknown' branch is dead code; nulls must survive, and the column
    // type (here tinyint, like RatecodeID/payment_type) must not widen
    val df = Seq[Option[Byte]](None, None).toDF("v")
    val out = Cleaning.imputeMode(df, Seq("v"))
    assert(out.filter($"v".isNull).count() === 2)
    assert(out.schema("v").dataType === org.apache.spark.sql.types.ByteType)
  }

  test("C3 imputeConstant fills only nulls") {
    val df = Seq(Some(3), None).toDF("v")
    val out = Cleaning.imputeConstant(df, Seq("v"), 0)
    assert(out.orderBy($"v").collect().map(_.getInt(0)).toSeq === Seq(0, 3))
  }

  test("C4 quantileCap computes the quantile INCLUDING the outliers (DP:126-134)") {
    // p99 over all 101 values 0..100 is 100*0.99 = 99.0 — outlier included
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val out = Cleaning.quantileCap(df, "v", bad = $"v" > 99.0, basis = $"v", q = 0.99)
    assert(out.agg(max($"v")).first().getDouble(0) === 99.0)
  }

  test("C5 quantileCap with a filtered basis (fare p99 over non-negative subset)") {
    val df = Seq(-50.0, 1.0, 2.0, 3.0, 1000.0).toDF("v")
    // basis = non-negative values only: {1,2,3,1000}; p99 = interpolated near 1000
    val out = Cleaning.quantileCap(df, "v",
      bad = $"v" < 0 || $"v" > 500, basis = when($"v" >= 0, $"v"), q = 0.5)
    // median of {1,2,3,1000} = 2.5; both -50 and 1000 become 2.5
    assert(out.filter($"v" === 2.5).count() === 2)
  }

  test("C6 clamp bounds both ends and passes nulls through") {
    val df = Seq(Some(-5), Some(3), Some(99), None).toDF("v")
    val out = df.select(Cleaning.clamp($"v", lit(1), lit(6)).as("v"))
    assert(out.filter($"v".isNull).count() === 1)
    assert(out.filter($"v" === 1).count() === 1) // -5 → 1
    assert(out.filter($"v" === 6).count() === 1) // 99 → 6
    assert(out.filter($"v" === 3).count() === 1) // in range, unchanged
  }

  test("C7 consistencyRewrite only fires beyond the tolerance") {
    val df = Seq((10.0, 10.05), (10.0, 10.2)).toDF("computed", "reported")
    val out = df.select(Cleaning.consistencyRewrite($"reported", $"computed", 0.1).as("v"))
    assert(out.orderBy($"v").collect().map(_.getDouble(0)).toSeq === Seq(10.0, 10.05))
  }

  test("C8 repairOrder rewrites only inverted intervals (end := start + 5 min)") {
    val df = Seq(
      ("2024-01-01 10:00:00", "2024-01-01 09:00:00"), // inverted
      ("2024-01-01 10:00:00", "2024-01-01 11:00:00")  // fine
    ).toDF("s", "e").select(to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))
    val out = df.select(date_format(
      Cleaning.repairOrder($"s", $"e", "5 MINUTES"), "HH:mm").as("e"))
    assert(out.orderBy($"e").collect().map(_.getString(0)).toSeq === Seq("10:05", "11:00"))
  }

  test("§7.5.2 cleaning order: median computed pre-dedup includes duplicate rows") {
    // with dups {1,1,1,10} median=1; dedup-first {1,10} would give 5.5
    val df = Seq(Some(1.0), Some(1.0), Some(1.0), Some(10.0), None).toDF("v")
    val imputedThenDeduped = Dedup.exact(Cleaning.imputeMedian(df, Seq("v")))
    assert(imputedThenDeduped.filter($"v" === 1.0).count() === 1)
    assert(imputedThenDeduped.filter($"v" === 5.5).count() === 0)
  }

  test("quantileCapByGroup caps each group at its own quantile, nulls pass through") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(100.0)),
      ("b", Some(10.0)), ("b", Some(20.0)), ("b", Some(30.0)),
      ("a", None)
    ).toDF("g", "v")
    val out = Cleaning.quantileCapByGroup(df, Seq("g"), "v", q = 0.5)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // group a median = 2.0 (nulls excluded), group b median = 20.0
    val a = out.filter(_._1 == "a").flatMap(_._2).sorted
    val b = out.filter(_._1 == "b").flatMap(_._2).sorted
    assert(a === Seq(1.0, 2.0, 2.0))     // 100 capped to a's own median
    assert(b === Seq(10.0, 20.0, 20.0))  // 30 capped to b's, not a's
    assert(out.count(_._2.isEmpty) === 1) // null target survives as null
  }

  test("quantileCapByGroup: null group keys form their own group; all-null group unchanged") {
    val df = Seq[(Option[String], Option[Double])](
      (None, Some(1.0)), (None, Some(9.0)),
      (Some("c"), None), (Some("c"), None)
    ).toDF("g", "v")
    val out = Cleaning.quantileCapByGroup(df, Seq("g"), "v", q = 0.0)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getString(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // q=0 → cap at the group min: the null-key group caps 9.0 down to 1.0
    assert(out.filter(_._1.isEmpty).flatMap(_._2).sorted === Seq(1.0, 1.0))
    // group c is all-null → null cap → rows untouched, still null
    assert(out.filter(_._1.contains("c")).forall(_._2.isEmpty))
    assert(out.length === 4)
  }

  test("quantileCapByGroup plans the cap side as a broadcast join, no window sort") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val plan = Cleaning.quantileCapByGroup(df, Seq("g"), "v", q = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("madOutlierFilter removes glitches without the threshold chasing them") {
    // 100 sane values plus two 1e6 glitches: a mean/std filter's threshold
    // would blow past the glitches; median/MAD must drop exactly those two
    val df = ((1 to 100).map(_.toDouble) ++ Seq(1e6, -1e6)).toDF("v")
    val kept = Cleaning.madOutlierFilter(df, "v", k = 3.5)
      .agg(count(lit(1)), max($"v")).first()
    assert(kept.getLong(0) === 100L)
    assert(kept.getDouble(1) === 100.0)
  }

  test("madOutlierFilter drops nulls (predicate never matches) and handles all-null input") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    assert(Cleaning.madOutlierFilter(df, "v").count() === 3)
    val allNull = Seq(Option.empty[Double], None).toDF("v")
    assert(Cleaning.madOutlierFilter(allNull, "v").count() === 0)
  }

  test("percentileOf approximate mode stays close to exact at scale") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val exact = df.agg(Cleaning.percentileOf($"v", 0.99)).first().getDouble(0)
    val approx = df.agg(Cleaning.percentileOf($"v", 0.99, exact = false)).first().getDouble(0)
    assert(math.abs(exact - approx) / exact < 0.01)
  }

  test("percentilesSelect is BIT-identical to the exact percentile aggregate") {
    // the sorted-selection path replaces the aggregate on scalar call
    // sites, so any last-ulp divergence would flip boundary rows of a
    // downstream filter and break oracle hashes — require exact ==
    val rnd = new scala.util.Random(20260819)
    val pcts = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0)
    // doubles with duplicates, negatives, and skew
    val doubles = Seq.fill(5000)(math.floor(rnd.nextDouble() * 2000 - 500) / 4.0) ++
      Seq.fill(50)(rnd.nextDouble() * 1e9)
    val dDf = rnd.shuffle(doubles).toDF("v")
    val aggD = dDf.agg(
      percentile($"v", typedLit(pcts)).as("ps")).first().getSeq[Double](0)
    val selD = Cleaning.percentilesSelect(dDf, $"v", pcts).map(_.get)
    pcts.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(aggD(i)) ===
        java.lang.Double.doubleToRawLongBits(selD(i)),
        s"double mismatch at p=${pcts(i)}: agg=${aggD(i)} sel=${selD(i)}")
    }
    // longs (integral toDoubleValue at the end, not before the sort)
    val longs = Seq.fill(3000)(rnd.nextLong() % 100000L)
    val lDf = rnd.shuffle(longs).toDF("v")
    val aggL = lDf.agg(percentile($"v", typedLit(pcts)).as("ps"))
      .first().getSeq[Double](0)
    val selL = Cleaning.percentilesSelect(lDf, $"v", pcts).map(_.get)
    pcts.indices.foreach(i => assert(
      java.lang.Double.doubleToRawLongBits(aggL(i)) ===
        java.lang.Double.doubleToRawLongBits(selL(i)),
      s"long mismatch at p=${pcts(i)}"))
    // edges: single row, all-equal, all-null
    assert(Cleaning.percentileSelect(Seq(7.0).toDF("v"), $"v", 0.5) === Some(7.0))
    assert(Cleaning.percentileSelect(Seq(3.0, 3.0, 3.0).toDF("v"), $"v", 0.75) === Some(3.0))
    assert(Cleaning.percentileSelect(
      Seq[Option[Double]](None, None).toDF("v"), $"v", 0.5) === None)
  }

  test("quantileCapByGroup sortedSelection is BIT-identical to the grouped aggregate") {
    // the selection strategy exists for few/fat groups at scale (the
    // per-group value-map otherwise lands one group per reducer task);
    // results must match the aggregate path bit-for-bit, including the
    // equal-rank / equal-value short-circuits and the all-null group
    val rnd = new scala.util.Random(20260819)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      // 3 fat groups + a null-keyed group + an all-null-value group;
      // duplicates and negatives included
      val rows = (1 to 4000).map { i =>
        val g: java.lang.Long = i % 5 match {
          case 4 => null
          case k => java.lang.Long.valueOf(k % 3)
        }
        val v: java.lang.Double =
          if (i % 6 == 0) null
          else java.lang.Double.valueOf(math.floor(rnd.nextDouble() * 400 - 100) / 8.0)
        (g, v)
      } ++ Seq((java.lang.Long.valueOf(9L), null: java.lang.Double)) // all-null group
      val df = rnd.shuffle(rows).toDF("g", "v")
      val agg = Cleaning.quantileCapByGroup(df, Seq("g"), "v", q)
        .orderBy($"g".asc_nulls_last, $"v".asc_nulls_last).collect()
      val sel = Cleaning.quantileCapByGroup(df, Seq("g"), "v", q,
        sortedSelection = true)
        .orderBy($"g".asc_nulls_last, $"v".asc_nulls_last).collect()
      assert(agg.length === sel.length, s"row count mismatch at q=$q")
      agg.zip(sel).foreach { case (a, s) =>
        assert(a === s, s"row mismatch at q=$q: agg=$a sel=$s")
      }
    }
    // long targets: conversion to double happens AFTER selection
    val lf = rnd.shuffle((1 to 500).map(i =>
      (i % 2L, rnd.nextLong() % 10000L))).toDF("g", "v")
    val la = Cleaning.quantileCapByGroup(lf, Seq("g"), "v", 0.73)
      .orderBy($"g", $"v").collect()
    val ls = Cleaning.quantileCapByGroup(lf, Seq("g"), "v", 0.73,
      sortedSelection = true).orderBy($"g", $"v").collect()
    la.zip(ls).foreach { case (a, s) => assert(a === s) }
  }
}
