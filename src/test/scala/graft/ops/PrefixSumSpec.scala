package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum: exactness vs the single-partition global
  * window, bucket-boundary behaviour, and the plan property that no
  * unpartitioned window ever runs over the data rows. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, keyGap: Long = 1L) =
    (0 until n).map(i => (i * keyGap + 7L, (i % 13 + 1).toLong)).toDF("k", "v")

  test("exclusivePrefixSum matches the global-window formulation exactly") {
    val df = rows(500)
    val expected = df.withColumn("cum",
      coalesce(sum($"v").over(
        Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "cum", buckets = 8)
    assert(got.select("k", "v", "cum").exceptAll(expected.select("k", "v", "cum")).isEmpty)
    assert(expected.select("k", "v", "cum").exceptAll(got.select("k", "v", "cum")).isEmpty)
  }

  test("sparse, non-dense keys with fewer rows than buckets still sum correctly") {
    val df = Seq((100L, 5L), (7000L, 3L), (90000L, 2L), (1000000L, 11L)).toDF("k", "v")
    val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "cum", buckets = 256)
      .orderBy("k").select("cum").as[Long].collect()
    assert(got.toSeq === Seq(0L, 5L, 8L, 10L))
  }

  test("null keys are excluded and never distort other rows' sums") {
    val df = Seq((Some(10L), 100L), (None, 999L), (Some(20L), 5L))
      .toDF("k", "v")
    val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "cum", buckets = 4)
      .orderBy("k").select("k", "cum").as[(Long, Long)].collect().toSeq
    assert(got === Seq((10L, 0L), (20L, 100L))) // the 999 never leaks into offsets
  }

  test("empty input yields an empty frame with the output column") {
    val df = rows(0)
    val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "cum")
    assert(got.columns.contains("cum") && got.isEmpty)
  }

  test("lexicographic order: leading-key ties broken by the second key, " +
      "equal to the sequential scan") {
    // many ties on the leading key (score-like), ids deliberately HUGE
    // (replica-shifted range) — the case that overflows composite packing
    val data = (0L until 500L).map { i =>
      (i % 7, (i % 13) * 100000000000L + i, i % 5 + 1)
    }
    val df = data.toDF("score", "id", "v")
    val got = PrefixSum.exclusivePrefixSumMulti(df, Seq("score", "id"), "v", "cum",
        buckets = 8)
      .orderBy("score", "id").select("v", "cum").as[(Long, Long)].collect().toSeq
    val expect = data.sortBy { case (s, id, _) => (s, id) }
      .scanLeft(0L)(_ + _._3).dropRight(1)
    assert(got.map(_._2) === expect)
  }

  test("the only unpartitioned window in the plan is over bucket totals, not rows") {
    val df = rows(1000)
    val plan = PrefixSum.exclusivePrefixSum(df, "k", "v", "cum", buckets = 16)
      .queryExecution.optimizedPlan.toString
    // every Window over the data rows must carry the __bkt partition spec
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    val overRows = windowLines.filter(_.contains("k#"))
    assert(overRows.forall(_.contains("__bkt")),
      s"found a row-level window without bucket partitioning:\n${overRows.mkString("\n")}")
  }
}
