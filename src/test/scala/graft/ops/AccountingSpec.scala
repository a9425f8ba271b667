package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C9 accounting via observe(): metrics ride with the action — no extra
  * job per stage (the reference re-counts eagerly after every step).
  */
class AccountingSpec extends SparkSpec {
  import spark.implicits._

  test("stageCounts reports rows and per-column nulls on one pass") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val (observed, obs) = Accounting.stageCounts(df, "impute_in", Seq("v", "absent_col"))
    observed.collect() // the action that materializes the metrics
    val m = obs.get
    assert(m("rows") === 4L)
    assert(m("nulls_v") === 2L)
    assert(!m.contains("nulls_absent_col")) // absent columns skipped
  }

  test("filterAccounting measures removed rows without extra jobs") {
    val df = (1 to 100).toDF("v")
    val (out, before, after) = Accounting.filterAccounting(df, $"v" > 30, "p5")
    out.collect()
    assert(before.get("rows") === 100L)
    assert(after.get("rows") === 70L)
  }

  test("observe composes with aggregation actions") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val (observed, obs) = Accounting.observe(df, "pre_agg",
      "rows" -> count(lit(1)), "v_sum" -> sum($"v"))
    val agg = observed.groupBy("k").agg(sum($"v")).collect()
    assert(agg.length === 2)
    assert(obs.get("rows") === 3L)
    assert(obs.get("v_sum") === 6.0)
  }
}
