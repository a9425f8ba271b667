package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profile semantics: per-column null/distinct accounting from one job,
  * approx mode close to exact, single-scan plan. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None), (None, Some("b"))
  ).toDF("id", "tag")

  test("profile reports rows, nulls and exact distincts per column") {
    val out = Profile.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("id") === ((4L, 1L, 2L)))  // distinct excludes null
    assert(out("tag") === ((4L, 1L, 2L)))
  }

  test("approximate mode matches exact on small cardinalities") {
    val exact = Profile.profile(df, Seq("id", "tag")).orderBy("column")
      .select("n_distinct").as[Long].collect().toSeq
    val approx = Profile.profile(df, Seq("id", "tag"), exact = false).orderBy("column")
      .select("n_distinct").as[Long].collect().toSeq
    assert(exact === approx)
  }

  test("one aggregation job: a single scan feeds every column's stats") {
    val plan = Profile.profile(df, Seq("id", "tag")).queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2, plan) // one leaf (+possible reuse)
  }
}
