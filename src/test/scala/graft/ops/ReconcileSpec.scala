package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot diff semantics: the four statuses, null-safe value comparison,
  * null keys tracked by presence markers, single full-outer-join plan. */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(before: org.apache.spark.sql.DataFrame,
                       after: org.apache.spark.sql.DataFrame): Map[Option[Long], String] =
    Reconcile.diff(before, after, Seq("k"), Seq("v"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1))
      .toMap

  test("classifies added, removed, changed and unchanged records") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val st = statuses(before, after)
    assert(st === Map(Some(1L) -> "unchanged", Some(2L) -> "changed",
      Some(3L) -> "removed", Some(4L) -> "added"))
  }

  test("null values compare null-safely: null==null is unchanged, null→value is changed") {
    val before = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val after = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val st = statuses(before, after)
    assert(st(Some(1L)) === "unchanged")
    assert(st(Some(2L)) === "changed")
  }

  test("a null key is a real record, not an absence") {
    val before = Seq((Option.empty[Long], "a")).toDF("k", "v")
    val after = Seq((Option.empty[Long], "b")).toDF("k", "v")
    val st = statuses(before.withColumn("k", $"k".cast("long")),
      after.withColumn("k", $"k".cast("long")))
    assert(st === Map(None -> "changed")) // matched via null-safe key join
  }

  test("diffSummary counts per status; plan is one full-outer join, no cartesian") {
    val before = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val after = Seq((1L, "a"), (3L, "c")).toDF("k", "v")
    val sum = Reconcile.diffSummary(before, after, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum === Map("unchanged" -> 1L, "removed" -> 1L, "added" -> 1L))
    val plan = Reconcile.diff(before, after, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert("FullOuter".r.findAllIn(plan).size === 1, plan)
  }
}
