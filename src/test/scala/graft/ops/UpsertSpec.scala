package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE semantics: matched keys replaced, unmatched inserted, the rest
  * untouched; the target side never shuffles in the broadcast shape. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("merge replaces matched keys, inserts new keys, keeps the rest") {
    val updates = Seq((2L, "b2", 99.0), (9L, "new", 1.0)).toDF("k", "name", "v")
    val out = Upsert.merge(target, updates, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out === Array((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0), (9L, "new", 1.0)))
  }

  test("merge tolerates different column order in updates") {
    val updates = Seq(("b2", 2L, 99.0)).toDF("name", "k", "v")
    val out = Upsert.merge(target, updates, Seq("k"))
      .select($"k", $"name").as[(Long, String)].collect().toMap
    assert(out(2L) === "b2")
    assert(out.size === 3)
  }

  test("merge rejects mismatched schemas loudly") {
    val updates = Seq((2L, "b2")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Upsert.merge(target, updates, Seq("k"))
    }
  }

  test("null update keys insert without ever matching a target row") {
    val withNullKey = Seq((Option.empty[Long], "nk", 0.0)).toDF("k", "name", "v")
    val out = Upsert.merge(target, withNullKey, Seq("k")).collect()
    assert(out.length === 4) // 3 survivors + the null-key insert
    assert(out.count(_.isNullAt(0)) === 1)
  }

  test("broadcast shape: target side is anti-joined against a broadcast, no target shuffle") {
    val updates = Seq((2L, "b2", 99.0)).toDF("k", "name", "v")
    val plan = Upsert.merge(target, updates, Seq("k")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
