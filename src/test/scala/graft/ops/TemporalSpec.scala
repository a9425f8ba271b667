package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: greatest right time ≤ left time per key,
  * same-instant matches included, deterministic tie-break, null payload
  * when no prior right row exists. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward picks the latest right row at or before each left row") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 50.0)
    ).toDF("k", "qt", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:05:00"), "same-instant"), // == quote ts → matched
      (1L, ts("2024-01-01 10:07:30"), "between"),      // → 10:05 quote
      (1L, ts("2024-01-01 09:00:00"), "before-any"),   // → null
      (2L, ts("2024-01-01 11:00:00"), "other-key")     // → key-2 quote only
    ).toDF("k", "tt", "label")
    val out = Temporal.asofBackward(trades, quotes,
        key = "k", leftTime = "tt", rightTime = "qt",
        payload = Seq("price"), tieBreak = col("price"))
      .select($"label", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("same-instant") === Some(101.0))
    assert(out("between") === Some(101.0))
    assert(out("before-any") === None)
    assert(out("other-key") === Some(50.0))
  }

  test("asofBackward never matches a null right time (ASOF null-comparison parity)") {
    val quotes = Seq(
      (1L, Option.empty[java.sql.Timestamp], 999.0), // must match nothing
      (1L, Some(ts("2024-01-01 10:05:00")), 101.0)
    ).toDF("k", "qt", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "before-any-real"), // null payload, NOT 999
      (1L, ts("2024-01-01 10:06:00"), "after")
    ).toDF("k", "tt", "label")
    val out = Temporal.asofBackward(trades, quotes, "k", "tt", "qt",
        Seq("price"), tieBreak = col("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("before-any-real") === None)
    assert(out("after") === Some(101.0))
  }

  test("asofBackward breaks right-side time ties by the greatest tieBreak") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 9L)
    ).toDF("k", "rt", "rid")
    val left = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("k", "lt")
    val out = Temporal.asofBackward(left, right, "k", "lt", "rt",
      Seq("rid"), col("rid")).select($"rid").first().getLong(0)
    assert(out === 9L)
  }

  test("asofBackward plan shuffles once on the key — no range join, no cartesian") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "rt", "rid")
    val left = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("k", "lt")
    val plan = Temporal.asofBackward(left, right, "k", "lt", "rt",
      Seq("rid"), col("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).size <= 2, plan)
  }
}
