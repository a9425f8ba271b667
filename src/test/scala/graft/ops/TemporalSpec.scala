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

  test("rangeJoin pairs each point with exactly the intervals containing it") {
    val intervals = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (1L, 11L, ts("2024-01-01 11:30:00"), ts("2024-01-01 13:00:00")), // overlaps 10
      (2L, 20L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (1L, 12L, ts("2024-01-01 15:00:00"), ts("2024-01-01 15:00:00"))  // empty → never matches
    ).toDF("k", "iv", "s", "e")
    val points = Seq(
      (1L, 100L, ts("2024-01-01 10:30:00")), // iv 10 only
      (1L, 101L, ts("2024-01-01 11:45:00")), // ivs 10 and 11 (overlap region)
      (1L, 102L, ts("2024-01-01 12:00:00")), // end-exclusive on 10 → iv 11 only
      (1L, 103L, ts("2024-01-01 15:00:00")), // empty interval → no match
      (2L, 200L, ts("2024-01-01 10:00:00")), // start-inclusive → iv 20
      (2L, 201L, ts("2024-01-01 10:30:00"))  // key 2 never sees key 1 intervals
    ).toDF("k", "pid", "t")
    // 15-minute cells: intervals span several cells each — exercises the
    // multi-cell replication and the no-duplicate-per-(point,interval) claim
    val out = Temporal.rangeJoin(points, "t", intervals, "s", "e",
        keys = Seq("k"), cellMicros = 15L * 60 * 1000000)
      .select($"pid", $"iv").as[(Long, Long)].collect().sorted
    assert(out === Array(100L -> 10L, 101L -> 10L, 101L -> 11L,
      102L -> 11L, 200L -> 20L, 201L -> 20L).map(p => (p._1, p._2)))
  }

  test("rangeJoin matches the naive inequality join exactly on a dense random grid") {
    // every (key, µs-offset) combination near cell boundaries, cell = 1s
    val intervals = (0L until 40L).map { i =>
      (i % 3, i, ts("2024-01-01 00:00:00"), new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + (i * 733 % 5000)))
    }.toDF("k", "iv", "s", "e")
    val points = (0L until 200L).map { p =>
      (p % 3, p, new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + (p * 37 % 5200)))
    }.toDF("k", "pid", "t")
    val grid = Temporal.rangeJoin(points, "t", intervals, "s", "e",
        keys = Seq("k"), cellMicros = 1000000L)
      .select($"pid", $"iv").as[(Long, Long)].collect().sorted
    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iv").as[(Long, Long)].collect().sorted
    assert(grid === naive)
    assert(grid.nonEmpty) // the fixture actually produces matches
  }

  test("rangeJoin plans as a shuffle equi-join — no nested loop, no cartesian") {
    val intervals = Seq((1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("k", "iv", "s", "e")
    val points = Seq((1L, 100L, ts("2024-01-01 10:30:00"))).toDF("k", "pid", "t")
    val plan = Temporal.rangeJoin(points, "t", intervals, "s", "e",
      keys = Seq("k"), cellMicros = 3600000000L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
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

  test("gapFill densifies per-key hour grids, carries values forward, flags observed") {
    val events = Seq(
      // key 1: obs at 10:xx and 13:xx → grid hours 10,11,12,13
      (1L, ts("2024-01-01 10:15:00"), 1.0, 100L),
      (1L, ts("2024-01-01 13:05:00"), 4.0, 101L),
      // key 2: single obs → one-tick grid
      (2L, ts("2024-01-01 00:30:00"), 9.0, 102L)
    ).toDF("k", "t", "v", "eid")
    val out = Temporal.gapFill(events, "k", "t", 3600L, Seq("v"), col("eid"))
      .orderBy("k", "ts_epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val h = ts("2024-01-01 10:00:00").getTime / 1000
    assert(out.toSeq === Seq(
      (1L, h, 1.0, 1L), (1L, h + 3600, 1.0, 0L),
      (1L, h + 7200, 1.0, 0L), (1L, h + 10800, 4.0, 1L),
      (2L, ts("2024-01-01 00:00:00").getTime / 1000, 9.0, 1L)))
  }

  test("gapFill survivor per tick is the greatest (time, tieBreak); observed null value is carried") {
    val events = Seq(
      // two obs in the same hour: later ts wins; tie on ts → greater eid wins
      (1L, ts("2024-01-01 10:10:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:50:00"), 2.0, 2L),
      (1L, ts("2024-01-01 10:50:00"), 3.0, 5L), // survivor: v=3.0
      // next hour: observed NULL value — must be CARRIED as null, not
      // skipped past to 3.0 (struct-based fill)
      (1L, ts("2024-01-01 11:20:00"), Double.NaN, 9L)
    ).toDF("k", "t", "v", "eid")
      .withColumn("v", when(col("eid") === 9L, lit(null)).otherwise(col("v")))
    val out = Temporal.gapFill(events, "k", "t", 3600L, Seq("v"), col("eid"))
      .orderBy("ts_epoch").collect()
      .map(r => ((if (r.isNullAt(2)) None else Some(r.getDouble(2))), r.getLong(3)))
    assert(out.toSeq === Seq((Some(3.0), 1L), (None, 1L)))
  }

  test("gapFill windows are partitioned by key — no global single-partition window") {
    val events = Seq((1L, ts("2024-01-01 10:00:00"), 1.0, 1L)).toDF("k", "t", "v", "eid")
    val plan = Temporal.gapFill(events, "k", "t", 3600L, Seq("v"), col("eid"))
      .queryExecution.optimizedPlan.toString
    // every Window node must carry a partition spec (windowspecdefinition
    // with a non-empty partitionBy renders the partition cols first)
    assert(!plan.contains("windowspecdefinition(__bkt"), plan)
  }
}
