package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the round-8 analytic operators: rolling anomaly
  * (peer exclusion, strict threshold), skyline (duplicates, same-x
  * dominance, cross-bucket prefix), grid radius join (boundary inclusion,
  * pair uniqueness across cells), funnel (strict ordering, deadline
  * boundary). */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Anomaly -----------------------------------------------------------

  test("rollingDeviationFlags excludes same-second peers from the history") {
    // 8 history rows at value 10, then at sec=100 TWO events: a spike and
    // a peer. The peer must not enter the spike's window (frame ends at
    // sec−1), so both see n_win=8, s1=80.
    val hist = (1L to 8L).map(i => (i, 1L, i * 10, 10L))
    val rows = hist ++ Seq((100L, 1L, 100L, 1000L), (101L, 1L, 100L, 10L))
    val df = rows.toDF("event_id", "user_id", "ts_epoch", "value_cents")
    val out = Anomaly.rollingDeviationFlags(df, "user_id", "ts_epoch",
        "value_cents", windowSec = 1000L, minN = 8L, thrNum = 64L, thrDen = 25L)
      .select("event_id", "n_win").collect().map(r => (r.getLong(0), r.getLong(1)))
    // history is constant → nvar=0; the spike's dev2>0 clears any nvar;
    // the non-spiking peer has dev2=(8*10-80)²=0 → not flagged
    assert(out.toSeq === Seq((100L, 8L)))
  }

  test("rollingDeviationFlags threshold is strict and minN gates") {
    // history {0, 20} ×4 alternating → s1=80, s2=1600, n=8, nvar=8*1600-6400=6400
    // candidate x: dev2=(8x−80)²; flag ⇔ 25·dev2 > 64·6400 ⇔ |8x−80| > 128
    //   x=26 → 8x−80=128 → equality → NOT flagged; x=27 → 136 → flagged
    val hist = (1L to 8L).map(i => (i, 1L, i, if (i % 2 == 0) 20L else 0L))
    // both candidates share sec=50: same-second peers are frame-excluded,
    // so each is tested against the 8-row history alone
    val df = (hist ++ Seq((90L, 1L, 50L, 26L), (91L, 1L, 50L, 27L),
        // a second user with too little history never flags
        (92L, 2L, 50L, 1000000L)))
      .toDF("event_id", "user_id", "ts_epoch", "value_cents")
    val out = Anomaly.rollingDeviationFlags(df, "user_id", "ts_epoch",
        "value_cents", windowSec = 1000L, minN = 8L, thrNum = 64L, thrDen = 25L)
      .select("event_id").as[Long].collect().toSet
    assert(out === Set(91L))
  }

  // ---- Skyline -----------------------------------------------------------

  test("frontierMinXMaxY keeps duplicates once with multiplicity and sweeps across buckets") {
    // pairs: (1,5)×2 frontier; (1,3) same-x dominated; (2,5) dominated by
    // (1,5); (3,7) frontier; (4,7) dominated (same y, higher x); (5,9) frontier
    val df = Seq((1L, 5L), (1L, 5L), (1L, 3L), (2L, 5L), (3L, 7L),
      (4L, 7L), (5L, 9L)).toDF("a", "b")
    // buckets=2 forces the cross-bucket prefix path
    val out = Skyline.frontierMinXMaxY(df, col("a"), col("b"), buckets = 2)
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 5L, 2L), (3L, 7L, 1L), (5L, 9L, 1L)))
  }

  // ---- Spatial -----------------------------------------------------------

  test("adaptiveGridRadiusSelfJoin finds each pair once, boundary inclusive") {
    // 4 points → rad = 2·⌊65536/⌈√4⌉⌋ = 65536. Cell size = rad, so the
    // points straddle cell boundaries only if coords ≥ rad — keep all in
    // cell (0,0)/(0,1) etc. dist² ≤ rad² inclusive.
    val pts = Seq((1L, 0L, 0L), (2L, 65536L, 0L), // dist² = rad² → included
      (3L, 0L, 65537L), // dist² = (rad+1)² → excluded
      (4L, 3L, 4L)) // close to 1 → included; also pairs with 2 (dist²<rad²)
      .toDF("id", "x", "y")
    val out = Spatial.adaptiveGridRadiusSelfJoin(pts,
        col("id"), col("x"), col("y"))
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // pair (1,2) spans adjacent cells → must appear exactly once
    assert(out.count { case (a, b, _) => a == 1L && b == 2L } === 1)
    assert(out.map(t => (t._1, t._2)).toSet ===
      Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    assert(out.forall { case (a, b, _) => a < b })
    // boundary: (1,2) at exactly rad²
    assert(out.find(t => t._1 == 1L && t._2 == 2L).get._3 === 65536L * 65536L)
  }

  // ---- Funnel ------------------------------------------------------------

  test("funnelStages: strictly-after ordering, inclusive deadline, earliest event wins") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      // u1: full conversion; click at view-instant must NOT count, the
      // later click does; purchase exactly at deadline counts
      (1L, ts(100), "view"), (1L, ts(100), "click"), (1L, ts(160), "click"),
      (1L, ts(160 + 86400), "purchase"),
      // u2: click one second past the deadline → stops at view
      (2L, ts(100), "view"), (2L, ts(100 + 86401), "click"),
      // u3: click before any view → stops at view stage (has a view later)
      (3L, ts(500), "click"), (3L, ts(600), "view"),
      // u4: no view at all → not in the funnel
      (4L, ts(100), "click"), (4L, ts(200), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnelStages(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), deadlineSec = 86400L)
      .orderBy("stage_idx")
      .select("stage", "n_users", "sum_delay_s")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("view", 3L, 0L), ("click", 1L, 60L),
      ("purchase", 1L, 86400L)))
  }
}
