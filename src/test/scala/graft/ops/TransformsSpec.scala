package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SURVEY §2.6 derived-column semantics, especially the §7.5.3
  * pandas↔Spark trap cases: right-closed pd.cut bins, include_lowest on
  * time_of_day but not on segment, dayofweek off-by-one, x/0 handling.
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def tod(h: Int): String =
    Seq(h).toDF("h").select(Transforms.timeOfDay($"h")).first().getString(0)

  test("D6 timeOfDay uses right-closed bins with include_lowest") {
    assert(tod(0) === "Night")      // include_lowest
    assert(tod(6) === "Night")      // right edge belongs to Night
    assert(tod(7) === "Morning")
    assert(tod(12) === "Morning")   // right edge
    assert(tod(18) === "Afternoon") // right edge
    assert(tod(19) === "Evening")
    assert(tod(23) === "Evening")
  }

  private def seg(v: Double): Option[String] = {
    val r = Seq(v).toDF("v")
      .select(Transforms.segment($"v", Seq(10.0, 20.0, 50.0),
        Seq("Low", "Medium", "High", "Very High")).as("s")).first()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("D10 segment is right-closed with NO include_lowest: v <= 0 → null") {
    assert(seg(0.0) === None)     // the trap: 0 maps to null, not Low
    assert(seg(-3.0) === None)
    assert(seg(0.01) === Some("Low"))
    assert(seg(10.0) === Some("Low"))      // right edge
    assert(seg(10.01) === Some("Medium"))
    assert(seg(50.0) === Some("High"))
    assert(seg(50.01) === Some("Very High"))
  }

  test("D9 isWeekend marks Saturday and Sunday (pandas dayofweek>=5 parity)") {
    val df = Seq(
      "2024-01-05", // Friday
      "2024-01-06", // Saturday
      "2024-01-07", // Sunday
      "2024-01-08"  // Monday
    ).toDF("d").select(to_timestamp($"d").as("ts"))
    val flags = df.select(Transforms.isWeekend($"ts")).collect().map(_.getBoolean(0)).toSeq
    assert(flags === Seq(false, true, true, false))
  }

  test("D4 dayName yields full English day names") {
    val df = Seq("2024-01-08").toDF("d").select(to_timestamp($"d").as("ts"))
    assert(df.select(Transforms.dayName($"ts")).first().getString(0) === "Monday")
  }

  test("D1 durationMinutes is µs-exact") {
    val df = Seq(("2024-01-01 10:00:00.000001", "2024-01-01 10:30:00.000001"))
      .toDF("s", "e").select(to_timestamp($"s").as("s"), to_timestamp($"e").as("e"))
    assert(df.select(Transforms.durationMinutes($"s", $"e")).first().getDouble(0) === 30.0)
  }

  test("D2 clippedSpeed emulates pandas x/0→inf→clip and clips to [0,max]") {
    val rows = Seq(
      (10.0, 0.0),   // dist>0, dur=0: pandas inf → clip → 100
      (0.0, 0.0),    // 0/0: pandas NaN stays NaN
      (10.0, 6.0),   // 100 mph exactly
      (500.0, 60.0), // 500 mph → clip 100
      (-1.0, 60.0)   // negative → clip 0
    ).toDF("dist", "dur")
    val out = rows.select(Transforms.clippedSpeed($"dist", $"dur", 100.0).as("v")).collect()
    assert(out(0).getDouble(0) === 100.0)
    assert(out(1).getDouble(0).isNaN)
    assert(out(2).getDouble(0) === 100.0)
    assert(out(3).getDouble(0) === 100.0)
    assert(out(4).getDouble(0) === 0.0)
  }

  test("D11 safeRatio maps x/0 to 0 (pandas inf/NaN → 0 parity)") {
    val df = Seq((5.0, 0.0), (5.0, 10.0)).toDF("num", "den")
    val out = df.select(Transforms.safeRatio($"num", $"den")).collect().map(_.getDouble(0)).toSeq
    assert(out === Seq(0.0, 50.0))
  }

  test("calendar exposes hour/month/year/day_of_week") {
    val df = Seq("2024-03-15 13:45:00").toDF("d").select(to_timestamp($"d").as("ts"))
    val cal = Transforms.calendar($"ts")
    val r = df.select(cal("hour"), cal("month"), cal("year"), cal("day_of_week")).first()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)) === ((13, 3, 2024, "Friday")))
  }
}
