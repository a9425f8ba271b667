package graft

import org.scalatest.funsuite.AnyFunSuite

/** Output-format contract for the bench harness (round-3 lesson: the judged
  * signal must distinguish broken from slow from noise-swamped). */
class BenchSpec extends AnyFunSuite {

  test("measure records the min of N runs") {
    var calls = 0
    val delays = Seq(30L, 5L, 15L)
    val r = Bench.measure("q", 3, () => { Thread.sleep(delays(calls)); calls += 1 })
    assert(calls == 3)
    assert(r.runsSec.size == 3)
    assert(r.err.isEmpty)
    assert(r.minSec.contains(r.runsSec.min))
    // the 5ms run must be the min, not the first or last run
    assert(r.minSec.get == r.runsSec(1))
  }

  test("a throwing query yields an error sentinel, never a timing") {
    val r = Bench.measure("boom", 3, () => throw new IllegalStateException("x" * 500))
    assert(r.runsSec.isEmpty)
    assert(r.minSec.isEmpty)
    assert(r.err.isDefined)
    assert(r.err.get.startsWith("IllegalStateException:"))
    assert(r.err.get.length <= "IllegalStateException: ".length + 300)
  }

  test("a query that fails on run 2 keeps no timings and stops retrying") {
    var calls = 0
    val r = Bench.measure("flaky", 5, () => {
      calls += 1
      if (calls == 2) throw new RuntimeException("died on 2nd run")
    })
    assert(calls == 2, "must stop at first failure")
    assert(r.err.isDefined)
    // ONE semantic: any failure means query-failed — the run-1 timing must
    // not leak into `queries`/`value` while the query also counts as failed
    assert(r.runsSec.size == 1, "raw run-1 timing stays visible in raw_runs")
    assert(r.minSec.isEmpty, "a partially-succeeded query reports no min")
    val json = Bench.renderJson(Seq(r), 5, "/d", "local[1]", "1")
    assert(json.contains(""""flaky":null"""))
    assert(json.contains(""""value":0.0""") || json.contains(""""value":0"""))
    assert(json.contains(""""failed":1"""))
  }

  test("fatal errors propagate instead of being recorded as a query failure") {
    intercept[OutOfMemoryError] {
      Bench.measure("fatal", 2, () => throw new OutOfMemoryError("simulated"))
    }
  }

  test("non-numeric shuffle_partitions is quoted, record stays valid JSON") {
    val r = Bench.QueryResult("q", Seq(1.0), None)
    val starry = Bench.renderJson(Seq(r), 1, "/d", "local[*]", "*")
    assert(starry.contains(""""shuffle_partitions":"*""""))
    assert(starry.count(_ == '"') % 2 == 0)
    val numeric = Bench.renderJson(Seq(r), 1, "/d", "local[8]", "8")
    assert(numeric.contains(""""shuffle_partitions":8"""))
  }

  test("afterEach runs after every attempt, including a failed one") {
    var cleanups = 0
    Bench.measure("q", 2, () => (), () => cleanups += 1)
    assert(cleanups == 2)
    cleanups = 0
    Bench.measure("boom", 2, () => throw new RuntimeException("x"), () => cleanups += 1)
    assert(cleanups == 1, "cleanup still runs after the failing attempt")
  }

  test("renderJson: failed query is null in queries, message in errors, excluded from total") {
    val ok = Bench.QueryResult("q_ok", Seq(2.5, 1.5), None)
    val bad = Bench.QueryResult("q_bad", Seq.empty, Some("""AnalysisException: "col" not found"""))
    val json = Bench.renderJson(Seq(ok, bad), 2, "/d", "local[4]", "4")
    assert(json.contains(""""q_ok":1.5"""))
    assert(json.contains(""""q_bad":null"""))
    assert(json.contains("\"q_bad\":\"AnalysisException: \\\"col\\\" not found\""))
    assert(json.contains(""""value":1.5"""))
    assert(json.contains(""""failed":1"""))
    assert(json.contains(""""runs":2"""))
    assert(json.contains(""""raw_runs":{"q_ok":[2.5,1.5],"q_bad":[]}"""))
    // whole record must parse as strict JSON — cheap structural check:
    // balanced braces and no raw control chars
    assert(json.count(_ == '{') == json.count(_ == '}'))
    assert(!json.exists(c => c < ' '))
  }

  test("isOutlier needs both the relative and the absolute gate") {
    // 36× phantom of graded-r15 x110: clearly an outlier
    assert(Bench.isOutlier(34.5, 0.96))
    // big relative jump but tiny absolute delta: sub-100ms jitter, not load
    assert(!Bench.isOutlier(0.25, 0.1))
    // big absolute delta but <1.5× relative: normal variance on a slow query
    assert(!Bench.isOutlier(13.0, 10.0))
    // both gates crossed
    assert(Bench.isOutlier(3.2, 2.0))
    // boundary: exactly 1.5× is not an outlier
    assert(!Bench.isOutlier(1.5, 1.0))
  }

  test("loadRefQueries reads a registry's numeric queries map, tolerates junk") {
    val dir = java.nio.file.Files.createTempDirectory("benchref")
    val good = dir.resolve("ref.json")
    java.nio.file.Files.writeString(good,
      """{"metric":"total","value":3.0,"queries":{"q1":1.5,"q2":null,"q3":0.25},"failed":1}""")
    val m = Bench.loadRefQueries(good.toString)
    assert(m == Map("q1" -> 1.5, "q3" -> 0.25), "null entries (failed queries) are skipped")
    assert(Bench.loadRefQueries(dir.resolve("missing.json").toString).isEmpty)
    val bad = dir.resolve("bad.json")
    java.nio.file.Files.writeString(bad, "not json at all {")
    assert(Bench.loadRefQueries(bad.toString).isEmpty)
    val noQueries = dir.resolve("nq.json")
    java.nio.file.Files.writeString(noQueries, """{"metric":"total","value":1.0}""")
    assert(Bench.loadRefQueries(noQueries.toString).isEmpty)
  }

  test("renderJson records remeasured and outliers_remaining") {
    val r = Bench.QueryResult("q", Seq(1.0), None)
    val json = Bench.renderJson(Seq(r), 1, "/d", "local[1]", "1",
      remeasured = Seq("x110", "st21"), outliersRemaining = Seq("x110"))
    assert(json.contains(""""remeasured":["x110","st21"]"""))
    assert(json.contains(""""outliers_remaining":["x110"]"""))
    // default: empty arrays, record still valid
    val plain = Bench.renderJson(Seq(r), 1, "/d", "local[1]", "1")
    assert(plain.contains(""""remeasured":[]"""))
    assert(plain.contains(""""outliers_remaining":[]"""))
  }

  test("renderJson escapes newlines and quotes in error messages") {
    val r = Bench.QueryResult("q", Seq.empty, Some("line1\nline2\t\"quoted\""))
    val json = Bench.renderJson(Seq(r), 1, "/d", "local[1]", "1")
    assert(!json.exists(c => c < ' '), "no raw control characters in JSON")
    assert(json.contains("line1\\nline2\\t\\\"quoted\\\""))
  }
}
