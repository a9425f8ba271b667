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

  test("renderJson escapes newlines and quotes in error messages") {
    val r = Bench.QueryResult("q", Seq.empty, Some("line1\nline2\t\"quoted\""))
    val json = Bench.renderJson(Seq(r), 1, "/d", "local[1]", "1")
    assert(!json.exists(c => c < ' '), "no raw control characters in JSON")
    assert(json.contains("line1\\nline2\\t\\\"quoted\\\""))
  }
}
