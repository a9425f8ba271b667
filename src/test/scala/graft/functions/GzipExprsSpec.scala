package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GunzipText/GzipMember: member round-trips, concatenated-member drain,
  * and the corrupt-input/bomb null contract.
  */
class GzipExprsSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips text through one gzip member, multi-byte intact") {
    val text = "WARC/1.0 quoted — 日本語 & emoji ☃, repeated " + ("ab" * 500)
    val r = Seq(Tuple1(text)).toDF("t")
      .select(GzipExprs.gunzipText(GzipExprs.gzipMember($"t")).as("rt"))
      .first()
    assert(r.getString(0) === text)
  }

  test("drains ALL concatenated members, not just the first") {
    // the Common Crawl layout: one member per record, members back-to-back
    val r = Seq(("first|", "second|", "third"))
      .toDF("a", "b", "c")
      .select(GzipExprs.gunzipText(concat(
        GzipExprs.gzipMember($"a"), GzipExprs.gzipMember($"b"),
        GzipExprs.gzipMember($"c"))).as("all"))
      .first()
    assert(r.getString(0) === "first|second|third")
  }

  test("corrupt and non-gzip input give null, never an exception") {
    val r = Seq(Tuple1("x")).toDF("t")
      .select(
        GzipExprs.gunzipText(encode(lit("not gzip at all"), "UTF-8")).as("junk"),
        GzipExprs.gunzipText(expr("CAST(X'1F8B' AS BINARY)")).as("truncated"),
        // valid header, garbage deflate body
        GzipExprs.gunzipText(expr("CAST(X'1F8B080000000000000000DEADBEEF' AS BINARY)"))
          .as("corrupt"),
        GzipExprs.gunzipText(expr("CAST(X'' AS BINARY)")).as("empty"))
      .first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("a malformed follower after a complete member ends the drain, keeping the salvage") {
    // records-so-far totality, same as WarcRecords: the corrupt tail is
    // data loss to account for, not a reason to drop the decoded prefix
    val r = Seq(Tuple1("good")).toDF("t")
      .select(GzipExprs.gunzipText(concat(GzipExprs.gzipMember($"t"),
        encode(lit("trailing garbage after the member"), "UTF-8"))).as("mixed"))
      .first()
    assert(r.getString(0) === "good")
  }
}
