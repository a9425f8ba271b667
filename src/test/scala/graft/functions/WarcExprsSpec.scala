package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** WarcRecords: Content-Length-delimited record walk, byte-correct lengths
  * on multi-byte text, header handling, and totality on malformed files.
  */
class WarcExprsSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, body: String, recType: String = "conversion"): String = {
    val len = body.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $len\r\n\r\n$body\r\n\r\n"
  }

  private def parse(file: String): Seq[Row] =
    Seq(Tuple1(file)).toDF("f")
      .select(posexplode(WarcExprs.warcRecords($"f")))
      .selectExpr("col.uri", "col.rec_type", "col.content_length", "col.payload")
      .collect().toSeq

  test("round-trips concatenated records, Content-Length in BYTES") {
    val body2 = "日本語テキスト with ascii" // multi-byte: bytes > chars
    val rows = parse(rec("https://a/1", "hello world") +
      rec("https://a/2", body2, recType = "response") +
      rec("https://a/3", ""))
    assert(rows.map(_.getString(0)) === Seq("https://a/1", "https://a/2", "https://a/3"))
    assert(rows.map(_.getString(1)) === Seq("conversion", "response", "conversion"))
    assert(rows(1).getLong(2) === body2.getBytes("UTF-8").length.toLong)
    assert(rows.map(_.getString(3)) === Seq("hello world", body2, ""))
  }

  test("payload containing WARC version lines passes through intact") {
    // a page QUOTING the warc format must not split the file — the walk is
    // length-delimited, never marker-scanning
    val evil = "quoted: WARC/1.0\r\nContent-Length: 0\r\n\r\nnot a record"
    val rows = parse(rec("https://a/evil", evil) + rec("https://a/after", "ok"))
    assert(rows.map(_.getString(0)) === Seq("https://a/evil", "https://a/after"))
    assert(rows.head.getString(3) === evil)
    assert(rows(1).getString(3) === "ok")
  }

  test("header names are case-insensitive; unknown and junk lines skip") {
    val file = "WARC/1.0\r\ncontent-length: 2\r\nWARC-TARGET-URI: u\r\n" +
      "X-Custom: z\r\njunk line no colon\r\n\r\nhi\r\n\r\n"
    val rows = parse(file)
    assert(rows.size === 1)
    assert(rows.head.getString(0) === "u")
    assert(rows.head.getString(1) === "") // no WARC-Type header
    assert(rows.head.getString(3) === "hi")
  }

  test("malformed tails end the walk with records-so-far, never throw") {
    val good = rec("https://a/1", "keep")
    // truncated payload: declared 100 bytes, file ends first
    assert(parse(good + "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort").size === 1)
    // unparsable and absent Content-Length
    assert(parse(good + "WARC/1.0\r\nContent-Length: x\r\n\r\n").size === 1)
    assert(parse(good + "WARC/1.0\r\nWARC-Type: t\r\n\r\n").size === 1)
    // garbage between records stops the walk (offset integrity is gone)
    assert(parse(good + "HTTP/1.1 200 OK\r\n\r\n" + good).size === 1)
    // empty input and pure garbage give empty arrays, not null/error
    assert(parse("").isEmpty && parse("not a warc at all").isEmpty)
  }

  test("missing trailing terminator on the final record still parses") {
    val file = "WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 4\r\n\r\nlast"
    val rows = parse(file)
    assert(rows.size === 1 && rows.head.getString(3) === "last")
  }
}
