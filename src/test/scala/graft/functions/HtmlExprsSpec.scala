package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** HtmlExtract: tag stripping, subtree drops, entity decode, link-density
  * counters, and totality on malformed markup.
  */
class HtmlExprsSpec extends SparkSpec {
  import spark.implicits._

  private def ex(html: String): Row =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExprs.htmlExtract($"h").as("e"))
      .selectExpr("e.text", "e.text_chars", "e.link_chars", "e.n_links")
      .first()

  test("strips tags to visible text with collapsed whitespace") {
    val r = ex("<html><body><h1>Title</h1>\n  <p>one  two</p><div>three</div></body></html>")
    assert(r.getString(0) === "Title one two three")
    assert(r.getLong(1) === 19L)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
  }

  test("drops head, script, and style subtrees wholesale") {
    val r = ex("<html><head><title>T</title><style>p { color: red }</style></head>" +
      "<body>keep<script>var x = '<b>not text</b>';</script>this</body></html>")
    assert(r.getString(0) === "keep this")
  }

  test("decodes the five named entities and numeric references") {
    val r = ex("<p>a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; &#65;&#8364;</p>")
    assert(r.getString(0) === "a & b <c> \"d\" 'e' A€")
  }

  test("unrecognized entities and stray ampersands pass through literally") {
    assert(ex("<p>R&D at AT&T; &bogus; &#xFF;</p>").getString(0) ===
      "R&D at AT&T; &bogus; &#xFF;")
  }

  test("counts anchors and non-whitespace link characters") {
    val r = ex("<body>intro <a href=\"/x\">first link</a> mid " +
      "<a href='/y'><b>bold two</b></a> outro</body>")
    assert(r.getString(0) === "intro first link mid bold two outro")
    assert(r.getLong(3) === 2L)
    // "firstlink" (9) + "boldtwo" (7)
    assert(r.getLong(2) === 16L)
  }

  test("nested anchors and entity text inside anchors count correctly") {
    val r = ex("<a href=\"/o\">out <a>in</a> side</a> free")
    // link chars: "outinside" = 9 non-ws chars inside anchor spans
    assert(r.getLong(2) === 9L)
    assert(r.getLong(3) === 2L)
    val e = ex("<a>x &amp; y</a>")
    assert(e.getLong(2) === 3L) // x, &, y and nothing else
  }

  test("attribute values containing '>' do not end the tag early") {
    assert(ex("<p data-x=\"a > b\">body</p>").getString(0) === "body")
  }

  test("comments are dropped; literal '<' not opening a tag is kept") {
    assert(ex("a <!-- hidden <p>x</p> --> b").getString(0) === "a b")
    assert(ex("1 < 2 and 3 > 2").getString(0) === "1 < 2 and 3 > 2")
  }

  test("total on malformed input: unclosed tags, truncated entities, EOF") {
    // none of these may throw or hang; text degrades best-effort
    val cases = Seq("<a href=\"unterminated", "<p", "text <", "<<<<", "&", "&amp",
      "<script>never closed", "<a>link to nowhere", "</div></div>", "<!---->", "<!--")
    cases.foreach { h =>
      val r = ex(h)
      assert(r.getLong(1) === r.getString(0).length.toLong, s"for input: $h")
    }
    assert(ex("<a>link to nowhere").getLong(2) === 13L)
  }

  test("self-closing anchors don't open a link span; case-insensitive tags") {
    val r = ex("<A HREF=\"/x\">CAPS</A> <a/> free <BR/> <SCRIPT>drop()</SCRIPT>")
    assert(r.getString(0) === "CAPS free")
    assert(r.getLong(2) === 4L)
    assert(r.getLong(3) === 1L)
  }

  test("SQL-registered html_extract works end-to-end") {
    graft.ext.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT html_extract('<body><a href=\"x\">go</a> now</body>') AS e")
      .selectExpr("e.text", "e.link_chars", "e.n_links").first()
    assert(r.getString(0) === "go now")
    assert(r.getLong(1) === 2L && r.getLong(2) === 1L)
  }
}
