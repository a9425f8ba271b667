package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** PdfExprs: header/xref/trailer triage (PdfMeta), /Length-delimited
  * content-stream walk with FlateDecode + PDF string-escape decoding
  * (PdfText), and the EncodePdf round-trip fixture — plus totality on
  * malformed payloads (a crawl's PDF tail is hostile input).
  */
class PdfExprsSpec extends SparkSpec {
  import spark.implicits._

  private def encode(np: Int, id: Long): Array[Byte] =
    Seq((np, id)).toDF("np", "id")
      .select(PdfExprs.encodePdf($"np", $"id").as("pdf"))
      .head().getAs[Array[Byte]]("pdf")

  private def meta(b: Array[Byte]): Row =
    Seq(Tuple1(b)).toDF("b").select(PdfExprs.pdfMeta($"b").as("m"))
      .selectExpr("m.version", "m.n_objects", "m.n_pages").head()

  private def text(b: Array[Byte]): String =
    Seq(Tuple1(b)).toDF("b").select(PdfExprs.pdfText($"b").as("t"))
      .head().getString(0)

  private def textOf(s: String): String =
    text(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("encode → meta round-trip: version, object count, page count") {
    for (np <- Seq(1, 2, 5, 64)) {
      val m = meta(encode(np, 42L))
      assert(m.getString(0) === "1.4")
      assert(m.getLong(1) === 3L + 2 * np) // free obj 0 + catalog + pages + np×(page, content)
      assert(m.getLong(2) === np.toLong)
    }
  }

  test("encode → text round-trip covers both raw and FlateDecode streams") {
    // odd pages are Flate-compressed (EncodePdf), so np=4 exercises both
    assert(text(encode(4, 7L)) ===
      (1 to 4).map(i => s"Page $i of 4 #7").mkString(" "))
    assert(text(encode(1, 0L)) === "Page 1 of 1 #0")
  }

  test("out-of-range page counts refuse to encode") {
    val rows = Seq((0, 1L), (65, 1L)).toDF("np", "id")
      .select(PdfExprs.encodePdf($"np", $"id").as("pdf")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  /** Minimal un-xref'd stream wrapper — PdfText walks streams, not xref. */
  private def pdf(streams: (String, String)*): String =
    "%PDF-1.7\n" + streams.map { case (dict, data) =>
      s"1 0 obj << $dict >> stream\n$data\nendstream endobj\n"
    }.mkString

  test("string-escape decoding: backslash escapes, octal, nested parens") {
    val content = "BT (a\\(b\\)c\\\\d\\101) Tj ET"
    assert(textOf(pdf(s"/Length ${content.length}" -> content)) === "a(b)c\\dA")
    val nested = "BT (outer (inner) tail) Tj ET"
    assert(textOf(pdf(s"/Length ${nested.length}" -> nested)) === "outer (inner) tail")
  }

  test("a string literal not followed by Tj is not text output") {
    val content = "(shown) Tj (not shown) TJ (also not) Td"
    assert(textOf(pdf(s"/Length ${content.length}" -> content)) === "shown")
  }

  test("unsupported filters and corrupt Flate streams skip, never throw") {
    val good = "(kept) Tj"
    val s = pdf(
      "/Length 9 /Filter /DCTDecode" -> "ÿØgarbage",
      "/Length 7 /Filter /FlateDecode" -> "notzlib",
      s"/Length ${good.length}" -> good)
    assert(textOf(s) === "kept")
  }

  test("payload quoting 'endstream' survives: /Length wins over markers") {
    val content = "(has endstream inside) Tj"
    assert(textOf(pdf(s"/Length ${content.length}" -> content)) ===
      "has endstream inside")
  }

  test("non-PDF and malformed payloads are null/total, never an error") {
    val rows = Seq(
      "not a pdf".getBytes("UTF-8"),
      Array.emptyByteArray,
      "%PDF-1.4\ntruncated before any stream".getBytes("UTF-8"))
      .toDF("b")
      .select(PdfExprs.pdfMeta($"b").as("m"), PdfExprs.pdfText($"b").as("t"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).isNullAt(0) && rows(2).getString(1) === "") // header ok, no streams
  }

  test("meta is null unless startxref → xref linkage and counts all parse") {
    // valid text streams but a startxref pointing at garbage ⇒ triage fails
    val broken = "%PDF-1.4\ntrailer << /Size 3 >>\nstartxref\n2\n%%EOF\n"
    val m = Seq(Tuple1(broken.getBytes("UTF-8"))).toDF("b")
      .select(PdfExprs.pdfMeta($"b").as("m")).head()
    assert(m.isNullAt(0))
  }

  test("SQL registration: pdf_meta / pdf_text / encode_pdf") {
    graft.ext.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT pdf_meta(p).n_pages AS np, pdf_text(p) AS t FROM " +
        "(SELECT encode_pdf(3, CAST(9 AS BIGINT)) AS p)").head()
    assert(r.getLong(0) === 3L)
    assert(r.getString(1) === "Page 1 of 3 #9 Page 2 of 3 #9 Page 3 of 3 #9")
  }
}
