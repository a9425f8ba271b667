package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF structure decode — the document-side multimodal family (PDF is the
  * dominant non-HTML document format in crawled corpora; a curation
  * pipeline triages by metadata, then extracts text for the quality
  * filters). Pure-JVM byte walks over the PUBLIC PDF file structure
  * (header, xref table, trailer dictionary, content streams) — no
  * library:
  *
  *  - [[PdfMeta]] reads the header version, validates that `startxref`
  *    points at an actual xref table, and reads `/Size` (object count)
  *    from the trailer and `/Count` (page count) from the `/Type /Pages`
  *    node — header-only triage, never touches stream data.
  *  - [[PdfText]] walks every content stream (`/Length`-delimited, the
  *    spec's rule — compressed bytes may contain `endstream` as a
  *    substring), inflates `/FlateDecode` streams (zlib — the dominant
  *    PDF filter) with `java.util.zip.Inflater`, and collects `(…) Tj`
  *    text-show operands with PDF string-escape decoding (backslash
  *    escapes, octal, balanced nested parens). Unsupported filters and
  *    corrupt streams are skipped, not thrown — the malformed tail of a
  *    crawl is data loss to account for.
  *  - [[EncodePdf]] is the round-trip fixture generator: a real
  *    multi-page PDF (catalog → pages tree → page → content stream, valid
  *    xref byte offsets) whose per-page text is a pure function of the
  *    arguments; alternating pages are Flate-compressed so both stream
  *    paths are load-bearing in one document.
  *
  * Null for payloads that don't start with `%PDF-` (decode contract of
  * the media family). CodegenFallback by design: per-row byte walks, not
  * expression arithmetic.
  */
object PdfExprs {

  val pdfMetaType: StructType = StructType(Seq(
    StructField("version", StringType, nullable = false),
    StructField("n_objects", LongType, nullable = false),
    StructField("n_pages", LongType, nullable = false)))

  /** (nPages, docId) → deterministic multi-page PDF bytes. */
  case class EncodePdf(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "encode_pdf"
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == IntegerType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"encode_pdf needs (INT, BIGINT), got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")

    override protected def nullSafeEval(np0: Any, id0: Any): Any = {
      val np = np0.asInstanceOf[Int]
      val id = id0.asInstanceOf[Long]
      if (np < 1 || np > 64) return null
      val buf = new java.io.ByteArrayOutputStream(1024 + np * 256)
      def ascii(s: String): Unit = buf.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val m = 3 + 2 * np // object count incl. the free object 0
      val offsets = new Array[Long](m)
      ascii("%PDF-1.4\n")
      offsets(1) = buf.size.toLong
      ascii("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
      offsets(2) = buf.size.toLong
      ascii("2 0 obj << /Type /Pages /Kids [" +
        (0 until np).map(i => s"${3 + i} 0 R").mkString(" ") +
        s"] /Count $np >> endobj\n")
      var i = 0
      while (i < np) {
        offsets(3 + i) = buf.size.toLong
        ascii(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
          s"/Contents ${3 + np + i} 0 R >> endobj\n")
        i += 1
      }
      i = 0
      while (i < np) {
        val content = s"BT /F1 12 Tf 72 712 Td (${escapeString(s"Page ${i + 1} of $np #$id")}) Tj ET"
        val raw = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        // alternating pages exercise both stream paths in one document
        val (data, filter) =
          if (i % 2 == 1) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
        offsets(3 + np + i) = buf.size.toLong
        ascii(s"${3 + np + i} 0 obj << /Length ${data.length}$filter >> stream\n")
        buf.write(data)
        ascii("\nendstream endobj\n")
        i += 1
      }
      val xrefOff = buf.size.toLong
      ascii(s"xref\n0 $m\n0000000000 65535 f \n")
      var o = 1
      while (o < m) {
        ascii("%010d 00000 n \n".format(offsets(o)))
        o += 1
      }
      ascii(s"trailer << /Size $m /Root 1 0 R >>\nstartxref\n$xrefOff\n")
      ascii("%%EOF\n")
      buf.toByteArray
    }

    private def escapeString(s: String): String =
      s.flatMap {
        case '\\' => "\\\\"
        case '(' => "\\("
        case ')' => "\\)"
        case c => c.toString
      }

    private def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
      val tmp = new Array[Byte](256)
      while (!d.finished()) {
        val n = d.deflate(tmp)
        out.write(tmp, 0, n)
      }
      d.end()
      out.toByteArray
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): EncodePdf =
      copy(left = l, right = r)
  }

  /** Header-only triage: (version, n_objects, n_pages). Null unless the
    * header, startxref→xref linkage, trailer `/Size`, and pages-tree
    * `/Count` all parse — a file failing any of those needs the
    * quarantine path, not a half-filled struct. */
  case class PdfMeta(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = pdfMetaType
    override def nullable: Boolean = true
    override def prettyName: String = "pdf_meta"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pdf_meta needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!s.startsWith("%PDF-")) return null
      var verEnd = 5
      while (verEnd < s.length && s.charAt(verEnd) != '\r' && s.charAt(verEnd) != '\n') verEnd += 1
      val version = s.substring(5, verEnd)
      // last startxref → the byte offset of the (final) xref table
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) return null
      val off = parseLongAfter(s, sx + 9)
      if (off < 0 || off >= s.length || !s.startsWith("xref", off.toInt)) return null
      val tr = s.indexOf("trailer", off.toInt)
      if (tr < 0) return null
      val size = parseKeyedLong(s, tr, "/Size")
      val pages = s.indexOf("/Type /Pages")
      if (size < 0 || pages < 0) return null
      val count = parseKeyedLong(s, pages, "/Count")
      if (count < 0) return null
      new GenericInternalRow(Array[Any](UTF8String.fromString(version), size, count))
    }

    private def parseLongAfter(s: String, from: Int): Long = {
      var i = from
      while (i < s.length && (s.charAt(i) == '\r' || s.charAt(i) == '\n' ||
        s.charAt(i) == ' ')) i += 1
      var v = -1L
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (s.charAt(i) - '0')
        if (v > Int.MaxValue) return -1L
        i += 1
      }
      v
    }

    /** `key N` within the dictionary starting at/after `from` (bounded by
      * the dict's closing `>>`); -1 when absent. */
    private def parseKeyedLong(s: String, from: Int, key: String): Long = {
      val end = s.indexOf(">>", from)
      val k = s.indexOf(key, from)
      if (k < 0 || (end >= 0 && k > end)) return -1L
      parseLongAfter(s, k + key.length)
    }

    override protected def withNewChildInternal(newChild: Expression): PdfMeta =
      copy(child = newChild)
  }

  /** All `(…) Tj` text runs from all content streams, in file order,
    * joined by single spaces. `/FlateDecode` streams inflate for real;
    * streams with other filters or corrupt data are skipped. Null for
    * non-PDF payloads. */
  case class PdfText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "pdf_text"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"pdf_text needs BINARY input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!s.startsWith("%PDF-")) return null
      val out = new StringBuilder
      var i = 0
      while (true) {
        val sk = s.indexOf("stream", i)
        if (sk < 0) return UTF8String.fromString(out.toString)
        // "endstream" contains "stream" — only a dict-followed keyword
        // with an EOL after it opens stream data
        var dataStart = sk + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val dictStart = s.lastIndexOf("<<", sk)
        val dict = if (dictStart >= 0) s.substring(dictStart, sk) else ""
        val isOpen = dict.nonEmpty && dataStart > sk + 6 &&
          (sk == 0 || s.charAt(sk - 1) != 'd') // not "endstream"
        if (!isOpen) i = sk + 6
        else {
          val len = parseLength(dict)
          val end =
            if (len >= 0 && dataStart + len <= s.length) dataStart + len.toInt
            else {
              val e = s.indexOf("endstream", dataStart)
              if (e < 0) s.length else math.max(dataStart, e - 1) // drop EOL
            }
          val data = java.util.Arrays.copyOfRange(b, dataStart, end)
          val decoded: Option[Array[Byte]] =
            if (!dict.contains("/Filter")) Some(data)
            else if (dict.contains("/FlateDecode")) inflate(data)
            else None // unsupported filter: skip the stream
          decoded.foreach { d =>
            extractTj(new String(d, java.nio.charset.StandardCharsets.ISO_8859_1), out)
          }
          i = end
        }
      }
      null // unreachable
    }

    private def parseLength(dict: String): Long = {
      val k = dict.indexOf("/Length")
      if (k < 0) return -1L
      var i = k + 7
      while (i < dict.length && dict.charAt(i) == ' ') i += 1
      var v = -1L
      while (i < dict.length && dict.charAt(i) >= '0' && dict.charAt(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10 + (dict.charAt(i) - '0')
        if (v > Int.MaxValue) return -1L
        i += 1
      }
      v
    }

    private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
      try {
        val inf = new java.util.zip.Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
        val tmp = new Array[Byte](4096)
        var total = 0
        while (!inf.finished() && !inf.needsInput()) {
          val n = inf.inflate(tmp)
          if (n == 0 && !inf.finished()) { inf.end(); return None }
          total += n
          if (total > 64 * 1024 * 1024) { inf.end(); return None } // bomb guard
          out.write(tmp, 0, n)
        }
        val done = inf.finished()
        inf.end()
        if (done) Some(out.toByteArray) else None
      } catch {
        case _: java.util.zip.DataFormatException => None
      }
    }

    /** Collect `(string) Tj` operands with PDF escape decoding: backslash
      * escapes (n r t b f, `\(`, `\)`, `\\`, octal `\ddd`) and balanced
      * unescaped parens nesting inside the literal. */
    private def extractTj(content: String, out: StringBuilder): Unit = {
      var i = 0
      while (i < content.length) {
        if (content.charAt(i) == '(') {
          val run = new StringBuilder
          var depth = 1
          var j = i + 1
          while (j < content.length && depth > 0) {
            val c = content.charAt(j)
            if (c == '\\' && j + 1 < content.length) {
              val e = content.charAt(j + 1)
              e match {
                case 'n' => run.append('\n'); j += 2
                case 'r' => run.append('\r'); j += 2
                case 't' => run.append('\t'); j += 2
                case 'b' => run.append('\b'); j += 2
                case 'f' => run.append('\f'); j += 2
                case d if d >= '0' && d <= '7' =>
                  var oct = 0
                  var k = j + 1
                  while (k < content.length && k < j + 4 &&
                      content.charAt(k) >= '0' && content.charAt(k) <= '7') {
                    oct = oct * 8 + (content.charAt(k) - '0')
                    k += 1
                  }
                  run.append((oct & 0xff).toChar)
                  j = k
                case other => run.append(other); j += 2
              }
            } else {
              if (c == '(') { depth += 1; run.append(c) }
              else if (c == ')') { depth -= 1; if (depth > 0) run.append(c) }
              else run.append(c)
              j += 1
            }
          }
          // operator after the literal: whitespace then Tj
          var k = j
          while (k < content.length && (content.charAt(k) == ' ' ||
            content.charAt(k) == '\r' || content.charAt(k) == '\n')) k += 1
          if (k + 1 < content.length && content.charAt(k) == 'T' &&
              content.charAt(k + 1) == 'j') {
            if (out.nonEmpty) out.append(' ')
            out.append(run)
          }
          i = j
        } else i += 1
      }
    }

    override protected def withNewChildInternal(newChild: Expression): PdfText =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def encodePdf(nPages: Column, docId: Column): Column =
    column(EncodePdf(expression(nPages.cast("int")), expression(docId.cast("long"))))
  def pdfMeta(payload: Column): Column = column(PdfMeta(expression(payload)))
  def pdfText(payload: Column): Column = column(PdfText(expression(payload)))
}
