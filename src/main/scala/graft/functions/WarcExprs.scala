package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC/WET container parsing — the on-disk shape of a web crawl (Common
  * Crawl ships WARC response captures and WET text conversions; C4, CCNet
  * and RefinedWeb all start by iterating these records). A file is just
  * records back-to-back:
  *
  * {{{
  * WARC/1.0\r\n
  * <Header-Name>: <value>\r\n ...
  * Content-Length: N\r\n
  * \r\n
  * <exactly N payload bytes>\r\n\r\n
  * }}}
  *
  * [[WarcRecords]] walks that structure over the UTF-8 BYTES of its input
  * (Content-Length counts bytes, not chars — multi-byte text would skew a
  * character walk) and returns one struct per record. The payload is
  * delimited ONLY by Content-Length, exactly as the spec demands: a
  * payload that itself contains `WARC/1.0` lines passes through intact
  * instead of splitting the file — the property a marker-scanning parser
  * gets wrong on adversarial pages. Deliberately total: a malformed
  * record (bad version line, unparsable or overlong Content-Length,
  * truncated payload) ends the walk and the records parsed so far are
  * returned — at crawl scale the corrupt tail is data loss to account
  * for, not an exception to throw.
  *
  * CodegenFallback by design: per-row work is a byte-walk over
  * variable-length payloads, not expression arithmetic.
  */
object WarcExprs {

  /** Struct per parsed record: target URI and record type from the
    * headers (empty string when absent), the declared Content-Length in
    * bytes, and the payload decoded as UTF-8 text. */
  val warcRecordType: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  case class WarcRecords(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(warcRecordType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "warc_records"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"warc_records needs STRING input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[UTF8String].getBytes
      val n = b.length
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericInternalRow]
      var i = 0
      var ok = true
      while (ok && i < n) {
        // version line: "WARC/" ... CRLF
        if (!startsWith(b, i, "WARC/")) ok = false
        else {
          val verEnd = indexOfCrlf(b, i)
          if (verEnd < 0) ok = false
          else {
            var j = verEnd + 2
            var uri = ""
            var recType = ""
            var contentLength = -1L
            var headersDone = false
            while (ok && !headersDone) {
              if (j + 1 < n && b(j) == '\r' && b(j + 1) == '\n') {
                headersDone = true; j += 2
              } else {
                val lineEnd = indexOfCrlf(b, j)
                if (lineEnd < 0) ok = false
                else {
                  val colon = indexOfByte(b, j, lineEnd, ':')
                  if (colon >= 0) {
                    val name = asciiLower(b, j, colon)
                    val value = trimmedString(b, colon + 1, lineEnd)
                    name match {
                      case "warc-target-uri" => uri = value
                      case "warc-type" => recType = value
                      case "content-length" =>
                        contentLength = parseLen(value)
                        if (contentLength < 0) ok = false
                      case _ => ()
                    }
                  } // headerless junk line: skipped, walk continues
                  j = lineEnd + 2
                }
              }
            }
            if (ok) {
              if (contentLength < 0 || j + contentLength > n) ok = false
              else {
                val payload = UTF8String.fromBytes(b, j, contentLength.toInt)
                out += new GenericInternalRow(Array[Any](
                  UTF8String.fromString(uri), UTF8String.fromString(recType),
                  contentLength, payload))
                i = (j + contentLength).toInt
                // tolerate the canonical record terminator (two CRLFs) or
                // any shorter run before the next version line
                var skipped = 0
                while (i + 1 < n && skipped < 2 &&
                    b(i) == '\r' && b(i + 1) == '\n') { i += 2; skipped += 1 }
              }
            }
          }
        }
      }
      new GenericArrayData(out.toArray[Any])
    }

    private def startsWith(b: Array[Byte], i: Int, s: String): Boolean = {
      if (i + s.length > b.length) return false
      var k = 0
      while (k < s.length) {
        if (b(i + k) != s.charAt(k).toByte) return false
        k += 1
      }
      true
    }

    private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
      var i = from
      while (i + 1 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n') return i
        i += 1
      }
      -1
    }

    private def indexOfByte(b: Array[Byte], from: Int, to: Int, c: Char): Int = {
      var i = from
      while (i < to) {
        if (b(i) == c.toByte) return i
        i += 1
      }
      -1
    }

    private def asciiLower(b: Array[Byte], from: Int, to: Int): String = {
      val sb = new java.lang.StringBuilder(to - from)
      var i = from
      while (i < to) {
        val c = b(i).toChar
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        i += 1
      }
      sb.toString
    }

    private def trimmedString(b: Array[Byte], from: Int, to: Int): String = {
      var s = from
      var e = to
      while (s < e && (b(s) == ' ' || b(s) == '\t')) s += 1
      while (e > s && (b(e - 1) == ' ' || b(e - 1) == '\t')) e -= 1
      new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
    }

    /** Content-Length as a non-negative long; -1 for anything unparsable
      * or beyond Int.MaxValue (a single record can't exceed the input). */
    private def parseLen(s: String): Long = {
      if (s.isEmpty || s.length > 10 || !s.forall(c => c >= '0' && c <= '9')) return -1L
      val v = s.toLong
      if (v > Int.MaxValue) -1L else v
    }

    override protected def withNewChildInternal(newChild: Expression): WarcRecords =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def warcRecords(file: Column): Column = column(WarcRecords(expression(file)))
}
