package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → training-text extraction, the step every web-crawl corpus
  * (C4, CCNet, RefinedWeb all describe it) runs before any quality filter:
  * strip markup, keep visible text, and measure link density — boilerplate
  * pages (nav menus, link farms) have most of their visible characters
  * inside anchors and get dropped.
  *
  * [[HtmlExtract]] is a single-pass parser over the PUBLIC HTML syntax, no
  * library: comments and `<script>`/`<style>`/`<head>` subtrees are
  * dropped wholesale, every other tag becomes a word separator, the five
  * named entities (`&amp; &lt; &gt; &quot; &apos;`) plus numeric `&#NN;`
  * decode, whitespace runs collapse to single spaces. Deliberately
  * total: malformed input (unclosed tags, stray `<`, attribute quotes
  * running off the end) degrades to best-effort text, never throws and
  * never loops — at 100 TB of crawled pages the malformed tail is large.
  *
  * CodegenFallback by design: per-row work is a character-walk over
  * variable-length text, not expression arithmetic.
  */
object HtmlExprs {

  /** Struct returned by [[HtmlExtract]]: the extracted text, its length,
    * the count of non-whitespace visible characters inside `<a>` elements
    * (link-density numerator — exact integers hash stably, a ratio
    * wouldn't), and the anchor count. */
  val htmlExtractType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("text_chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false),
    StructField("n_links", LongType, nullable = false)))

  private val droppedSubtrees = Set("script", "style", "head")

  case class HtmlExtract(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = htmlExtractType
    override def nullable: Boolean = true
    override def prettyName: String = "html_extract"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"html_extract needs STRING input, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(input: Any): Any = {
      val html = input.asInstanceOf[UTF8String].toString
      val n = html.length
      val raw = new java.lang.StringBuilder(n)
      var linkDepth = 0
      var linkChars = 0L
      var nLinks = 0L
      var i = 0
      while (i < n) {
        val c = html.charAt(i)
        if (c == '<') {
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            raw.append(' ')
            i = if (end < 0) n else end + 3
          } else if (i + 1 < n &&
              (isNameStart(html.charAt(i + 1)) || html.charAt(i + 1) == '/' ||
                html.charAt(i + 1) == '!')) {
            val closing = html.charAt(i + 1) == '/'
            var j = i + (if (closing) 2 else 1)
            val nameStart = j
            while (j < n && isNameChar(html.charAt(j))) j += 1
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            // scan to the tag's '>' honoring quoted attribute values (an
            // href may contain '>'); unterminated tag swallows the rest
            var q: Char = 0
            while (j < n && (q != 0 || html.charAt(j) != '>')) {
              val cj = html.charAt(j)
              if (q != 0) { if (cj == q) q = 0 }
              else if (cj == '"' || cj == '\'') q = cj
              j += 1
            }
            val selfClosing = j < n && j > i && html.charAt(j - 1) == '/'
            val tagEnd = if (j < n) j + 1 else n
            raw.append(' ')
            if (!closing && !selfClosing && droppedSubtrees(name)) {
              // drop the whole subtree: skip to the matching close tag
              // (first "</name" — HTML's own rule for script/style, whose
              // content is raw text, not nested markup)
              val close = indexOfCloseTag(html, tagEnd, name)
              i = if (close < 0) n else {
                val gt = html.indexOf('>', close)
                if (gt < 0) n else gt + 1
              }
            } else {
              if (name == "a") {
                if (closing) { if (linkDepth > 0) linkDepth -= 1 }
                else if (!selfClosing) { linkDepth += 1; nLinks += 1 }
              }
              i = tagEnd
            }
          } else {
            raw.append(c) // literal '<' not opening a tag
            i += 1
          }
        } else if (c == '&') {
          val (decoded, next) = decodeEntity(html, i)
          raw.append(decoded)
          if (linkDepth > 0) linkChars += countNonSpace(decoded)
          i = next
        } else {
          raw.append(c)
          if (linkDepth > 0 && !Character.isWhitespace(c)) linkChars += 1
          i += 1
        }
      }
      // collapse whitespace runs to single spaces, trim
      val out = new java.lang.StringBuilder(raw.length)
      var k = 0
      var pendingSpace = false
      while (k < raw.length) {
        val c = raw.charAt(k)
        if (Character.isWhitespace(c)) pendingSpace = out.length > 0
        else {
          if (pendingSpace) { out.append(' '); pendingSpace = false }
          out.append(c)
        }
        k += 1
      }
      val text = out.toString
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(text), text.length.toLong, linkChars, nLinks))
    }

    private def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    private def isNameChar(c: Char): Boolean =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == ':'

    private def indexOfCloseTag(html: String, from: Int, name: String): Int = {
      val needle = "</" + name
      var i = from
      while (i >= 0) {
        i = html.indexOf(needle, i)
        if (i < 0) return -1
        val after = i + needle.length
        // must be followed by '>' or whitespace (reject "</scriptx")
        if (after >= html.length || html.charAt(after) == '>' ||
            Character.isWhitespace(html.charAt(after))) return i
        i = after
      }
      -1
    }

    /** Decode the entity at `i` (which points at '&'); returns the decoded
      * string and the index after the entity. Unrecognized entities pass
      * through as a literal '&'. */
    private def decodeEntity(html: String, i: Int): (String, Int) = {
      val semi = html.indexOf(';', i + 1)
      if (semi < 0 || semi - i > 10) return ("&", i + 1)
      html.substring(i + 1, semi) match {
        case "amp" => ("&", semi + 1)
        case "lt" => ("<", semi + 1)
        case "gt" => (">", semi + 1)
        case "quot" => ("\"", semi + 1)
        case "apos" => ("'", semi + 1)
        case body if body.length > 1 && body.charAt(0) == '#' &&
            body.drop(1).forall(c => c >= '0' && c <= '9') =>
          val cp = body.drop(1).toLong
          if (cp > 0 && cp <= Character.MAX_CODE_POINT)
            (new String(Character.toChars(cp.toInt)), semi + 1)
          else ("&", i + 1)
        case _ => ("&", i + 1)
      }
    }

    private def countNonSpace(s: String): Long =
      s.count(c => !Character.isWhitespace(c)).toLong

    override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
      copy(child = newChild)
  }

  // Column-level wrappers
  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def htmlExtract(html: Column): Column = column(HtmlExtract(expression(html)))
}
