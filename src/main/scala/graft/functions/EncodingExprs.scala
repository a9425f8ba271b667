package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Encoding repair for web-scale text ingest: the two dominant defects in
  * crawled corpora are MOJIBAKE (UTF-8 bytes mis-decoded as Windows-1252 —
  * "café" arriving as "cafÃ©") and stray control/zero-width characters.
  * Both repairs are single-pass native expressions (no UDF), each
  * returning the repaired text TOGETHER with an exact repair count — the
  * count is the quality signal a filter gate thresholds on, and riding it
  * in the same struct means one pass, not two.
  *
  * The mojibake repair is strict: a character run is re-decoded only when
  * its inverse-CP1252 bytes form a VALID, shortest-form UTF-8 sequence
  * (overlongs and surrogate range rejected) — plain western text that
  * legitimately uses Ã/â as letters is touched only when followed by
  * exact continuation patterns, which natural text essentially never
  * produces. Repair is idempotent on clean text; one application undoes
  * one level of double encoding (apply again for deeper nesting).
  */
object EncodingExprs {

  /** char value → the CP1252 byte that decodes to it, or -1. Identity for
    * 0x00-0x7F and 0xA0-0xFF; the 0x80-0x9F window holds CP1252's
    * specials (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) with
    * the five undefined bytes passing through as their C1 code points,
    * which is how JVM/ICU CP1252 decoders emit them. */
  private val inv: java.util.HashMap[Char, Int] = {
    val m = new java.util.HashMap[Char, Int](512)
    (0 until 0x80).foreach(c => m.put(c.toChar, c))
    (0xA0 to 0xFF).foreach(c => m.put(c.toChar, c))
    val c1 = Array(0x20AC, 0x81, 0x201A, 0x192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x2C6, 0x2030, 0x160, 0x2039, 0x152, 0x8D, 0x17D, 0x8F,
      0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x2DC, 0x2122, 0x161, 0x203A, 0x153, 0x9D, 0x17E, 0x178)
    c1.zipWithIndex.foreach { case (cp, i) => m.put(cp.toChar, 0x80 + i) }
    m
  }

  private def invByte(c: Char): Int = {
    val v = inv.get(c)
    if (v == null) -1 else v.intValue
  }

  private def isCont(b: Int): Boolean = b >= 0x80 && b <= 0xBF

  /** Strict shortest-form UTF-8 sequence check over inverse bytes starting
    * at chars(i); returns the decoded code point and consumed char count,
    * or null. */
  private def tryDecode(s: String, i: Int): Array[Int] = {
    val b0 = invByte(s.charAt(i))
    if (b0 < 0xC2 || b0 > 0xF4) return null
    val need = if (b0 <= 0xDF) 2 else if (b0 <= 0xEF) 3 else 4
    if (i + need > s.length) return null
    val b1 = invByte(s.charAt(i + 1))
    if (b1 < 0) return null
    val ok1 = b0 match {
      case 0xE0 => b1 >= 0xA0 && b1 <= 0xBF
      case 0xED => b1 >= 0x80 && b1 <= 0x9F
      case 0xF0 => b1 >= 0x90 && b1 <= 0xBF
      case 0xF4 => b1 >= 0x80 && b1 <= 0x8F
      case _    => isCont(b1)
    }
    if (!ok1) return null
    var cp = b0 match {
      case _ if need == 2 => (b0 & 0x1F) << 6 | (b1 & 0x3F)
      case _ if need == 3 => (b0 & 0x0F) << 12 | (b1 & 0x3F) << 6
      case _              => (b0 & 0x07) << 18 | (b1 & 0x3F) << 12
    }
    if (need >= 3) {
      val b2 = invByte(s.charAt(i + 2))
      if (!isCont(b2)) return null
      cp |= (if (need == 3) (b2 & 0x3F) else (b2 & 0x3F) << 6)
    }
    if (need == 4) {
      val b3 = invByte(s.charAt(i + 3))
      if (!isCont(b3)) return null
      cp |= (b3 & 0x3F)
    }
    Array(cp, need)
  }

  /** One repair pass: (repaired text, sequences fixed). */
  def repairMojibake(s: String): (String, Long) = {
    val sb = new java.lang.StringBuilder(s.length)
    var fixed = 0L
    var i = 0
    while (i < s.length) {
      val d = tryDecode(s, i)
      if (d != null) {
        sb.appendCodePoint(d(0)); i += d(1); fixed += 1
      } else {
        sb.append(s.charAt(i)); i += 1
      }
    }
    (sb.toString, fixed)
  }

  /** Strip C0/C1 controls (except \t \n \r) and the common zero-width
    * format chars (ZWSP/ZWNJ/ZWJ/BOM): (stripped text, chars removed). */
  def stripControls(s: String): (String, Long) = {
    val sb = new java.lang.StringBuilder(s.length)
    var removed = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isCtl = (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
        (c >= 0x7F && c <= 0x9F) ||
        c == '\u200B' || c == '\u200C' || c == '\u200D' || c == '\uFEFF'
      if (isCtl) removed += 1 else sb.append(c)
      i += 1
    }
    (sb.toString, removed)
  }

  private val outType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_changed", LongType, nullable = false)))

  /** text → struct(text repaired, n_changed) — mojibake re-decode. */
  case class MojibakeRepair(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = outType
    override def prettyName: String = "mojibake_repair"
    override protected def nullSafeEval(input: Any): Any = {
      val (t, n) = repairMojibake(input.asInstanceOf[UTF8String].toString)
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), n))
    }
    override protected def withNewChildInternal(newChild: Expression): MojibakeRepair =
      copy(child = newChild)
  }

  /** text → struct(text stripped, n_changed) — control/zero-width strip. */
  case class ControlStrip(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = outType
    override def prettyName: String = "control_strip"
    override protected def nullSafeEval(input: Any): Any = {
      val (t, n) = stripControls(input.asInstanceOf[UTF8String].toString)
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), n))
    }
    override protected def withNewChildInternal(newChild: Expression): ControlStrip =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn => column, toExpression => expression}
  def mojibakeRepair(text: Column): Column = column(MojibakeRepair(expression(text)))
  def controlStrip(text: Column): Column = column(ControlStrip(expression(text)))
}
