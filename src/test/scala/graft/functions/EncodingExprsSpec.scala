package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodingExprsSpec extends SparkSpec {
  import spark.implicits._

  private def repair(s: String) = EncodingExprs.repairMojibake(s)
  private def strip(s: String) = EncodingExprs.stripControls(s)

  test("classic mojibake pairs re-decode") {
    // cafe mis-decoded: C3 A9 arrives as A-tilde + copyright-sign
    assert(repair("caf\u00C3\u00A9") === (("caf\u00E9", 1L)))
    // deja: the a-grave continuation byte A0 arrives as NBSP
    assert(repair("d\u00C3\u00A9j\u00C3\u00A0") === (("d\u00E9j\u00E0", 2L)))
    // em dash via C1 specials: E2 80 94
    assert(repair("\u00E2\u20AC\u201D") === (("\u2014", 1L)))
    // the euro sign itself: E2 82 AC
    assert(repair("\u00E2\u201A\u00AC") === (("\u20AC", 1L)))
  }

  test("clean text is untouched and repair is idempotent") {
    val clean = Seq("plain ascii text",
      "caf\u00E9 \u2014 na\u00EFve",   // already-correct accents + em dash
      "\u00C3 alone ends here",  // lead char before a space
      "\u00C3",    // lead char at end of string
      "price 100", "")
    clean.foreach { s =>
      val (once, n) = repair(s)
      assert(once === s && n === 0L, s"altered clean '$s'")
      assert(repair(once) === ((once, 0L)), s"not idempotent on '$s'")
    }
  }

  test("overlong and surrogate-range sequences are rejected") {
    // C0 AF would be overlong '/': C0 is never a valid lead
    assert(repair("\u00C0\u00AF")._2 === 0L)
    // ED A0 80 would be surrogate D800: A0 not allowed after ED
    assert(repair("\u00ED\u00A0\u20AC")._2 === 0L)
    // E0 9F 80 is overlong (E0 needs A0..BF next)
    assert(repair("\u00E0\u0178\u20AC")._2 === 0L)
  }

  test("4-byte sequences decode to astral code points") {
    // U+1F600 grinning face: F0 9F 98 80
    val (t, n) = repair("\u00F0\u0178\u02DC\u20AC")
    assert(n === 1L)
    assert(t.codePointAt(0) === 0x1F600 && t.length === 2)
  }

  test("control strip removes C0/C1/zero-width but keeps tab/newline/cr") {
    assert(strip("a\u0001b\u009Cc") === (("abc", 2L)))
    assert(strip("keep\tthis\nand\r") === (("keep\tthis\nand\r", 0L)))
    assert(strip("z\u200Bw\uFEFFq\u200D") === (("zwq", 3L)))
    assert(strip("\u007F") === (("", 1L)))
    assert(strip("") === (("", 0L)))
  }

  test("expressions evaluate on DataFrames with exact counts") {
    val out = Seq("caf\u00C3\u00A9\u0007 x").toDF("t")
      .withColumn("m", EncodingExprs.mojibakeRepair(col("t")))
      .withColumn("c", EncodingExprs.controlStrip(col("m.text")))
      .select(col("c.text"), col("m.n_changed"), col("c.n_changed"))
      .as[(String, Long, Long)].head()
    assert(out === (("caf\u00E9 x", 1L, 1L)))
  }
}
