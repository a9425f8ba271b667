package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher rule filter: each rule trips on a crafted document, in the
  * published precedence order, with integer-exact signals.
  */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  private def verdict(text: String, minWords: Int = 50): (Long, Option[String]) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = GopherFilter.gopherRules(df, col("doc_id"), col("text"), minWords)
      .select("keep", "first_fail").first()
    (r.getLong(0), Option(r.getString(1)))
  }

  test("a clean document passes every rule") {
    // 52 distinct-ish words, mean length ~4.6, two stopwords, no symbols
    val words = (1 to 50).map(i => s"word$i") ++ Seq("the", "with")
    val (keep, fail) = verdict(words.mkString(" "))
    assert(keep === 1L && fail.isEmpty)
  }

  test("short document fails word_count first") {
    assert(verdict("the quick brown fox") === ((0L, Some("word_count"))))
  }

  test("degenerate word lengths fail word_length after word_count passes") {
    val (keep, fail) = verdict(Seq.fill(60)("a").mkString(" "))
    assert(keep === 0L && fail === Some("word_length"))
  }

  test("hash/ellipsis density fails symbol_ratio") {
    // words carry letters (alpha passes later anyway) but every word has a
    // '#': 60 symbols for 60 words → 10·60 > 60
    val (keep, fail) = verdict((1 to 60).map(i => s"tag#$i").mkString(" "))
    assert(keep === 0L && fail === Some("symbol_ratio"))
  }

  test("letterless tokens fail alpha_words") {
    // >20% pure-number words; lengths kept in [3,10]
    val words = (1 to 40).map(i => s"word$i") ++ (100 to 119).map(_.toString)
    val (keep, fail) = verdict(words.mkString(" "))
    assert(keep === 0L && fail === Some("alpha_words"))
  }

  test("missing stopwords fail the stopword rule") {
    val (keep, fail) = verdict(Seq.fill(20)("cat dog fox").mkString(" "))
    assert(keep === 0L && fail === Some("stopwords"))
  }

  test("heavy 3-gram repetition fails dup_3gram last") {
    val (keep, fail) = verdict(Seq.fill(15)("the cat and dog").mkString(" "))
    assert(keep === 0L && fail === Some("dup_3gram"))
  }

  test("ellipsis runs count three chars per hit") {
    val df = Seq((1L, "wait... what... no")).toDF("doc_id", "text")
    val sym = GopherFilter.gopherRules(df, col("doc_id"), col("text"))
      .select("sym_hits").first().getLong(0)
    assert(sym === 2L)
  }
}
