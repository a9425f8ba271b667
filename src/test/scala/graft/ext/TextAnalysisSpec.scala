package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text analysis: token/piece counting, ratios, quality score bounds,
  * language ID on marker-bearing snippets, fingerprint stability.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace tokens; piecesCount splits runs") {
    val df = Seq("Hello world 123 foo-bar").toDF("text")
    val r = df.select(TextAnalysis.tokenCount($"text"),
      TextAnalysis.piecesCount($"text")).first()
    assert(r.getLong(0) === 4L)
    // pieces: hello, world, 123, foo, -, bar
    assert(r.getLong(1) === 6L)
  }

  test("piecesCount reads its Column parameter, not a column named 'text'") {
    // regression: an expr("...text...") body silently bound to whatever
    // column was literally named "text"
    val df = Seq(("decoy", "Hello world 123")).toDF("text", "body")
    assert(df.select(TextAnalysis.piecesCount($"body")).first().getLong(0) === 3L)
  }

  test("stopwordRatio and alphaRatio are exact fractions") {
    val df = Seq("the cat and dog").toDF("text")
    val r = df.select(TextAnalysis.stopwordRatio($"text"),
      TextAnalysis.alphaRatio($"text")).first()
    assert(r.getDouble(0) === 0.5) // the, and of 4 tokens
    assert(r.getDouble(1) === 12.0 / 15.0) // 12 letters of 15 chars
  }

  test("qualityScore stays in [0,1]") {
    val df = Seq("short", ("word " * 200).trim, "!!! ??? ###").toDF("text")
    val scores = df.select(TextAnalysis.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("predictedLang identifies marker-heavy snippets deterministically") {
    val df = Seq(
      ("en", "the cat is on the mat and a dog is here"),
      ("de", "der hund und die katze das ist gut und schön"),
      ("es", "el perro y los gatos es bueno y las casas"),
      ("fr", "le chien est petit et les chats est une merveille"),
      ("zh", "这 是 一只 猫 和 一只 狗 在 家 的 里面")
    ).toDF("expected", "text")
    val out = df.select($"expected", TextAnalysis.predictedLang($"text").as("got")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("fingerprint is 16 hex chars, stable, case-insensitive") {
    val df = Seq(("Hello World", "hello world", "other")).toDF("a", "b", "c")
    val r = df.select(TextAnalysis.fingerprint($"a"), TextAnalysis.fingerprint($"b"),
      TextAnalysis.fingerprint($"c")).first()
    assert(r.getString(0).length === 16)
    assert(r.getString(0) === r.getString(1)) // lowercased before hashing
    assert(r.getString(0) !== r.getString(2))
  }

  test("rollingHash is deterministic and order-sensitive") {
    val df = Seq(("abc", "abc", "cba")).toDF("a", "b", "c")
    val r = df.select(TextAnalysis.rollingHash($"a"), TextAnalysis.rollingHash($"b"),
      TextAnalysis.rollingHash($"c")).first()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) !== r.getLong(2))
    // h("abc") = (('a'*31 + 'b')*31 + 'c') mod 1e9+7
    val expected = ((97L * 31 + 98) * 31 + 99) % 1000000007L
    assert(r.getLong(0) === expected)
  }

  test("redactPii masks emails and phone-like digit runs, leaves prose alone") {
    val df = Seq("mail me at jane.doe+x@sub.example.org or call (555) 123-4567 today",
      "no pii here, just 42 words").toDF("text")
    val out = df.select(TextAnalysis.redactPii($"text")).collect().map(_.getString(0))
    assert(out(0) === "mail me at [EMAIL] or call [NUM] today")
    assert(out(1) === "no pii here, just 42 words")
  }

  test("hashSplit is deterministic, stable across evaluation, ~80/20") {
    val df = (1L to 2000L).toDF("id")
    val a = df.select($"id", TextAnalysis.hashSplit($"id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = df.repartition(7).select($"id", TextAnalysis.hashSplit($"id").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b) // partitioning-independent
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.75 && frac < 0.85)
  }

  test("ngrams yields ordered non-distinct n-grams; short text → empty") {
    val df = Seq("a b a b").toDF("text")
    val grams = df.select(TextAnalysis.ngrams($"text", 2)).first().getSeq[String](0)
    assert(grams === Seq("a b", "b a", "a b")) // duplicates preserved
    val short = Seq("one").toDF("text")
      .select(TextAnalysis.ngrams($"text", 2)).first().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("repetitionRatio: 0 for all-distinct and too-short docs, high for stuffed text") {
    def rep(t: String) = Seq(t).toDF("text")
      .select(TextAnalysis.repetitionRatio($"text", 3)).first().getDouble(0)
    assert(rep("every word here is used exactly once") === 0.0)
    assert(rep("hi") === 0.0) // no trigram at all
    // "spam spam spam spam spam" → 3 trigrams, 1 distinct → 1 - 1/3
    assert(rep("spam spam spam spam spam") === 0.6667)
  }

  test("nfcNormalize composes combining sequences; canonicalizeText makes spellings collide") {
    val decomposed = "café"  // e + COMBINING ACUTE
    val composed = "café"     // precomposed é
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
    val out = df.select($"id", TextAnalysis.nfcNormalize($"t").as("n")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === composed) // composed form wins
    assert(out(2L) === composed) // already-normal fast path returns it unchanged
    // the dedup consequence: digests collide only after canonicalization
    val canon = df.select(TextAnalysis.canonicalizeText($"t")).distinct().count()
    val raw = df.select($"t").distinct().count()
    assert(raw === 2 && canon === 1)
  }

  test("canonicalizeText squeezes whitespace runs and trims, preserving inner content") {
    val canon = Seq(Tuple1("  a\t\tb \n c  ")).toDF("t")
      .select(TextAnalysis.canonicalizeText($"t")).first().getString(0)
    assert(canon === "a b c")
    // idempotent: canonical text is its own canonical form
    val twice = Seq(Tuple1(canon)).toDF("t")
      .select(TextAnalysis.canonicalizeText($"t")).first().getString(0)
    assert(twice === canon)
  }

  test("extractUrls/urlDomain: extraction, www-strip, case-fold, no-URL docs") {
    val df = Seq(
      (1L, "plain text, no links at all"),
      (2L, "see https://WWW.Example.ORG/a/b?x=1 and http://cdn.ex.net/j.js end"),
      (3L, "bare http:// inside prose should not panic https://ok.io")
    ).toDF("id", "t")
    val out = df.select($"id", TextAnalysis.linkStats($"t").as("ls"))
      .select($"id", $"ls.n_urls", $"ls.domains")
      .orderBy("id").collect()
    assert(out(0).getLong(1) === 0L && out(0).getSeq[String](2) === Seq.empty)
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getSeq[String](2) === Seq("cdn.ex.net", "example.org"))
    // "http://" with no host yields an empty-domain entry dropped by the
    // authority group being empty → domain "" still sorts first; the real
    // URL's domain survives
    assert(out(2).getSeq[String](2).contains("ok.io"))
  }

  test("multiPatternCounts: overlapping, nested, and fail-link matches all count") {
    import graft.functions.TextExprs
    def counts(text: String, pats: Seq[String]): Seq[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(TextExprs.multiPatternCounts($"t", pats).as("c"))
        .collect().head.getSeq[Long](0)
    // overlapping self-matches: "aa" in "aaaa" ends at positions 2,3,4
    assert(counts("aaaa", Seq("aa")) === Seq(3L))
    // nested pattern: every "table" also completes "able"
    assert(counts("a table is stable", Seq("table", "able")) === Seq(2L, 2L))
    // fail-link case: "she" completes "he" mid-walk (the classic AC example)
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
    // no match, empty text, and multi-char disjoint patterns
    assert(counts("", Seq("x")) === Seq(0L))
    assert(counts("spark shuffles", Seq("zzz", "spark", "huff")) === Seq(0L, 1L, 1L))
    // non-ASCII pattern chars route through the wide-char table
    assert(counts("café café cafe", Seq("café", "cafe")) === Seq(2L, 1L))
  }

  test("multiPatternCounts agrees with a naive scan on word-soup rows") {
    import graft.functions.TextExprs
    val pats = Seq("fast", "table", "able", "a a", "scan slow", "zzzz")
    def naive(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
    val texts = Seq(
      "key agg row scan slow fast table value part hash a a a the line sort",
      "scan slowscan slow a a a a fasttablefast", "", "zz z z zzz zz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select($"id", TextExprs.multiPatternCounts($"t", pats).as("c"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) === pats.map(naive(t, _)), s"row $i")
    }
  }
}
