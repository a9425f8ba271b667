package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, fingerprinting. Pure expression pipelines (codegen'd
  * narrow projections — zero shuffles until the caller aggregates).
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish piece count: runs of letters, runs of digits, single other
    * non-space chars — a cheap proxy for subword token counts. Built with
    * call_function so the `text` PARAMETER is used (an expr("...text...")
    * string would capture whatever column happens to be named "text"). */
  def piecesCount(text: Column): Column =
    size(call_function("regexp_extract_all",
      lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** REAL subword token count: byte-level BPE (GPT-2-style pre-tokenizer,
    * byte↔unicode alphabet, greedy merges) over the repo-trained default
    * vocab — see [[graft.functions.Bpe]]. This is the number packing and
    * mixing budgets should run on; [[piecesCount]] stays as the cheap
    * regex proxy. */
  def bpeCount(text: Column): Column = graft.functions.GraftBpe.bpeCount(text)

  /** BPE token array (byte-mapped alphabet); lossless —
    * [[bpeDetok]] inverts it exactly. */
  def bpeTokens(text: Column): Column = graft.functions.GraftBpe.bpeTokens(text)

  def bpeDetok(tokens: Column): Column = graft.functions.GraftBpe.bpeDetok(tokens)

  private val stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Fraction of tokens that are stopwords (int-ratio → deterministic). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, x => x.isInCollection(stopwords))).cast("double") / size(t)
  }

  /** Fraction of characters that are ascii letters (null for empty text —
    * try_divide keeps ANSI mode from throwing on length 0). */
  def alphaRatio(text: Column): Column =
    try_divide(length(regexp_replace(lower(text), "[^a-z]", "")).cast("double"), length(text))

  /** Mean token length, 2 decimals — exact integer half-up rounding
    * (⌊(chars·100 + n/2)/n⌋/100): `round(sum/n, 2)` diverges between
    * engines when the quotient lands on a half-cent representation
    * boundary (bit at sf0.001, doc 77). */
  def avgTokenLength(text: Column): Column = {
    val t = tokens(text)
    val chars = aggregate(t, lit(0L), (acc, x) => acc + length(x))
    val n = size(t).cast("long")
    // same exact-integer shape as Det.moneyAvg (int / on longs would yield
    // double in Spark; shiftright keeps it integral)
    floor((chars * 100 + shiftright(n, 1)).cast("double") / n) / 100.0
  }

  /** Composite quality score in [0,1]: length component + lexical diversity
    * + alpha ratio. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenComponent = least(size(t).cast("double") / 100.0, lit(1.0))
    val diversity = size(array_distinct(t)).cast("double") / size(t)
    round(lenComponent * 0.4 + diversity * 0.3 + alphaRatio(text) * 0.3, 3)
  }

  /** Marker-word language ID (n-gram/stopword heuristic). Deterministic
    * tie-break: first language in fixed (alphabetical) order wins on ≥. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "les", "est", "et", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), x => x.isInCollection(markers))).cast("long")

  def predictedLang(text: Column): Column = {
    // one native tokenize+count pass for all languages (the per-language
    // HOF filters re-tokenized the text per language, interpreted)
    val counts = graft.functions.TextExprs.markerCounts(text, langMarkers.map(_._2))
    val scores = langMarkers.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(counts, i + 1)
    }
    // lang wins if its score >= max of all later langs (earlier-listed wins ties)
    scores.init.zipWithIndex.foldLeft(null.asInstanceOf[Column]) { case (acc, ((l, s), i)) =>
      val rest = scores.drop(i + 1).map(_._2)
      val cond = s >= (if (rest.size == 1) rest.head else greatest(rest: _*))
      if (acc == null) when(cond, l) else acc.when(cond, l)
    }.otherwise(scores.last._1)
  }

  /** Stable content fingerprint (md5 of lowercased text, 16 hex chars). */
  def fingerprint(text: Column): Column = substring(md5(lower(text).cast("binary")), 1, 16)

  /** URLs in raw text: scheme + non-space run. The pattern is deliberately
    * the RE2-safe subset (no lookaround, no \w-class subtleties) so the
    * DuckDB oracle matches byte-for-byte; trailing punctuation stays
    * attached — link EXTRACTION for density/domain stats, not a validator. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^ \\t\\n\\r]+"), lit(0))

  /** Registrable host of a URL: lowercased authority with a leading `www.`
    * stripped — the domain-level curation key (per-domain caps, blocklist
    * joins, domain mix stats all group on this). */
  def urlDomain(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^https?://([^/?#]+)", 1)), "^www\\.", "")

  /** Per-document link stats for quality filtering: (urls, n_urls,
    * distinct sorted domains) in one projection — a high URL-per-token
    * ratio is the classic navigation/spam signal. */
  def linkStats(text: Column): Column = {
    val urls = extractUrls(text)
    struct(
      size(urls).cast("long").as("n_urls"),
      array_sort(array_distinct(transform(urls, u => urlDomain(u)))).as("domains"))
  }

  /** Unicode NFC normalization (native expression; JDK-builtin, fast-path
    * for already-normal text). Run BEFORE any digest/shingle dedup:
    * composed and decomposed spellings of the same text must collide. */
  def nfcNormalize(text: Column): Column = graft.functions.TextExprs.nfcNormalize(text)

  /** Canonical text for dedup keys: NFC + whitespace runs squeezed to one
    * space + trimmed. Deliberately NOT lowercased — Unicode case mapping
    * is the one step whose tables drift across engines/locales; callers
    * who want it compose `lower` on top. The whitespace class is EXPLICIT
    * (space, tab, LF, VT, FF, CR): Java's \s includes vertical tab, RE2's
    * (the DuckDB oracle dialect) does not — a bare \s would silently
    * diverge cross-engine on documents containing U+000B. */
  def canonicalizeText(text: Column): Column =
    trim(regexp_replace(nfcNormalize(text), "[ \\t\\n\\u000B\\f\\r]+", " "))

  /** PII redaction: emails → [EMAIL], long digit runs (phone-ish) → [NUM].
    * Character-class-only regexes so Java (Spark) and RE2 (DuckDB oracle)
    * agree. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "[0-9(][0-9 ()+.-]{7,}[0-9]", "[NUM]")

  /** Stable md5 bucket from the first `hexChars` hex chars of md5(key) —
    * one canonicalization chain for every bucket width, so the 256- and
    * 65536-grids can never silently diverge. */
  private def hashBucketN(key: Column, hexChars: Int): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, hexChars), 16, 10).cast("long")

  /** Deterministic hash split: assigns a stable bucket in [0, 256) from the
    * first two hex chars of md5(key) — reproducible across engines, runs,
    * and partitionings (md5 hex is identical in Spark and DuckDB).
    * `train/test` split = threshold on the bucket. */
  def hashBucket(key: Column): Column = hashBucketN(key, 2)

  def hashSplit(key: Column, trainBuckets: Int = 205): Column =
    when(hashBucket(key) < trainBuckets, "train").otherwise("test")

  /** [[hashBucket]] at 2^16 resolution (first FOUR md5 hex chars) — for
    * ratios too fine for a 256 grid (temperature-mixing quotas). */
  def hashBucket16(key: Column): Column = hashBucketN(key, 4)

  /** Rolling polynomial hash (Rabin-Karp style) over character codes:
    * h = (h * 31 + code) mod 1e9+7 — the building block for shingle
    * fingerprinting; exact long arithmetic. */
  def rollingHash(text: Column): Column =
    aggregate(transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Word n-grams (non-distinct, order-preserving; < k tokens → empty).
    * Native expression — the HOF sliding-concat is interpreted. */
  def ngrams(text: Column, k: Int): Column =
    graft.functions.TextExprs.wordNgrams(text, k)

  /** Gopher-style repetition signal: the fraction of word k-grams that are
    * duplicates within the document (1 − distinct/total, 4 dp; 0 when the
    * doc has no k-gram). High values flag boilerplate-stuffed or
    * degenerate generated text. Integer-ratio arithmetic → bit-exact
    * cross-engine. */
  def repetitionRatio(text: Column, k: Int = 3): Column = {
    val g = ngrams(text, k)
    when(size(g) <= 0, lit(0.0))
      .otherwise(round(lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 4))
  }
}
