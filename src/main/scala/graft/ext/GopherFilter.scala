package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/MassiveText-style rule-based document filter (Rae et al. 2021,
  * "Scaling Language Models: ...Gopher", App. A1.1) — the published
  * heuristic gauntlet a web crawl passes before pretraining, with per-rule
  * accounting: every document reports which rule rejected it FIRST (in the
  * published order), so a pipeline can audit what each rule costs instead
  * of watching an opaque keep-rate.
  *
  * Determinism: every threshold compares INTEGERS (3·n ≤ chars instead of
  * chars/n ≥ 3, 50·dup3 ≤ 9·total3 instead of ratio ≤ 0.18), so the
  * verdicts are bit-exact across engines with no float division anywhere.
  *
  * Scale shape: pure per-row expressions over the token array — zero
  * shuffles, codegen'd, linear in document length.
  */
object GopherFilter {

  /** The paper's "must contain 2 of" stopword set. */
  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule signals + verdict. Output:
    * (id, n_words, chars, alpha_words, stop_hits, sym_hits, dup3, total3,
    * keep, first_fail) — counts as exact longs, keep ∈ {0,1}, first_fail
    * the first violated rule's name or null when kept.
    *
    * Rules, in published order (thresholds are the paper's defaults;
    * `minWords` is parameterized because the published 50 assumes web pages
    * — pass the corpus-appropriate floor):
    *   word_count:   minWords ≤ n_words ≤ 100000
    *   word_length:  3 ≤ mean word length ≤ 10        (3n ≤ chars ≤ 10n)
    *   symbol_ratio: (# + …) per word ≤ 0.1           (10·sym ≤ n)
    *   alpha_words:  ≥80% of words contain a letter   (5·alpha ≥ 4n)
    *   stopwords:    ≥2 distinct of the 8-word set
    *   dup_3gram:    duplicate 3-gram fraction ≤ 0.18 (50·dup3 ≤ 9·total3)
    */
  def gopherRules(docs: DataFrame, id: Column, text: Column,
                  minWords: Int = 50): DataFrame = {
    val t = split(lower(text), " ") // x09/x24's token convention
    val g = TextAnalysis.ngrams(text, 3)
    val base = docs.select(
      id.as("id"),
      size(t).cast("long").as("n_words"),
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).as("chars"),
      size(filter(t, w => w.rlike("[a-z]"))).cast("long").as("alpha_words"),
      size(array_intersect(array_distinct(t),
        array(gopherStops.map(lit): _*))).cast("long").as("stop_hits"),
      ((length(text) - length(replace(text, lit("#"), lit("")))) +
        (length(text) - length(replace(text, lit("..."), lit("")))) / 3)
        .cast("long").as("sym_hits"),
      (size(g) - size(array_distinct(g))).cast("long").as("dup3"),
      size(g).cast("long").as("total3"))
    val rules: Seq[(String, Column)] = Seq(
      "word_count" -> (col("n_words") >= minWords && col("n_words") <= 100000L),
      "word_length" -> (col("chars") >= col("n_words") * 3 &&
        col("chars") <= col("n_words") * 10),
      "symbol_ratio" -> (col("sym_hits") * 10 <= col("n_words")),
      "alpha_words" -> (col("alpha_words") * 5 >= col("n_words") * 4),
      "stopwords" -> (col("stop_hits") >= 2L),
      "dup_3gram" -> (col("dup3") * 50 <= col("total3") * 9))
    val keep = rules.map(_._2).reduce(_ && _).cast("long")
    val firstFail = rules.foldRight(lit(null).cast("string")) {
      case ((name, ok), rest) => when(!ok, lit(name)).otherwise(rest)
    }
    base.withColumn("keep", keep).withColumn("first_fail", firstFail)
  }
}
