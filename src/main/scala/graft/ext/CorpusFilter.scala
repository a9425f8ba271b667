package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** The canonical corpus-cleaning filter chain (FineWeb/Gopher-style):
  * language → quality score → repetition → length bounds → exact dedup,
  * composed from this repo's primitives with row-count ACCOUNTING riding
  * every stage as `observe()` metrics — the numbers a 100 TB curation run
  * must publish (what fraction each rule removed) for zero extra passes.
  *
  * One declarative plan: every predicate is a codegen'd column expression,
  * so Catalyst fuses the whole chain into the scan projection; the only
  * shuffle is the final dedup's digest exchange.
  */
object CorpusFilter {

  final case class Thresholds(
      lang: String = "en",
      minQuality: Double = 0.5,
      maxRepetition: Double = 0.2,
      minChars: Long = 100L,
      maxChars: Long = 20000L)

  final case class Filtered(df: DataFrame, stages: Seq[(String, Observation)]) {
    /** Stage accounting AFTER an action has run on `df`:
      * (stage, rows_surviving). */
    def counts: Seq[(String, Long)] =
      stages.map { case (n, o) => n -> o.get("rows").asInstanceOf[Long] }
  }

  /** Apply the chain to (id, text); returns the surviving frame plus the
    * per-stage observations (flushed by the caller's first action). */
  def apply(docs: DataFrame, id: Column, text: Column,
            t: Thresholds = Thresholds()): Filtered = {
    def stage(df: DataFrame, name: String): (DataFrame, (String, Observation)) = {
      val (out, obs) = graft.ops.Accounting.observe(df, s"corpus_$name",
        "rows" -> count(lit(1)))
      (out, name -> obs)
    }
    val base = docs.select(id.as("id"), text.as("text"))
    val (s0, o0) = stage(base, "0_input")
    val (s1, o1) = stage(s0.filter(TextAnalysis.predictedLang(col("text")) === t.lang), "1_lang")
    val (s2, o2) = stage(s1.filter(TextAnalysis.qualityScore(col("text")) >= t.minQuality), "2_quality")
    val (s3, o3) = stage(s2.filter(TextAnalysis.repetitionRatio(col("text")) <= t.maxRepetition), "3_repetition")
    val (s4, o4) = stage(s3.filter(length(col("text")).between(t.minChars, t.maxChars)), "4_length")
    // content dedup, min-id keep (ids are unique — row-distinct would be a no-op)
    val (s5, o5) = stage(TextDedup.dedupExact(s4, col("text"), col("id")), "5_dedup")
    Filtered(s5, Seq(o0, o1, o2, o3, o4, o5))
  }
}
