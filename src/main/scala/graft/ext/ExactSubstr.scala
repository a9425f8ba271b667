package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact-substring deduplication (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better", arXiv:2107.06499): remove every
  * token span that appears more than once ANYWHERE in the corpus — the
  * memorization-prone boilerplate (licenses, navigation chrome, templated
  * paragraphs) that document-level dedup can't see. Matching the paper, ALL
  * copies of a repeated span are dropped, including repeats within a single
  * document.
  *
  * The paper builds a single-node suffix array; the distributed
  * re-expression detects repeats at k-token granularity: a position is
  * covered iff the k-shingle starting there occurs ≥2 times, so every
  * repeated run of ≥ k tokens is removed in full and nothing shorter is
  * touched (the paper's minimum-match-length knob). Shingle identity
  * travels as md5 (fixed 128-bit keys — the same exactness convention as
  * the digest dedup in [[TextDedup]] — instead of shuffling k-token
  * strings).
  *
  * Scale shape: one shingle aggregation + one shingle equi-join (both
  * keyed on the digest, map-side combined; the dominant, corpus-linear
  * cost), then positions-only frames: covered positions are (id, pos)
  * pairs, the keep filter is a left-anti equi-join, and the rebuild is one
  * per-document reduce. No window functions, nothing quadratic, nothing
  * collected. Rebuilt text is single-space joined (token-stream identity,
  * not byte identity — same convention both engines).
  */
object ExactSubstr {

  /** Remove all occurrences of every k-token span that appears ≥2 times in
    * the corpus. Returns (id, clean_text, n_removed); fully-covered
    * documents come back with empty text, documents shorter than k are
    * never touched. */
  def removeRepeatedSpans(docs: DataFrame, id: Column, text: Column, k: Int = 8,
                          materialize: Boolean = true): DataFrame = {
    require(k >= 2, s"span length must be >= 2, got $k")
    // the token-array frame feeds three consumers (shingles, the token
    // stream, the final restore join) — persist for the one composed job
    val base = docs.select(id.as("id"),
        filter(split(text, "\\s+"), x => x =!= "").as("__t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val t = col("__t")
      val starts = when(size(t) >= k, sequence(lit(0), size(t) - k))
        .otherwise(array().cast("array<int>"))
      val sh = base.select(col("id"), explode(transform(starts, i =>
          struct(i.as("p"),
            md5(concat_ws("\u0001", slice(t, i + 1, lit(k))).cast("binary"))
              .as("key")))).as("__s"))
        .select(col("id"), col("__s.p").as("p"), col("__s.key").as("key"))
      val dups = sh.groupBy("key").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select("key")
      // covered positions collapse to ONE set per document — O(repeated
      // positions) rows. The previous shape posexploded the ENTIRE corpus
      // token stream, anti-joined it against the covered pairs and
      // re-aggregated every document's kept tokens: two extra exchanges
      // whose volume was the whole corpus, paid even when nothing
      // repeats. The rebuild is now a per-row array projection over the
      // token array the scan already carries: `array_except` over the
      // position range is hash-based (O(tokens + covered) per document,
      // no quadratic membership scan), and its result keeps the ascending
      // probe order (array_sort pins the contract). Worst-case task
      // memory is the covered-position set of one document — strictly
      // smaller than the old path's per-document collect_list of kept
      // (pos, token) structs.
      val cov = sh.join(dups, Seq("key"))
        .select(col("id"), explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
        .groupBy("id").agg(collect_set(col("pos")).as("__cov"))
      val keepPos = array_sort(
        array_except(sequence(lit(0), size(t) - 1), col("__cov")))
      val cleanToks =
        when(col("__cov").isNull, t)
          .otherwise(transform(keepPos, i => element_at(t, i + 1)))
      val out = base.join(cov, Seq("id"), "left")
        .select(col("id"),
          concat_ws(" ", cleanToks).as("clean_text"),
          (size(t) - size(cleanToks)).cast("long").as("n_removed"))
      if (materialize) out.localCheckpoint(true) else out
    } finally base.unpersist(blocking = false)
  }
}
