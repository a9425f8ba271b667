package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed corpus filter chain: each stage drops exactly the planted
  * offenders, accounting flushes on one action. */
class CorpusFilterSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over a lazy dog and then " +
    "walks of to the garden where it is watching many other animals in the " +
    "afternoon sun with a patient gaze and is of course very happy about it " +
    "because this is a fine day to be a fox in the garden of plenty"

  test("each stage removes exactly its planted offenders; counts flush on one action") {
    val docs = Seq(
      (1L, good),                                       // survives everything
      (2L, "der hund und die katze das ist und der und die das ist " * 8), // german → 1_lang
      (3L, ("the !!! 123 " * 25).trim),                 // symbol soup, low alpha/diversity → 2_quality
      (4L, good + (" click here to win now" * 30)),     // repetitive tail → 3_repetition
      (5L, "the cat is of a and to in dog big"),        // 34 chars → 4_length
      (6L, good),                                       // exact dup of 1 → 5_dedup
      (7L, good + " with one extra distinct suffix sentence appended here")
    ).toDF("doc_id", "text")
    val filtered = CorpusFilter(docs, $"doc_id", $"text")
    val survivors = filtered.df.select("id").as[Long].collect().sorted
    assert(survivors === Array(1L, 7L))
    val counts = filtered.counts.toMap
    assert(counts("0_input") === 7L)
    assert(counts("1_lang") === 6L)       // -doc2
    assert(counts("2_quality") === 5L)    // -doc3
    assert(counts("3_repetition") === 4L) // -doc4
    assert(counts("4_length") === 3L)     // -doc5
    assert(counts("5_dedup") === 2L)      // -doc6 (dup of 1; min id kept)
  }

  test("dedup keeps the smallest id of each content group") {
    val docs = Seq((9L, good), (3L, good), (5L, good)).toDF("doc_id", "text")
    val filtered = CorpusFilter(docs, $"doc_id", $"text")
    assert(filtered.df.select("id").as[Long].collect().toSeq === Seq(3L))
  }
}
