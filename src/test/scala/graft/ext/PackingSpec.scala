package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing semantics. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packWindows lays docs head-to-tail and splits across window cuts") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 10L), (4L, 1L))
      .toDF("doc_id", "nt")
    val out = Packing.packWindows(docs, "doc_id", $"nt", ctxLen = 8)
      .orderBy("doc_id")
      .select("doc_id", "start_offset_global", "start_window", "start_offset", "windows_spanned")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // stream: [0,3) [3,7) [7,17) [17,18); windows of 8: doc3 starts at 7
    // (window 0, offset 7) and runs through token 16 (window 2) → spans 3
    assert(out === Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 3L, 0L, 3L, 1L),
      (3L, 7L, 0L, 7L, 3L),
      (4L, 17L, 2L, 1L, 1L)))
  }

  test("chunkTokens slides with overlap, stops at the last end-reaching start, keeps casing") {
    val docs = Seq((1L, "A b c d e f g")).toDF("doc_id", "text") // 7 tokens
    val out = Packing.chunkTokens(docs, "doc_id", $"text", chunkSize = 4, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    // start 6 ("g") would be wholly contained in chunk 2 — never emitted
    assert(out === Seq(
      (0L, 4L, "A b c d"),
      (1L, 4L, "c d e f"),
      (2L, 3L, "e f g")))
  }

  test("chunkTokens on a short doc emits exactly one full-copy chunk; null text emits none") {
    val docs = Seq((1L, Some("only three words")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, "doc_id", $"text", chunkSize = 32, stride = 16)
      .select("doc_id", "chunk_idx", "chunk_text").as[(Long, Long, String)].collect().toSeq
    assert(out === Seq((1L, 0L, "only three words")))
  }

  test("chunkTokens exact-multiple length emits no redundant tail start") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // 6 tokens
    val out = Packing.chunkTokens(docs, "doc_id", $"text", chunkSize = 4, stride = 2)
      .select("chunk_text").as[String].collect().toSeq
    assert(out === Seq("a b c d", "c d e f")) // start 4 ("e f") is contained
  }

  test("a zero-token doc occupies one window slot and shifts nothing") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 5L)).toDF("doc_id", "nt")
    val out = Packing.packWindows(docs, "doc_id", $"nt", ctxLen = 4)
      .orderBy("doc_id")
      .select("doc_id", "start_offset_global", "windows_spanned")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L, 2L), (2L, 5L, 1L), (3L, 5L, 2L)))
  }
}
