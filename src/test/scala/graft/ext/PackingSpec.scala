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

  test("packGreedy: capacity reset, oversized doc alone, shard-local bins") {
    // one shard (ids all ≡ 1 mod 32): 3+4 fit in bin0 (cap 8), 2 would
    // make 9 → bin1; 20 oversized → bin2 alone; 5 → bin3
    val df = Seq((1L, 3L), (33L, 4L), (65L, 2L), (97L, 20L), (129L, 5L))
      .toDF("id", "n")
    val r = Packing.packGreedy(df, col("id"), col("n"), capacity = 8L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3)))).toMap
    assert(r.values.map(_._1).toSet === Set(1L)) // one shard
    assert(r(1L)._2 === 0L && r(33L)._2 === 0L)
    assert(r(65L)._2 === 1L)
    assert(r(97L)._2 === 2L)
    assert(r(129L)._2 === 3L)
  }

  test("packGreedy: shards pack independently; multi-doc bins never exceed capacity") {
    val df = (1L to 200L).map(i => (i, (i % 7) + 1)).toDF("id", "n")
    val out = Packing.packGreedy(df, col("id"), col("n"), capacity = 10L, shards = 8)
    val over = out.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("m"))
      .filter(col("fill") > 10 && col("m") > 1).count()
    assert(over === 0L)
    assert(out.count() === 200L) // every doc present exactly once
    assert(out.select("shard").distinct().count() === 8L)
  }

  test("packGreedy: null ids drop, null token counts pack as zero") {
    val df = Seq((Option(1L), Option(3L)), (Option(33L), Option.empty[Long]),
      (Option.empty[Long], Option(5L))).toDF("id", "n")
    val r = Packing.packGreedy(df, col("id"), col("n"), capacity = 8L)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r === Map(1L -> 0L, 33L -> 0L)) // empty doc joins the open bin
  }
}
