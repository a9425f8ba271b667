package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
  private lazy val idx = Bm25.index(docs, col("doc_id"), col("text"))

  test("index carries exact tf/df/dl per (term, doc)") {
    val rows = idx.select("term", "df", "id", "tf", "dl")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(rows === Set(
      ("a", 2L, 1L, 2L, 3L), ("a", 2L, 3L, 1L, 1L),
      ("b", 2L, 1L, 1L, 3L), ("b", 2L, 2L, 1L, 2L),
      ("c", 1L, 2L, 1L, 2L)))
  }

  test("corpus stats derive from the index alone") {
    val (n, s) = Bm25.corpusStats(idx).as[(Long, Long)].head()
    assert((n, s) === ((3L, 6L)))
  }

  test("search matches the closed form hand-computed in plain doubles") {
    def contrib(tf: Long, df: Long, dl: Long, n: Long, s: Long): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val sat = (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / s))
      math.round(idf * sat * 1e6)
    }
    val got = Bm25.search(idx, Seq((7L, "a c")).toDF("qid", "qtext"),
        col("qid"), col("qtext"), topK = 10)
      .select("id", "score_micro").as[(Long, Long)].collect().toMap
    val expect = Map(
      1L -> contrib(2, 2, 3, 3, 6),                          // 'a' twice in d1
      2L -> contrib(1, 1, 2, 3, 6),                          // 'c' in d2
      3L -> (contrib(1, 2, 1, 3, 6)))                        // 'a' in d3
    assert(got === expect)
  }

  test("docs sharing no query term never appear; unmatched terms add nothing") {
    val r = Bm25.search(idx, Seq((1L, "c zzz")).toDF("qid", "qtext"),
      col("qid"), col("qtext"))
    assert(r.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("rank is (score desc, id asc) and topK bounds the result") {
    val r = Bm25.search(idx, Seq((1L, "b")).toDF("qid", "qtext"),
        col("qid"), col("qtext"), topK = 1)
      .select("rk", "id").as[(Long, Long)].collect().toSeq
    // b appears once in d1 (dl=3) and once in d2 (dl=2): shorter doc wins
    assert(r === Seq((1L, 2L)))
  }

  test("repeated query terms count once (bag-of-words query dedup)") {
    val once = Bm25.search(idx, Seq((1L, "a")).toDF("qid", "qtext"),
      col("qid"), col("qtext")).select("id", "score_micro")
      .as[(Long, Long)].collect().toSet
    val twice = Bm25.search(idx, Seq((1L, "a a a")).toDF("qid", "qtext"),
      col("qid"), col("qtext")).select("id", "score_micro")
      .as[(Long, Long)].collect().toSet
    assert(once === twice)
  }

  test("persisted-index serve returns exactly the in-memory search results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString + "/idx"
    Bm25.writeIndex(idx, dir)
    val qs = Seq((1L, "a c"), (2L, "b"), (3L, "zzz")).toDF("qid", "qtext")
    val mem = Bm25.search(idx, qs, col("qid"), col("qtext"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val per = Bm25.searchPersisted(spark, dir, qs, col("qid"), col("qtext"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(per === mem)
    assert(mem.nonEmpty)
  }

  test("appendable index built in two batches serves identical scores to one build") {
    val b1 = docs.filter(col("doc_id") <= 2)
    val b2 = docs.filter(col("doc_id") > 2)
    val postings = Bm25.indexAppendable(b1, col("doc_id"), col("text"))
      .unionByName(Bm25.indexAppendable(b2, col("doc_id"), col("text")))
    val stats = Bm25.batchStats(Bm25.indexAppendable(b1, col("doc_id"), col("text")))
      .unionByName(Bm25.batchStats(Bm25.indexAppendable(b2, col("doc_id"), col("text"))))
    val qs = Seq((1L, "a c"), (2L, "b")).toDF("qid", "qtext")
    val inc = Bm25.searchAppendable(postings, stats, qs, col("qid"), col("qtext"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val whole = Bm25.search(idx, qs, col("qid"), col("qtext"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc === whole && inc.nonEmpty)
  }

  test("serve plan broadcasts the query terms (no corpus-side shuffle join)") {
    val plan = Bm25.search(idx, Seq((1L, "a c")).toDF("qid", "qtext"),
      col("qid"), col("qtext")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join in:\n$plan")
  }

  test("phraseSearch: adjacency, occurrence counts, overlaps, whitespace runs") {
    val docs = Seq(
      (1L, "the cat sat on the cat sat"),   // "cat sat" twice
      (2L, "cat  \t sat"),                  // whitespace run still adjacent
      (3L, "cat on sat"),                   // both terms, not adjacent
      (4L, "sat cat"),                      // reversed — no match
      (5L, "cat cat cat")                   // self-overlap probe for "cat cat"
    ).toDF("doc_id", "text")
    val out = Bm25.phraseSearch(docs, col("doc_id"), col("text"), Seq("cat", "sat"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
    // overlapping occurrences each count (positions 0 and 1)
    val ov = Bm25.phraseSearch(docs, col("doc_id"), col("text"), Seq("cat", "cat"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ov === Map(5L -> 2L))
    // trigram phrase anchors through the middle term
    val tri = Bm25.phraseSearch(docs, col("doc_id"), col("text"),
        Seq("cat", "sat", "on"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri === Map(1L -> 1L))
    // single-term phrase degenerates to term counts
    val one = Bm25.phraseSearch(docs, col("doc_id"), col("text"), Seq("cat"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 3L))
  }
}
