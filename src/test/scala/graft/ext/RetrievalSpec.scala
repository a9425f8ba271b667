package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "id", "rk")

  test("doc surfaced by both rankers beats single-list rank-1 docs") {
    // RRF with K=60: 2nd+3rd in both lists (2 contributions) outweighs a
    // rank-1 appearance in only one list: 1e9/62+1e9/63 > 1e9/61
    val a = ranked((1L, 10L, 1L), (1L, 11L, 2L))
    val b = ranked((1L, 20L, 1L), (1L, 11L, 3L))
    val out = Retrieval.rrfFuse(Seq(a, b), "qid", "id", "rk", topK = 10)
      .orderBy("rk").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(11L, 10L, 20L))
    assert(out.head._5 == 2L) // n_lists for the winner
    // exact integer contributions: 1e9 div 62 + 1e9 div 63
    assert(out.head._4 == 1000000000L / 62 + 1000000000L / 63)
  }

  test("ties in fused score break by id ascending") {
    val a = ranked((1L, 30L, 1L), (1L, 7L, 1L))
    // both ids at rk=1 in one list each → identical fused score
    val out = Retrieval.rrfFuse(Seq(a.filter($"id" === 30L), a.filter($"id" === 7L)),
        "qid", "id", "rk", topK = 10)
      .orderBy("rk").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(7L, 30L))
    assert(out(0)._4 == out(1)._4)
  }

  test("topK truncates per query independently") {
    val a = ranked((1L to 2L).flatMap(q => (1L to 15L).map(i => (q, q * 100 + i, i))): _*)
    val out = Retrieval.rrfFuse(Seq(a), "qid", "id", "rk", topK = 5)
    val counts = out.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 5L, 2L -> 5L))
  }

  test("kConst shifts contributions exactly (integer division)") {
    val a = ranked((1L, 5L, 4L))
    val out = Retrieval.rrfFuse(Seq(a), "qid", "id", "rk", kConst = 10, topK = 1)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.head._4 == 1000000000L / 14)
  }
}
