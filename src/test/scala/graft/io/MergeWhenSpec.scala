package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generalized MERGE clause algebra ([[Snapshots.mergeIntoWhen]]):
  * conditioned delete/update/insert, clause precedence, partial-row SET,
  * pass-through, file discipline, and deletion-vector folding. */
class MergeWhenSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mw").toString + "/tbl"

  private def mkTbl(): String = {
    val t = tmpTable()
    // 4 files of 10 rows each, zone-mapped on id
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"g${x % 3}", x * 10L))
          .toDF("id", "g", "m").coalesce(1),
        t, recordSchema = i == 0, statsCols = Seq("id"), recordRowCounts = true)
    }
    t
  }

  test("CDC triple: conditioned DELETE, catch-all UPDATE, conditioned INSERT") {
    val t = mkTbl()
    val src = Seq(
      (3L, "D", 0L),    // matched  -> delete
      (5L, "U", 999L),  // matched  -> update
      (100L, "U", 7L),  // unmatched -> insert
      (200L, "D", 8L)   // unmatched, op=D -> dropped (insert clause refuses)
    ).toDF("id", "op", "delta")
    val r = Snapshots.mergeIntoWhen(spark, t, src, Seq("id"),
      matched = Seq(
        Snapshots.MatchedDelete(Some(col("s.op") === "D")),
        Snapshots.MatchedUpdate(None, Map("m" -> col("s.delta")))),
      notMatched = Seq(
        Snapshots.NotMatchedInsert(Some(col("s.op") =!= "D"),
          Map("id" -> col("s.id"), "m" -> col("s.delta")))),
      pruneOn = Some("id"))
    val rows = Snapshots.readAt(spark, t).as[(Long, String, Long)].collect()
      .map(r0 => r0._1 -> ((r0._2, r0._3))).toMap
    assert(!rows.contains(3L))            // deleted
    assert(rows(5L) === (("g2", 999L)))   // partial update: g kept
    assert(rows(100L) === ((null, 7L)))   // inserted; unlisted col g -> NULL
    assert(!rows.contains(200L))          // unclaimed source row dropped
    assert(rows.size === 40 - 1 + 1)
    assert(rows(7L) === (("g1", 70L)))    // untouched row passes through
    // prune discipline: the source keys 3,5 live in file 1; 100/200 match
    // nothing — exactly one data file rewritten
    assert(r.rewritten.size === 1, s"rewritten=${r.rewritten}")
  }

  test("clause precedence: first applicable wins, later clauses never fire") {
    val t = mkTbl()
    val src = Seq((1L, 5L), (2L, 50L)).toDF("id", "x")
    Snapshots.mergeIntoWhen(spark, t, src, Seq("id"),
      matched = Seq(
        Snapshots.MatchedUpdate(Some(col("s.x") < 10), Map("m" -> lit(-1L))),
        Snapshots.MatchedUpdate(None, Map("m" -> lit(-2L)))),
      notMatched = Nil, pruneOn = Some("id"))
    val m = Snapshots.readAt(spark, t).as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(m(1L) === -1L) // first clause claimed it
    assert(m(2L) === -2L) // fell through to the catch-all
  }

  test("update expressions see both sides: SET m = t.m + s.delta") {
    val t = mkTbl()
    val src = Seq((4L, 5L), (14L, 6L)).toDF("id", "delta")
    Snapshots.mergeIntoWhen(spark, t, src, Seq("id"),
      matched = Seq(Snapshots.MatchedUpdate(None,
        Map("m" -> (col("t.m") + col("s.delta"))))),
      notMatched = Nil, pruneOn = Some("id"))
    val m = Snapshots.readAt(spark, t).as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(m(4L) === 45L && m(14L) === 146L)
  }

  test("untouched files stay byte-identical; time travel sees pre-merge rows") {
    val t = mkTbl()
    val before = Snapshots.liveFiles(spark, t).toSet
    Snapshots.mergeIntoWhen(spark, t,
      Seq((2L, 0L)).toDF("id", "nm"), Seq("id"),
      matched = Seq(Snapshots.MatchedUpdate(None, Map("m" -> col("s.nm")))),
      notMatched = Nil, pruneOn = Some("id"))
    val after = Snapshots.liveFiles(spark, t).toSet
    assert((before -- after).size === 1) // only the file holding id=2 left
    assert((before intersect after).size === 3)
    assert(Snapshots.readAt(spark, t, Some(4)).filter(col("id") === 2L)
      .select("m").as[Long].head() === 20L)
  }

  test("insert-only clause merge never rewrites files") {
    val t = mkTbl()
    val r = Snapshots.mergeIntoWhen(spark, t,
      Seq((77L, 1L), (5L, 2L)).toDF("id", "w"), Seq("id"),
      matched = Nil,
      notMatched = Seq(Snapshots.NotMatchedInsert(None,
        Map("id" -> col("s.id"), "g" -> lit("new"), "m" -> col("s.w")))),
      pruneOn = Some("id"))
    assert(r.rewritten.isEmpty)
    val rows = Snapshots.readAt(spark, t)
    assert(rows.count() === 41)
    // the matched key 5 was NOT re-inserted and NOT modified
    assert(rows.filter(col("id") === 5L).select("m").as[Long].head() === 50L)
    assert(rows.filter(col("id") === 77L).select("g").as[String].head() === "new")
  }

  test("tombstoned key counts as NOT matched; re-insert folds the dv, no ghost") {
    val t = mkTbl()
    Snapshots.deleteWhereMor(spark, t, col("id") === 6L, Seq("id"))
    assert(Snapshots.readAt(spark, t).filter(col("id") === 6L).count() === 0)
    Snapshots.mergeIntoWhen(spark, t,
      Seq((6L, 600L)).toDF("id", "nm"), Seq("id"),
      matched = Seq(Snapshots.MatchedUpdate(None, Map("m" -> col("s.nm")))),
      notMatched = Seq(Snapshots.NotMatchedInsert(None,
        Map("id" -> col("s.id"), "g" -> lit("re"), "m" -> col("s.nm")))),
      pruneOn = Some("id"))
    val got = Snapshots.readAt(spark, t).filter(col("id") === 6L)
      .as[(Long, String, Long)].collect()
    assert(got.toSeq === Seq((6L, "re", 600L))) // exactly one row, the insert
    assert(Snapshots.readAt(spark, t).count() === 40L)
  }

  test("cardinality violation and key assignment refuse loudly") {
    val t = mkTbl()
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("id", "x")
    intercept[IllegalArgumentException] {
      Snapshots.mergeIntoWhen(spark, t, dup, Seq("id"),
        matched = Seq(Snapshots.MatchedUpdate(None, Map("m" -> col("s.x")))),
        notMatched = Nil)
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeIntoWhen(spark, t, Seq((1L, 2L)).toDF("id", "x"), Seq("id"),
        matched = Seq(Snapshots.MatchedUpdate(None, Map("id" -> col("s.x")))),
        notMatched = Nil)
    }
  }

  test("empty table: insert clauses apply, conditions filter") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq.empty[(Long, String, Long)].toDF("id", "g", "m"),
      t, recordSchema = true)
    Snapshots.mergeIntoWhen(spark, t,
      Seq((1L, "k"), (2L, "drop")).toDF("id", "tag"), Seq("id"),
      matched = Nil,
      notMatched = Seq(Snapshots.NotMatchedInsert(Some(col("s.tag") =!= "drop"),
        Map("id" -> col("s.id"), "g" -> col("s.tag")))))
    val rows = Snapshots.readAt(spark, t).select("id", "g")
      .as[(Long, String)].collect()
    assert(rows.toSeq === Seq((1L, "k"))) // unlisted m is NULL
  }
}
