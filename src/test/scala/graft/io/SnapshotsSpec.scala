package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString + "/tbl"

  private def df(ids: Range) = ids.map(_.toLong).toDF("id")

  test("commitAppend + readAt: versions accumulate and time travel is stable") {
    val t = tmpTable()
    assert(Snapshots.currentVersion(spark, t) === 0L)
    val v1 = Snapshots.commitAppend(df(1 to 10), t)
    val v2 = Snapshots.commitAppend(df(11 to 15), t)
    assert((v1, v2) === ((1L, 2L)))
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t).count() === 15)
    // a later commit must not disturb an already-resolved old version
    Snapshots.commitAppend(df(16 to 16), t)
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t, Some(2)).count() === 15)
    assert(Snapshots.readAt(spark, t).count() === 16)
  }

  test("remove commits drop files; diff reports file-level changes") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t)
    Snapshots.commitAppend(df(11 to 15), t)
    val v1Files = Snapshots.liveFiles(spark, t, Some(1))
    val v3 = Snapshots.commit(spark, t, adds = Nil, removes = v1Files)
    assert(v3 === 3L)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (11L to 15L).toSet)
    val d = Snapshots.diff(spark, t, 1, 3).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d.count(_._2 == "removed") === v1Files.size)
    assert(d.map(_._1).toSet.intersect(v1Files.toSet) === v1Files.toSet)
    // reverse direction: v1's files come back as added, v2's leave
    val d2 = Snapshots.diff(spark, t, 3, 1).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d2.filter(_._2 == "added").map(_._1).toSet === v1Files.toSet)
    assert(d2.count(_._2 == "removed") === Snapshots.liveFiles(spark, t, Some(3)).size)
  }

  test("losing a version race throws ConcurrentCommitException") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 3), t)
    // both writers resolved their reads at v1; the second PUT must lose
    val base = Snapshots.currentVersion(spark, t)
    Snapshots.commit(spark, t, adds = Seq("x"), baseVersion = Some(base))
    intercept[Snapshots.ConcurrentCommitException] {
      Snapshots.commit(spark, t, adds = Seq("y"), baseVersion = Some(base))
    }
    // the loser re-resolves and retries cleanly
    assert(Snapshots.commit(spark, t, adds = Seq("y")) === base + 2)
  }

  test("checkpoint shortens replay without changing any resolution") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t)
    Snapshots.commitAppend(df(6 to 9), t)
    val before = Snapshots.liveFiles(spark, t, Some(2))
    assert(Snapshots.checkpoint(spark, t) === 2L)
    assert(Snapshots.liveFiles(spark, t, Some(2)) === before)
    Snapshots.commitAppend(df(10 to 12), t)
    assert(Snapshots.readAt(spark, t).count() === 12)
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 5) // pre-checkpoint history intact
  }

  test("vacuum reclaims only unreferenced data (crashed-writer garbage)") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t)
    // a writer that crashed after writing data but before committing
    df(100 to 200).write.parquet(s"$t/data/orphan")
    val deleted = Snapshots.vacuum(spark, t)
    assert(deleted.nonEmpty && deleted.forall(_.contains("/data/orphan/")))
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 5L).toSet)
    assert(Snapshots.vacuum(spark, t).isEmpty) // idempotent
  }

  test("empty version needs a schema; unknown versions are rejected") {
    val t = tmpTable()
    val sc = StructType(Seq(StructField("id", LongType)))
    assert(Snapshots.readAt(spark, t, None, Some(sc)).count() === 0)
    intercept[IllegalArgumentException] {
      Snapshots.readAt(spark, t, None, None)
    }
    Snapshots.commitAppend(df(1 to 3), t)
    intercept[IllegalArgumentException] {
      Snapshots.liveFiles(spark, t, Some(7))
    }
  }

  test("compact swaps the live set in one transaction; history and content survive") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t)
    Snapshots.commitAppend(df(11 to 15), t)
    assert(Snapshots.liveFiles(spark, t).size > 1)
    val v3 = Snapshots.compact(spark, t, targetFiles = 1)
    assert(v3 === 3L)
    assert(Snapshots.liveFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 15L).toSet)
    // time travel to pre-compaction versions still resolves the old files
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t, Some(2)).count() === 15)
    // removed-but-referenced files are NOT vacuum-eligible
    assert(Snapshots.vacuum(spark, t).isEmpty)
    // compacting an already-compact table is a no-op version-wise
    assert(Snapshots.compact(spark, t, targetFiles = 1) === 3L)
  }

  test("paths with quotes/backslashes survive the manifest round trip") {
    val t = tmpTable()
    val weird = Seq("""/da"ta/p\art-1.parquet""", "/tab\tle/part-2.parquet")
    Snapshots.commit(spark, t, adds = weird)
    assert(Snapshots.liveFiles(spark, t) === weird)
  }

  test("schema evolution: widened commits null-pad old files; time travel keeps the old shape") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), t,
      recordSchema = true)
    Snapshots.commitAppend(Seq((3L, 30L, "en"), (4L, 40L, "de"))
      .toDF("id", "n", "lang"), t, recordSchema = true)
    // current read: evolved 3-column shape, v1 files null-padded
    val cur = Snapshots.readAt(spark, t)
    assert(cur.columns.toSeq === Seq("id", "n", "lang"))
    val byId = cur.collect().map(r => r.getLong(0) ->
      Option(r.getAs[String]("lang"))).toMap
    assert(byId(1L).isEmpty && byId(3L).contains("en"))
    // time travel to v1: the pre-evolution 2-column shape
    val v1 = Snapshots.readAt(spark, t, Some(1))
    assert(v1.columns.toSeq === Seq("id", "n"))
    assert(v1.count() === 2)
    // recorded schemas resolve per version
    assert(Snapshots.tableSchema(spark, t, Some(1)).get.fieldNames.toSeq ===
      Seq("id", "n"))
    assert(Snapshots.tableSchema(spark, t).get.fieldNames.toSeq ===
      Seq("id", "n", "lang"))
  }

  test("schema evolution: explicit schema still wins; unstamped tables unchanged") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "n"), t) // no stamp
    assert(Snapshots.tableSchema(spark, t).isEmpty)
    // unstamped: file-inferred read, as before evolution support
    assert(Snapshots.readAt(spark, t).columns.toSeq === Seq("id", "n"))
    // explicit schema overrides any recorded one
    val narrow = StructType(Seq(StructField("id", LongType)))
    assert(Snapshots.readAt(spark, t, schema = Some(narrow)).columns.toSeq === Seq("id"))
  }

  test("schema evolution: empty pre-data version resolves via the recorded schema") {
    val t = tmpTable()
    // a schema-only commit (no files yet) — readAt(v1) yields a typed
    // empty frame without the caller passing a schema
    Snapshots.commit(spark, t, adds = Nil,
      schemaJson = Some(StructType(Seq(StructField("id", LongType))).json))
    val v1 = Snapshots.readAt(spark, t, Some(1))
    assert(v1.columns.toSeq === Seq("id") && v1.count() === 0)
  }
}
