package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write-audit-publish ([[Wap]]): zero-copy clones, the retention pin,
  * and the atomic rehoming publish. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_wap").toString

  private def mkSrc(base: String): String = {
    val t = s"$base/src"
    (0 until 3).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"s${x % 3}", x * 2L))
          .toDF("id", "src", "m").coalesce(1),
        t, recordSchema = i == 0, statsCols = Seq("id"), recordRowCounts = true)
    }
    t
  }

  test("clone is zero-copy, reads equal, stats carried, pin held") {
    val base = freshBase()
    val t = mkSrc(base)
    val c = s"$base/stage"
    assert(Wap.clone(spark, t, c) === 1L)
    // no data directory materialized under the clone — pure metadata
    assert(!new java.io.File(s"$c/data").exists())
    assert(Snapshots.readAt(spark, c).orderBy("id").collect().toSeq ===
      Snapshots.readAt(spark, t).orderBy("id").collect().toSeq)
    // carried zone maps: a pruned read on the clone skips files immediately
    val (scan, skip) = Snapshots.pruneFiles(spark, c, "id", "1", "5")
    assert(scan.size === 1 && skip.size === 2)
    // carried row counts: metadata COUNT(*) works on the clone
    assert(Snapshots.fastCount(spark, c) === 30L)
    // the lifecycle pin blocks source expiry PAST the base (v3): a later
    // commit makes keepFrom=4 legal, but the pin at v3 refuses it
    Snapshots.commitAppend(Seq((99L, "s0", 0L)).toDF("id", "src", "m")
      .coalesce(1), t)
    intercept[Exception] { Snapshots.expireVersions(spark, t, keepFrom = 4L) }
    Wap.abandon(spark, c)
    Snapshots.expireVersions(spark, t, keepFrom = 4L) // pin retracted
  }

  test("publish: one atomic swap, rehomed files, time travel intact") {
    val base = freshBase()
    val t = mkSrc(base)
    val c = s"$base/stage2"
    Wap.clone(spark, t, c)
    val vSrcBefore = Snapshots.currentVersion(spark, t)
    // audit-stage mutations on the clone: delete + append
    Snapshots.deleteWhere(spark, c, col("id") <= 5, prune = Some(("id", "1", "5")))
    Snapshots.commitAppend(
      Seq((100L, "s1", 200L), (101L, "s2", 202L)).toDF("id", "src", "m")
        .coalesce(1), c, statsCols = Seq("id"))
    // source untouched while staging
    assert(Snapshots.currentVersion(spark, t) === vSrcBefore)
    assert(Snapshots.readAt(spark, t).count() === 30L)
    val r = Wap.publish(spark, c)
    assert(r.version === vSrcBefore + 1)
    assert(r.rehomed === r.added)
    // source now equals the clone's content
    assert(Snapshots.readAt(spark, t).orderBy("id").collect().toSeq ===
      Snapshots.readAt(spark, c).orderBy("id").collect().toSeq)
    assert(Snapshots.readAt(spark, t).count() === 27L)
    // every published file lives under the SOURCE's data dir
    val live = Snapshots.liveFiles(spark, t)
    assert(live.forall(p => !p.contains("/stage2/")),
      s"published live set must not reference the staging dir: $live")
    // pre-publish source versions keep time traveling
    assert(Snapshots.readAt(spark, t, Some(vSrcBefore)).count() === 30L)
    // zone maps traveled with the rehome: pruning works on the new files
    val (scan, _) = Snapshots.pruneFiles(spark, t, "id", "100", "101")
    assert(scan.size === 1)
    // the pin is gone: expiry can advance
    Snapshots.expireVersions(spark, t, keepFrom = r.version)
  }

  test("two racing clones: a swap publish wins, the loser refuses; pure-add staging stacks") {
    val base = freshBase()
    val t = mkSrc(base)
    val a = s"$base/stageA"; val b = s"$base/stageB"
    Wap.clone(spark, t, a)
    Wap.clone(spark, t, b)
    // A stages a REWRITE (delete); B stages a pure append
    Snapshots.deleteWhere(spark, a, col("id") <= 10, prune = Some(("id", "1", "10")))
    Snapshots.commitAppend(Seq((500L, "s2", 1000L)).toDF("id", "src", "m")
      .coalesce(1), b, statsCols = Seq("id"))
    Wap.publish(spark, a) // wins: 20 rows live
    assert(Snapshots.readAt(spark, t).count() === 20L)
    // B's base is stale and A's publish removed files — but B touched
    // DISJOINT files (a pure append), so the three-way merge lands it
    // cleanly: both changes survive, no re-clone needed
    Wap.publish(spark, b)
    assert(Snapshots.readAt(spark, t).count() === 21L)
    assert(Snapshots.readAt(spark, t).filter(col("id") === 500L).count() === 1L)
    assert(Snapshots.readAt(spark, t).filter(col("id") <= 10).count() === 0L)
    // a REAL conflict — two clones rewriting the SAME base file — refuses
    val c1 = s"$base/stageC1"; val c2 = s"$base/stageC2"
    Wap.clone(spark, t, c1)
    Wap.clone(spark, t, c2)
    Snapshots.deleteWhere(spark, c1, col("id") === 11L, prune = Some(("id", "11", "11")))
    Snapshots.deleteWhere(spark, c2, col("id") === 12L, prune = Some(("id", "12", "12")))
    Wap.publish(spark, c1)
    val e = intercept[IllegalStateException] { Wap.publish(spark, c2) }
    assert(e.getMessage.contains("re-clone") &&
      e.getMessage.contains("rewrote base data files"), e.getMessage)
  }

  test("publish retries through a racing appender: staged change + every append survive") {
    val base = freshBase()
    val t = mkSrc(base)
    val c = s"$base/stageR"
    Wap.clone(spark, t, c)
    Snapshots.deleteWhere(spark, c, col("id") <= 10, prune = Some(("id", "1", "10")))
    // an ingest thread keeps appending while the publish races it
    val appender = new Thread(() => {
      (0 until 5).foreach { i =>
        Snapshots.commitAppend(
          Seq((1000L + i, "s0", 0L)).toDF("id", "src", "m").coalesce(1), t)
        Thread.sleep(15)
      }
    })
    appender.start()
    Thread.sleep(20)
    val r = Wap.publish(spark, c)
    appender.join()
    val ids = Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet
    // the staged delete held...
    assert(!(1L to 10L).exists(ids))
    // ...and NO append was lost: each either fast-forwarded through the
    // publish or committed after it
    assert((0 until 5).forall(i => ids(1000L + i)),
      s"lost appends: ${(0 until 5).map(1000L + _).filterNot(ids)}")
    assert(r.removed >= 1)
  }

  test("append-only source advance fast-forwards; conflicting advance refuses") {
    val base = freshBase()
    val t = mkSrc(base)
    val c = s"$base/stage3"
    Wap.clone(spark, t, c)
    // the ingest-keeps-appending case: source gains rows while staging
    Snapshots.commitAppend(Seq((999L, "s0", 1998L)).toDF("id", "src", "m")
      .coalesce(1), t)
    Snapshots.deleteWhere(spark, c, col("id") <= 10, prune = Some(("id", "1", "10")))
    val r = Wap.publish(spark, c)
    // published = staged content (20 rows) + the fast-forwarded append
    assert(Snapshots.readAt(spark, t).count() === 21L)
    assert(Snapshots.readAt(spark, t).filter(col("id") === 999L).count() === 1L)
    assert(Snapshots.readAt(spark, t).filter(col("id") <= 10).count() === 0L)
    assert(r.removed === 1) // the quarter file the staged delete dropped
    // a one-sided deletion-vector advance merges (the clone staged no dv
    // change of its own); the dv survives the publish
    val tc = s"$base/src3"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"v$x")).toDF("id", "s")
          .coalesce(1), tc, recordSchema = i == 0)
    }
    val c3 = s"$base/stage5"
    Wap.clone(spark, tc, c3)
    Snapshots.commitAppend(Seq((777L, "v777")).toDF("id", "s").coalesce(1), c3)
    Snapshots.deleteWhereMor(spark, tc, col("id") === 1L, Seq("id"))
    Wap.publish(spark, c3)
    assert(Snapshots.readAt(spark, tc).filter(col("id") === 1L).count() === 0L)
    assert(Snapshots.readAt(spark, tc).filter(col("id") === 777L).count() === 1L)
    // BOTH sides adding deletion vectors is a real conflict: refuses
    val td = s"$base/src5"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"v$x")).toDF("id", "s")
          .coalesce(1), td, recordSchema = i == 0)
    }
    val c5 = s"$base/stage6"
    Wap.clone(spark, td, c5)
    Snapshots.deleteWhereMor(spark, td, col("id") === 1L, Seq("id"))
    Snapshots.deleteWhereMor(spark, c5, col("id") === 2L, Seq("id"))
    val e = intercept[IllegalStateException] { Wap.publish(spark, c5) }
    assert(e.getMessage.contains("re-clone") &&
      e.getMessage.contains("deletion vectors"), e.getMessage)
    // a clustered source's clone inherits write.cluster.by (props carried)
    val t2 = s"$base/src2"
    Snapshots.commitAppend(
      (1 to 10).map(x => (x.toLong, s"s$x")).toDF("id", "src").coalesce(1),
      t2, recordSchema = true)
    Snapshots.commit(spark, t2, adds = Nil,
      props = Seq(graft.io.Clustering.Prop -> Some("src")))
    val c2 = s"$base/stage4"
    Wap.clone(spark, t2, c2)
    assert(Snapshots.tableProperties(spark, c2)(Clustering.Prop) === "src")
    assert(Snapshots.tableProperties(spark, c2)("wap.source") === t2)
  }

  test("a dv advance on one side conflicts with a base rewrite on the other") {
    val base = freshBase()
    // source MoR-deletes key k while the clone CoW-rewrites the file
    // holding k: merging would keep the source tombstone live over the
    // clone's rewritten row — a silently lost update, so publish refuses
    val t = s"$base/srcx"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, x * 2L)).toDF("id", "m")
          .coalesce(1), t, recordSchema = i == 0)
    }
    val c = s"$base/stagex"
    Wap.clone(spark, t, c)
    Snapshots.updateWhere(spark, c, col("id") === 3L, Seq("m" -> lit(999L)))
    Snapshots.deleteWhereMor(spark, t, col("id") === 3L, Seq("id"))
    val e = intercept[IllegalStateException] { Wap.publish(spark, c) }
    assert(e.getMessage.contains("deletion vectors") &&
      e.getMessage.contains("rewrote base"), e.getMessage)
    // symmetric: a clone tombstone over a source CoW rewrite refuses too
    val t2 = s"$base/srcy"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, x * 2L)).toDF("id", "m")
          .coalesce(1), t2, recordSchema = i == 0)
    }
    val c2 = s"$base/stagey"
    Wap.clone(spark, t2, c2)
    Snapshots.deleteWhereMor(spark, c2, col("id") === 3L, Seq("id"))
    Snapshots.updateWhere(spark, t2, col("id") === 3L, Seq("m" -> lit(111L)))
    val e2 = intercept[IllegalStateException] { Wap.publish(spark, c2) }
    assert(e2.getMessage.contains("deletion vectors"), e2.getMessage)
  }

  test("same-leaf clones into different parents coexist; abandon retracts each pin") {
    val base = freshBase()
    val t = mkSrc(base)
    val a = s"$base/teamA/stage"; val b = s"$base/teamB/stage"
    // both clones pin the same source at the same base with the same leaf
    // name — the full-path uniquifier keeps the pins distinct
    Wap.clone(spark, t, a)
    Wap.clone(spark, t, b)
    val pins = Snapshots.tags(spark, t).keys.filter(_.startsWith("wap-"))
    assert(pins.size === 2, s"pins=$pins")
    // each clone records its own pin; abandoning one leaves the other held
    Wap.abandon(spark, a)
    assert(Snapshots.tags(spark, t).keys.count(_.startsWith("wap-")) === 1)
    Wap.abandon(spark, b)
    assert(Snapshots.tags(spark, t).keys.count(_.startsWith("wap-")) === 0)
  }
}
