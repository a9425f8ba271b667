package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named branches ([[Branches]]): fork, diverge, read through
  * `VERSION AS OF '<branch>'`, fast-forward merge, pins vs expiry. */
class BranchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_br").toString
    spark.conf.set("spark.sql.catalog.gb", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gb.root", r)
    r
  }

  private def mk(name: String): String = {
    val t = s"$root/$name"
    (0 until 3).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, x * 2L)).toDF("id", "m")
          .coalesce(1),
        t, recordSchema = i == 0, statsCols = Seq("id"))
    }
    t
  }

  test("branch → diverge → fast-forward merge; source untouched until publish") {
    val t = mk("b1")
    Branches.create(spark, t, "exp")
    assert(Branches.list(spark, t) === Seq("exp"))
    // diverge: delete on the branch, append on the branch
    val bp = Branches.path(t, "exp")
    Snapshots.deleteWhere(spark, bp, col("id") <= 10, prune = Some(("id", "1", "10")))
    Snapshots.commitAppend(Seq((500L, 1000L)).toDF("id", "m").coalesce(1), bp,
      statsCols = Seq("id"))
    // source serves production reads untouched
    assert(Snapshots.readAt(spark, t).count() === 30L)
    assert(Snapshots.readAt(spark, bp).count() === 21L)
    // merge: one atomic swap commit in the source
    val r = Branches.merge(spark, t, "exp")
    assert(Snapshots.readAt(spark, t).count() === 21L)
    assert(Snapshots.readAt(spark, t).filter(col("id") === 500L).count() === 1L)
    assert(r.removed >= 1)
    // the branch closed; pre-merge source versions still time-travel
    assert(Branches.list(spark, t).isEmpty)
    assert(Snapshots.readAt(spark, t, Some(3)).count() === 30L)
  }

  test("SQL surface: CALL branch / VERSION AS OF reads the head / DML on the branch / fast_forward") {
    val t = mk("b2")
    spark.sql("CALL gb.system.branch('b2', 'exp')")
    // write to the branch THROUGH SQL — the branch is an addressable table
    spark.sql("UPDATE gb.b2._branches.exp SET m = 0 WHERE id BETWEEN 1 AND 10")
    // VERSION AS OF '<branch>' reads the branch HEAD (live fork)
    assert(spark.sql("SELECT sum(m) AS s FROM gb.b2 VERSION AS OF 'exp'")
      .as[Long].head() === (11L to 30L).map(_ * 2).sum)
    // the source is untouched
    assert(spark.sql("SELECT sum(m) AS s FROM gb.b2").as[Long].head()
      === (1L to 30L).map(_ * 2).sum)
    val out = spark.sql("CALL gb.system.fast_forward('b2', 'exp')").collect().head
    assert(out.getLong(1) >= 1) // added
    assert(spark.sql("SELECT sum(m) AS s FROM gb.b2").as[Long].head()
      === (11L to 30L).map(_ * 2).sum)
  }

  test("expiry respects branch pins; drop releases them") {
    val t = mk("b3")
    Branches.create(spark, t, "hold") // pins base v3
    Snapshots.commitAppend(Seq((99L, 0L)).toDF("id", "m").coalesce(1), t)
    // expiry cannot cross the branch's base pin
    intercept[IllegalArgumentException] {
      Snapshots.expireVersions(spark, t, keepFrom = 4L)
    }
    Branches.drop(spark, t, "hold")
    assert(Branches.list(spark, t).isEmpty)
    // pin released: expiry proceeds
    Snapshots.expireVersions(spark, t, keepFrom = 4L)
    assert(Snapshots.readAt(spark, t).count() === 31L)
  }

  test("branch names: tag shadowing and bad names refuse; same-name re-branch after close works") {
    val t = mk("b4")
    Snapshots.tag(spark, t, "v1-final", Some(3L))
    intercept[IllegalArgumentException] {
      Branches.create(spark, t, "v1-final")
    }
    intercept[IllegalArgumentException] { Branches.path(t, "../escape") }
    Branches.create(spark, t, "exp")
    Branches.drop(spark, t, "exp")
    Branches.create(spark, t, "exp") // closed name is reusable
    assert(Branches.list(spark, t) === Seq("exp"))
  }
}
