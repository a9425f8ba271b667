package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ViewMaintenance: the maintained aggregate equals a direct GROUP BY of
  * the current table state after every kind of change — inserts, value
  * updates, GROUP-MOVING updates, CoW deletes, MoR deletes — and the
  * note ledger makes replays exactly-once.
  */
class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_ivm").toString

  private def direct(t: String) =
    Snapshots.readAt(spark, t).groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("m").as("sum_m"))

  private def view(vt: String) =
    ViewMaintenance.readView(spark, vt).select("grp", "n_rows", "sum_m")

  private def assertParity(t: String, vt: String): Unit = {
    val d = direct(t).as[(String, Long, Long)].collect().toSet
    val v = view(vt).as[(String, Long, Long)].collect().toSet
    assert(v === d)
  }

  test("maintained view tracks inserts, updates, group moves, and deletes") {
    val root = tmp()
    val t = s"$root/tbl"; val vt = s"$root/view"; val feed = s"$root/feed"
    def sync() = ViewMaintenance.maintain(spark, t, Seq("id"),
      dims = Seq("grp"), measures = Seq("m"), feed, vt)

    Snapshots.commitAppend(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "grp", "m").coalesce(1), t, recordSchema = true)
    assert(sync() === Seq(1L))
    assertParity(t, vt)

    // value update (same group) + insert
    Snapshots.mergeInto(spark, t,
      Seq((2L, "a", 25L), (4L, "b", 40L)).toDF("id", "grp", "m"), keys = Seq("id"))
    // group-moving update: id 3 migrates b → a (debit b, credit a)
    Snapshots.mergeInto(spark, t,
      Seq((3L, "a", 30L)).toDF("id", "grp", "m"), keys = Seq("id"))
    assert(sync() === Seq(2L, 3L))
    assertParity(t, vt)
    assert(view(vt).filter($"grp" === "b").as[(String, Long, Long)].collect().toSeq
      === Seq(("b", 1L, 40L)))

    // CoW delete empties no group; MoR delete empties group b entirely
    Snapshots.deleteWhere(spark, t, col("id") === 1L)
    Snapshots.deleteWhereMor(spark, t, col("id") === 4L, keys = Seq("id"))
    assert(sync() === Seq(4L, 5L))
    assertParity(t, vt)
    // the zeroed group is stored as an identity row but filtered at read
    assert(view(vt).filter($"grp" === "b").isEmpty)
    assert(Snapshots.readAt(spark, vt).filter($"grp" === "b")
      .select("n_rows").as[Long].head() === 0L)

    // a group resurrects cleanly from its identity row
    Snapshots.mergeInto(spark, t, Seq((9L, "b", 90L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    assert(sync() === Seq(6L))
    assertParity(t, vt)

    // no new versions → no-op
    assert(sync() === Seq.empty)
  }

  test("min/max: inserts fold free, bound-removing deletes recompute only dirty groups") {
    val root = tmp()
    val t = s"$root/tbl"; val vt = s"$root/view"; val feed = s"$root/feed"
    def sync() = ViewMaintenance.maintain(spark, t, Seq("id"),
      dims = Seq("grp"), measures = Seq("m"), feed, vt, minMax = Seq("m"))
    def mm() = ViewMaintenance.readView(spark, vt)
      .select("grp", "n_rows", "min_m", "max_m")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def directMm() = Snapshots.readAt(spark, t).groupBy("grp")
      .agg(count(lit(1)), min("m"), max("m"))
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    Snapshots.commitAppend(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "grp", "m").coalesce(1), t, recordSchema = true)
    sync()
    assert(mm() === Map("a" -> ((2L, Some(10L), Some(20L))),
      "b" -> ((1L, Some(30L), Some(30L)))))
    // clean insert path: new group minimum via least, no table read
    Snapshots.mergeInto(spark, t, Seq((4L, "a", 5L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    sync()
    assert(mm()("a") === ((3L, Some(5L), Some(20L))))
    // deleting the CURRENT min forces the dirty-group recompute
    Snapshots.deleteWhereMor(spark, t, col("id") === 4L, keys = Seq("id"))
    sync()
    assert(mm()("a") === ((2L, Some(10L), Some(20L))))
    // an update lowering the current max is a delete-at-max + insert-below
    Snapshots.mergeInto(spark, t, Seq((2L, "a", 15L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    sync()
    assert(mm()("a") === ((2L, Some(10L), Some(15L))))
    // emptying a group resets to the identity (null bounds, hidden)...
    Snapshots.deleteWhereMor(spark, t, col("id") === 3L, keys = Seq("id"))
    sync()
    assert(!mm().contains("b"))
    // ...and a resurrection re-seeds the bounds from the insert alone
    Snapshots.mergeInto(spark, t, Seq((5L, "b", 7L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    sync()
    assert(mm() === directMm())
  }

  test("approx-distinct: inserts union free, any delete recomputes; estimate == direct") {
    import org.apache.spark.sql.functions.hll_sketch_estimate
    val root = tmp()
    val t = s"$root/tbl"; val vt = s"$root/view"; val feed = s"$root/feed"
    def sync() = ViewMaintenance.maintain(spark, t, Seq("id"),
      dims = Seq("grp"), measures = Seq("m"), feed, vt, distinct = Seq("m"))
    def est() = ViewMaintenance.readView(spark, vt)
      .select(col("grp"), hll_sketch_estimate(col("hll_m")).as("d"))
      .as[(String, Long)].collect().toMap
    def exact() = Snapshots.readAt(spark, t).groupBy("grp")
      .agg(countDistinct(col("m")).as("d")).as[(String, Long)].collect().toMap

    // duplicates collapse; per-group isolation
    Snapshots.commitAppend(Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 10L)).toDF("id", "grp", "m").coalesce(1), t, recordSchema = true)
    sync()
    assert(est() === Map("a" -> 2L, "b" -> 1L))
    // clean insert path (new value, no deletes)
    Snapshots.mergeInto(spark, t, Seq((5L, "a", 30L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    sync()
    assert(est()("a") === 3L)
    // deleting ONE copy of a duplicated value must keep the value counted
    // — exactly what naive sketch maintenance gets wrong without the
    // dirty-group recompute
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    sync()
    assert(est()("a") === 3L)
    // deleting the LAST copy drops it
    Snapshots.deleteWhereMor(spark, t, col("id") === 2L, keys = Seq("id"))
    sync()
    assert(est()("a") === 2L)
    assert(est() === exact())
  }

  test("replay after a lost feed cursor is exactly-once (note ledger)") {
    val root = tmp()
    val t = s"$root/tbl"; val vt = s"$root/view"; val feed = s"$root/feed"
    Snapshots.commitAppend(Seq((1L, "a", 10L)).toDF("id", "grp", "m").coalesce(1),
      t, recordSchema = true)
    Snapshots.mergeInto(spark, t, Seq((1L, "a", 15L)).toDF("id", "grp", "m"),
      keys = Seq("id"))
    ViewMaintenance.maintain(spark, t, Seq("id"), Seq("grp"), Seq("m"), feed, vt)
    assertParity(t, vt)
    // crash simulation: the feed cursor vanishes; sync re-materializes the
    // dirs, but the view's note ledger must refuse to double-apply
    new java.io.File(s"$feed/_cursor").delete()
    assert(ViewMaintenance.maintain(spark, t, Seq("id"), Seq("grp"), Seq("m"), feed, vt)
      === Seq.empty)
    assertParity(t, vt)
  }
}
