package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** SQL-visible MATERIALIZED VIEWS: `CALL graft.system.create_mv` persists
  * the IVM spec as table properties, `refresh_mv` folds all pending
  * source versions in one merge ([[graft.io.ViewMaintenance]]), and a
  * plain `SELECT * FROM catalog.view` reads the maintained aggregate
  * with identity (count-zero) rows filtered. */
class GraftMvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_mv").toString
    spark.conf.set("spark.sql.catalog.gmv", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmv.root", r)
    r
  }

  test("create_mv / refresh_mv: maintained aggregate, group moves, emptied groups, ledger") {
    val src = s"$root/ev"
    Snapshots.commitAppend(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("id", "g", "v")
        .coalesce(1), src, recordSchema = true)
    val created = spark.sql(
      "CALL gmv.system.create_mv('mv1', 'ev', 'id', 'g', 'v')").collect().head
    assert(created.getLong(1) === 1L) // one source version folded
    def view(): Seq[(String, Long, Long)] =
      spark.sql("SELECT g, n_rows, sum_v FROM gmv.mv1 ORDER BY g")
        .as[(String, Long, Long)].collect().toSeq
    assert(view() === Seq(("a", 2L, 30L), ("b", 1L, 30L)))
    // a GROUP-MOVING update (the case naive re-aggregation gets wrong)
    // plus a delete — then ONE refresh folds both versions
    Snapshots.mergeInto(spark, src, Seq((2L, "b", 25L)).toDF("id", "g", "v"),
      keys = Seq("id"))
    Snapshots.deleteWhere(spark, src, col("id") === 3L)
    val r1 = spark.sql("CALL gmv.system.refresh_mv('mv1')").collect().head
    assert(r1.getLong(1) === 2L)
    assert(view() === Seq(("a", 1L, 10L), ("b", 1L, 25L)))
    // empty group 'a' entirely: the view stores an identity row, SQL
    // reads filter it, and COUNT(*) must NOT metadata-count the ghost
    Snapshots.deleteWhere(spark, src, col("id") === 1L)
    spark.sql("CALL gmv.system.refresh_mv('mv1')")
    assert(view() === Seq(("b", 1L, 25L)))
    assert(spark.sql("SELECT count(*) AS n FROM gmv.mv1").as[Long].head() === 1L)
    // exactly-once: a second refresh has nothing to apply
    assert(spark.sql("CALL gmv.system.refresh_mv('mv1')")
      .collect().head.getLong(1) === 0L)
    // the view's content is DERIVED — direct writes refuse
    val ins = intercept[Exception] {
      spark.sql("INSERT INTO gmv.mv1 VALUES ('x', 1, 1)") }
    assert(ins.getMessage.contains("materialized view"), ins.getMessage)
    val del = intercept[Exception] { spark.sql("DELETE FROM gmv.mv1 WHERE n_rows = 1") }
    assert(del.getMessage.contains("materialized view"), del.getMessage)
    // create_mv refuses an existing view; refresh_mv refuses a non-view
    intercept[Exception] {
      spark.sql("CALL gmv.system.create_mv('mv1', 'ev', 'id', 'g', 'v')").collect() }
    intercept[Exception] {
      spark.sql("CALL gmv.system.refresh_mv('ev')").collect() }
  }

  test("min/max and approx-distinct measures maintain through SQL refresh") {
    val src = s"$root/ev2"
    Snapshots.commitAppend(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L)).toDF("id", "g", "v")
        .coalesce(1), src, recordSchema = true, statsCols = Seq("g"))
    spark.sql("CALL gmv.system.create_mv('mv2', 'ev2', 'id', 'g', 'v', 'v', 'v')")
    def agg(): (Long, Long, Long) =
      spark.sql("SELECT min_v, max_v, hll_sketch_estimate(hll_v) AS d FROM gmv.mv2")
        .as[(Long, Long, Long)].head()
    assert(agg() === ((10L, 30L, 3L)))
    // deleting the stored max dirties the group → pruned recompute
    Snapshots.deleteWhere(spark, src, col("id") === 3L)
    spark.sql("CALL gmv.system.refresh_mv('mv2')")
    assert(agg() === ((10L, 20L, 2L)))
  }

  test("auto_refresh MV: every read observes a view current with its source") {
    val src = s"$root/ev3"
    Snapshots.commitAppend(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "g", "v").coalesce(1),
      src, recordSchema = true)
    spark.sql(
      "CALL gmv.system.create_mv('mv3', 'ev3', 'id', 'g', 'v', '', '', 'true')")
    def view(): Seq[(String, Long)] =
      spark.sql("SELECT g, sum_v FROM gmv.mv3 ORDER BY g")
        .as[(String, Long)].collect().toSeq
    assert(view() === Seq(("a", 10L), ("b", 20L)))
    // mutate the source; the NEXT READ folds it — no manual refresh_mv
    Snapshots.mergeInto(spark, src, Seq((3L, "a", 5L)).toDF("id", "g", "v"),
      keys = Seq("id"))
    assert(view() === Seq(("a", 15L), ("b", 20L)))
    Snapshots.deleteWhere(spark, src, col("id") === 2L)
    assert(view() === Seq(("a", 15L)))
    // a fresh view costs one metadata check: reading twice does not
    // advance the view's version
    val v0 = Snapshots.currentVersion(spark, s"$root/mv3")
    view(); view()
    assert(Snapshots.currentVersion(spark, s"$root/mv3") === v0)
    // time travel reads the recorded past and must NOT refresh
    Snapshots.commitAppend(Seq((4L, "c", 7L)).toDF("id", "g", "v").coalesce(1),
      src, recordSchema = false)
    assert(spark.sql(s"SELECT g, sum_v FROM gmv.mv3 VERSION AS OF $v0 ORDER BY g")
      .as[(String, Long)].collect().toSeq === Seq(("a", 15L)))
    assert(Snapshots.currentVersion(spark, s"$root/mv3") === v0)
    // …and the next current read catches up
    assert(view() === Seq(("a", 15L), ("c", 7L)))
    // a non-auto MV (mv1/mv2 shape) never refreshes on read: pinned by
    // the bad-arg guard + default
    val e = intercept[Exception] {
      spark.sql("CALL gmv.system.create_mv('mv4', 'ev3', 'id', 'g', 'v', '', '', 'yes')")
        .collect()
    }
    assert(e.getMessage.contains("auto_refresh"), e.getMessage)
  }
}
