package graft.sql

import graft.SparkSpec
import graft.io.{ColStats, Snapshots}
import org.apache.spark.sql.functions._

/** CALL analyze + DSv2 columnStats: recorded NDV/null/length statistics
  * reach the optimizer's attribute stats under CBO, time-travel with the
  * version they were recorded at, and never change query RESULTS. */
class ColStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_colstats").toString
    spark.conf.set("spark.sql.catalog.gcs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs.root", r)
    r
  }

  test("analyze records NDV within sketch tolerance; scan reports it to CBO") {
    val t = s"$root/t1"
    Snapshots.commitAppend(
      (1L to 1000L).map(i => (i, s"s${i % 7}", i % 13)).toDF("id", "cat", "m")
        .coalesce(2), t, recordSchema = true, statsCols = Seq("id"),
      recordRowCounts = true)
    spark.sql("CALL gcs.system.analyze('t1', 'id,cat')")
    val st = ColStats.of(spark, t)
    // HLL rsd default 5%: 1000 ids within 10%, 7 cats exact-ish
    assert(math.abs(st("id")._1 - 1000L) <= 100L, st("id").toString)
    assert(math.abs(st("cat")._1 - 7L) <= 1L, st("cat").toString)
    assert(st("cat")._2 === 0L) // no nulls
    // with CBO on, the optimized plan carries per-attribute distinctCount
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val df = spark.sql("SELECT id, cat FROM gcs.t1")
      val attrStats = df.queryExecution.optimizedPlan.stats.attributeStats
      val byName = attrStats.toSeq.map { case (a, s) => a.name -> s }.toMap
      assert(byName.contains("cat"), s"no attribute stats: $attrStats")
      assert(byName("cat").distinctCount.exists(d =>
        (d.toLong - 7L).abs <= 1L), byName("cat").toString)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // results are stats-independent
    assert(spark.sql("SELECT count(DISTINCT cat) AS n FROM gcs.t1")
      .as[Long].head() === 7L)
  }

  test("fixed-width columns report physical width, not string-image digits") {
    val t = s"$root/tw"
    Snapshots.commitAppend(
      (1L to 100L).map(i => (i * 100000L, s"name$i")).toDF("id", "nm")
        .coalesce(1), t, recordSchema = true)
    ColStats.analyze(spark, t, Seq("id", "nm"))
    val st = ColStats.of(spark, t)
    assert(st("id")._3 === 8L && st("id")._4 === 8L, st("id").toString) // BIGINT = 8 bytes
    assert(st("nm")._3 >= 5L && st("nm")._4 >= 6L, st("nm").toString)  // strings keep image lengths
  }

  test("stats time-travel: AS OF below the analyze sees none") {
    val t = s"$root/t2"
    Snapshots.commitAppend(
      (1L to 50L).map(i => (i, i % 3)).toDF("id", "g").coalesce(1),
      t, recordSchema = true)
    spark.sql("CALL gcs.system.analyze('t2', 'g')")
    assert(ColStats.of(spark, t).contains("g"))
    assert(ColStats.of(spark, t, Some(1L)).isEmpty)
    // unknown column refuses
    val e = intercept[Exception] {
      spark.sql("CALL gcs.system.analyze('t2', 'nope')") }
    assert(e.getMessage.contains("no such column"), e.getMessage)
  }
}
