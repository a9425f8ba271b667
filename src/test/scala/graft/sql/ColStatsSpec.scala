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
    // numeric columns ALWAYS record true min/max: FilterEstimation's
    // range check prices equality predicates as 0 rows without one
    assert(ColStats.rangeOf(spark, t).get("id").contains((1.0, 1000.0)))
    assert(!ColStats.rangeOf(spark, t).contains("cat")) // strings: none
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

  test("equi-height histogram: skew-honest selectivity flips the join per the value") {
    val t = s"$root/th"
    // 95% band 0, bands 1..19 share 5% — the NDV-uniform estimate prices
    // every band at 5%, the histogram prices each at its real share
    val fact = (1L to 50000L).map { x =>
      val band = if (x % 20 != 19) 0L else (x % 380) / 20 + 1
      (x, band, s"s${x % 5}", x * 2)
    }.toDF("id", "band", "src", "m").repartition(2)
    Snapshots.commitAppend(fact, t, recordSchema = true, recordRowCounts = true)
    val cboPrev = spark.conf.get("spark.sql.cbo.enabled")
    val thrPrev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def filtEst(band: Long): BigInt = spark.sql(
      s"SELECT src FROM gcs.th WHERE band = $band").queryExecution
      .optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.stats.sizeInBytes
      }.head
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // NDV only (no histogram): every band prices at 1/ndv — measure
      // that uniform estimate and pin the broadcast threshold UNDER it
      spark.sql("CALL gcs.system.analyze('th', 'band,src,m')")
      val estUniform = filtEst(19)
      assert(estUniform === filtEst(0)) // NDV-uniform: bands indistinguishable
      val threshold = estUniform / 3
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      // dim sized comfortably over the threshold so it never broadcasts
      val dimT = s"$root/thd"
      Snapshots.commitAppend(
        (0 until 5).map(i => (s"s$i", s"cat$i", "x" * (threshold.toInt / 2)))
          .toDF("src", "cat", "pad").coalesce(1),
        dimT, recordSchema = true, recordRowCounts = true)
      spark.sql("CALL gcs.system.analyze('thd', 'src,cat,pad')")
      def planOf(band: Long) = spark.sql(
        s"""SELECT d.cat, count(*) AS n, sum(length(d.pad)) AS pl
           |FROM gcs.th f JOIN gcs.thd d ON f.src = d.src
           |WHERE f.band = $band GROUP BY d.cat""".stripMargin).queryExecution
      // rare band looks like 5% of the table — over threshold, no broadcast
      assert(!planOf(19).executedPlan.toString.contains("BroadcastHashJoin"))
      // with the histogram: the rare band prices at its real share (~0.26%)
      // and the fact side broadcasts; the hot band still shuffle-joins
      spark.sql("CALL gcs.system.analyze('th', 'band,src,m', 64)")
      val hist = ColStats.histOf(spark, t)
      assert(hist.contains("band") && hist("band")._2.size === 64, hist.keys.toString)
      assert(hist("band")._2.head._3 >= 1L) // empty bins still describe 1 value
      // the estimates behind the flip: rare << threshold << common
      assert(filtEst(19) < threshold, s"${filtEst(19)} vs $threshold")
      assert(filtEst(0) > threshold, s"${filtEst(0)} vs $threshold")
      assert(planOf(19).executedPlan.toString.contains("BroadcastHashJoin"))
      assert(!planOf(0).executedPlan.toString.contains("BroadcastHashJoin"))
      // results are stats-independent: both plans return identical rows
      val rare = spark.sql(
        """SELECT d.cat, count(*) AS n FROM gcs.th f JOIN gcs.thd d
          |ON f.src = d.src WHERE f.band = 19 GROUP BY d.cat ORDER BY d.cat"""
          .stripMargin).as[(String, Long)].collect().toSeq
      assert(rare.map(_._2).sum === (1L to 50000L)
        .count(x => x % 20 == 19 && (x % 380) / 20 + 1 == 19))
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboPrev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thrPrev)
    }
  }

  test("date/timestamp histograms: temporal skew prices at its real share") {
    val t = s"$root/td"
    // 95% of rows on one hot day; days 1..19 share the rest
    val rows = (1L to 20000L).map { i =>
      val day = if (i % 20 != 19) 0 else ((i % 380) / 20 + 1).toInt
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1).plusDays(day))
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2026, 1, 1, 0, 0).plusDays(day).plusSeconds(i % 60))
      (i, d, ts)
    }
    Snapshots.commitAppend(rows.toDF("id", "d", "ts").repartition(2), t,
      recordSchema = true, recordRowCounts = true)
    spark.sql("CALL gcs.system.analyze('td', 'd,ts', 32)")
    // ranges + histograms recorded through the temporal numeric image
    val r = ColStats.rangeOf(spark, t)
    assert(r.contains("d") && r.contains("ts"), r.keys.toString)
    assert(r("d")._1 === java.time.LocalDate.of(2026, 1, 1).toEpochDay.toDouble)
    val h = ColStats.histOf(spark, t)
    assert(h.contains("d") && h.contains("ts"), h.keys.toString)
    val cboPrev = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // the optimizer's attribute stats carry min/max + histogram for
      // BOTH temporal columns
      val attrs = spark.sql("SELECT d, ts FROM gcs.td")
        .queryExecution.optimizedPlan.stats.attributeStats
        .toSeq.map { case (a, cs) => a.name -> cs }.toMap
      assert(attrs("d").min.isDefined && attrs("d").histogram.isDefined,
        attrs("d").toString)
      assert(attrs("ts").min.isDefined && attrs("ts").histogram.isDefined,
        attrs("ts").toString)
      // skew-honest: the rare day estimates far below the hot day
      def est(day: String): BigInt = spark.sql(
        s"SELECT id FROM gcs.td WHERE d = DATE'$day'").queryExecution
        .optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.stats.rowCount.getOrElse(BigInt(-1))
        }.head
      val (hot, rare) = (est("2026-01-01"), est("2026-01-20"))
      assert(hot > 0 && rare > 0, s"hot=$hot rare=$rare")
      assert(rare * 3 <= hot, s"hot=$hot rare=$rare")
      // true shares: hot 19000, rare ~52 — the estimate should be
      // within an order of magnitude of each
      assert(hot > BigInt(5000) && rare < BigInt(1000), s"hot=$hot rare=$rare")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboPrev)
    // results never depend on stats
    assert(spark.sql("SELECT count(*) FROM gcs.td WHERE d = DATE'2026-01-20'")
      .as[Long].head() === (1L to 20000L).count(i =>
        i % 20 == 19 && (i % 380) / 20 + 1 == 19))
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
