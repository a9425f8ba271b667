package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** SupportsReportStatistics on the catalog scan: manifest-recorded
  * `__bytes`/`__rows` flow into Spark's join planning, so small graft
  * tables auto-broadcast and pushed filters shrink the estimate with the
  * candidate set. Also pins the commit-side contract: every commit path
  * records `__bytes` for its added files, and rewrites re-record `__rows`
  * iff the touched files carried them. */
class GraftStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_stats").toString
    spark.conf.set("spark.sql.catalog.gstat", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstat.root", r)
    r
  }

  private def bytesStats(t: String): Map[String, Long] =
    Snapshots.fileStats(spark, t)
      .filter(_.column == Snapshots.BytesStat)
      .map(st => st.path -> st.min.toLong).toMap

  test("commit records __bytes for every added file, matching disk") {
    val t = s"$root/b1"
    Snapshots.commitAppend(
      (1 to 100).map(i => (i.toLong, s"d$i")).toDF("id", "s").repartition(3),
      t, recordSchema = true, statsCols = Seq("id"))
    val live = Snapshots.liveFiles(spark, t)
    val bs = bytesStats(t)
    assert(live.nonEmpty && live.forall(bs.contains))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    live.foreach { p =>
      assert(bs(p) === fs.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen)
    }
  }

  test("estimateStatistics sums candidate bytes and rows; filters shrink it") {
    val t = s"$root/b2"
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, x * 2L)).toDF("id", "m")
          .coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"), recordRowCounts = true)
    }
    val table = new GraftTable(t, "b2", Snapshots.currentVersion(spark, t))
    val full = new GraftScan(table, table.schema, Array.empty).estimateStatistics()
    assert(full.numRows.getAsLong === 40L)
    assert(full.sizeInBytes.getAsLong === bytesStats(t).values.sum)
    val pruned = new GraftScan(table, table.schema,
      Array(org.apache.spark.sql.sources.LessThanOrEqual("id", 10L)))
      .estimateStatistics()
    assert(pruned.numRows.getAsLong === 10L)
    assert(pruned.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong)
  }

  test("small graft table auto-broadcasts in a SQL join (no hint)") {
    val dim = s"$root/dim"
    val fact = s"$root/fact"
    Snapshots.commitAppend(
      (1L to 20L).map(k => (k, s"name$k")).toDF("k", "name").coalesce(1),
      dim, recordSchema = true)
    Snapshots.commitAppend(
      (1L to 5000L).map(i => (i, i % 20 + 1)).toDF("id", "k").repartition(4),
      fact, recordSchema = true)
    val joined = spark.sql(
      """SELECT f.id, d.name FROM gstat.fact f JOIN gstat.dim d ON f.k = d.k""")
    // the optimized leaves must carry the stats-forwarding wrapper — the
    // broadcast below derives from THESE numbers, not a hint
    val leafStats = joined.queryExecution.optimizedPlan.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.stats.sizeInBytes
    }
    assert(leafStats.size === 2 && leafStats.forall(_ < BigInt(10L << 20)),
      s"expected manifest-sized leaf stats, got $leafStats")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected auto-broadcast from reported stats, got:\n$plan")
    assert(joined.count() === 5000L)
  }

  test("rewrites keep __rows when present; reserved stats never reach computeStats") {
    val t = s"$root/b3"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"v$x")).toDF("id", "s")
          .coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"), recordRowCounts = true)
    }
    // CoW delete rewrites the first file — the latent-crash path when the
    // manifest-derived stat columns included __rows/__bytes
    val r = Snapshots.deleteWhere(spark, t, col("id") <= 3,
      prune = Some(("id", "1", "3")))
    assert(r.rewritten.size === 1)
    // the rewritten file carries fresh __rows (fastCount stays metadata-only)
    val live = Snapshots.liveFiles(spark, t).toSet
    val rows = Snapshots.fileStats(spark, t)
      .filter(st => st.column == Snapshots.RowsStat && live(st.path))
    assert(rows.map(_.path).toSet === live)
    assert(rows.map(_.min.toLong).sum === 17L)
    assert(Snapshots.fastCount(spark, t) === 17L)
    // merge path too (upsert touching the rewritten file)
    Snapshots.mergeInto(spark, t,
      Seq((4L, "V4"), (99L, "V99")).toDF("id", "s"), Seq("id"))
    val live2 = Snapshots.liveFiles(spark, t).toSet
    val rows2 = Snapshots.fileStats(spark, t)
      .filter(st => st.column == Snapshots.RowsStat && live2(st.path))
    assert(rows2.map(_.path).toSet === live2)
    assert(Snapshots.fastCount(spark, t) === 18L)
  }
}
