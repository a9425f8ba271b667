package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** MIN/MAX/COUNT complete aggregate pushdown (one row from zone maps, no
  * data files) and ORDER BY + LIMIT top-k pushdown (k rows across the V1
  * boundary). Exactness gates pinned: deletion vectors and missing stat
  * coverage decline to the normal path and stay correct. */
class GraftPushSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_push").toString
    spark.conf.set("spark.sql.catalog.gpush", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpush.root", r)
    r
  }

  private def mk(name: String, statted: Boolean): String = {
    val t = s"$root/$name"
    (0 until 3).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"s${x % 3}", x * 2L))
          .toDF("id", "src", "m").coalesce(1),
        t, recordSchema = i == 0,
        statsCols = if (statted) Seq("id") else Nil,
        recordRowCounts = statted)
    }
    t
  }

  private def aggScanUsed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        (r.scan match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper => w.v1Scan
          case s => s
        }).isInstanceOf[GraftAggScan]
      case _ => false
    }

  test("min/max/count fold from zone maps: one metadata row, no data files") {
    mk("a1", statted = true)
    val q = spark.sql("SELECT min(id) AS mn, max(id) AS mx, count(*) AS n FROM gpush.a1")
    assert(aggScanUsed(q), "expected the zone-map aggregate scan")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 30L, 30L)))
    // the scan recorded a metadata-only observation
    assert(GraftScanInfo.last.exists(_.pushed.exists(_.contains("zone maps"))))
  }

  test("live deletion vector declines min/max pushdown; result stays exact") {
    val t = mk("a2", statted = true)
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, Seq("id"))
    val q = spark.sql("SELECT min(id) AS mn, count(*) AS n FROM gpush.a2")
    assert(!aggScanUsed(q), "a tombstone can hide the extreme row — must decline")
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 29L)))
  }

  test("missing stat coverage declines; result stays exact") {
    mk("a3", statted = false)
    val q = spark.sql("SELECT max(id) AS mx FROM gpush.a3")
    assert(!aggScanUsed(q))
    assert(q.collect().head.getLong(0) === 30L)
  }

  test("grouped or filtered aggregates never route to the metadata scan") {
    mk("a4", statted = true)
    val g = spark.sql("SELECT src, min(id) AS mn FROM gpush.a4 GROUP BY src")
    assert(!aggScanUsed(g))
    assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("s0" -> 3L, "s1" -> 1L, "s2" -> 2L))
    val f = spark.sql("SELECT min(id) AS mn FROM gpush.a4 WHERE id > 5")
    assert(!aggScanUsed(f))
    assert(f.collect().head.getLong(0) === 6L)
  }

  test("ORDER BY + LIMIT folds as top-k into the wrapped scan") {
    mk("a5", statted = true)
    val q = spark.sql("SELECT id, m FROM gpush.a5 ORDER BY m DESC LIMIT 3")
    val desc = q.queryExecution.optimizedPlan.collectLeaves().collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        (r.scan match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper => w.v1Scan
          case s => s
        }).description()
    }.getOrElse("")
    assert(desc.contains("topN=3"), s"expected folded top-k, got: $desc")
    assert(q.as[(Long, Long)].collect().toSeq ===
      Seq((30L, 60L), (29L, 58L), (28L, 56L)))
  }
}
