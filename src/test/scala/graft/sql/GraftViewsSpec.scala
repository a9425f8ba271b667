package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** Logical views ([[GraftViewDdl]] / [[GraftViewReadRule]]): CREATE /
  * CREATE OR REPLACE / DROP / SHOW VIEWS against a graft catalog, stored
  * view text + schema as catalog metadata, late-binding read expansion,
  * name-collision rules with tables, and the DML refusal. */
class GraftViewsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_views").toString
    spark.conf.set("spark.sql.catalog.gvw", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gvw.root", r)
    r
  }

  private def mk(name: String): String = {
    val t = s"$root/$name"
    Snapshots.commitAppend(
      (1L to 20L).map(x => (x, s"s${x % 3}", x * 2L)).toDF("id", "src", "m")
        .coalesce(1), t, recordSchema = true, statsCols = Seq("id"))
    t
  }

  test("create → query → replace → drop; view file is catalog metadata") {
    mk("t1")
    spark.sql("CREATE VIEW gvw.v1 AS SELECT src, sum(m) AS sm FROM gvw.t1 GROUP BY src")
    val got = spark.sql("SELECT * FROM gvw.v1 ORDER BY src")
      .as[(String, Long)].collect().toSeq
    assert(got === (1L to 20L).groupBy(x => s"s${x % 3}").toSeq
      .map { case (s, xs) => (s, xs.map(_ * 2).sum) }.sortBy(_._1))
    // stored as one metadata file under _views — no data materialized
    assert(new java.io.File(s"$root/_views/v1.json").isFile)
    spark.sql("CREATE OR REPLACE VIEW gvw.v1 AS SELECT id FROM gvw.t1 WHERE id <= 5")
    assert(spark.sql("SELECT count(*) AS c FROM gvw.v1").as[Long].head() === 5L)
    spark.sql("DROP VIEW gvw.v1")
    val e = intercept[Exception] { spark.sql("SELECT * FROM gvw.v1").collect() }
    assert(e.getMessage.contains("cannot be found"), e.getMessage)
    spark.sql("DROP VIEW IF EXISTS gvw.v1") // no-op, no error
    val e2 = intercept[Exception] { spark.sql("DROP VIEW gvw.v1") }
    assert(e2.getMessage.toLowerCase.contains("view"), e2.getMessage)
  }

  test("late binding: the view tracks base-table mutations; AS OF underneath unaffected") {
    val t = mk("t2")
    spark.sql("CREATE VIEW gvw.v2 AS SELECT sum(m) AS sm FROM gvw.t2")
    val before = spark.sql("SELECT * FROM gvw.v2").as[Long].head()
    val v0 = Snapshots.currentVersion(spark, t)
    spark.sql("UPDATE gvw.t2 SET m = m + 100 WHERE id <= 10")
    // the view re-reads the CURRENT table (SQL late binding)
    assert(spark.sql("SELECT * FROM gvw.v2").as[Long].head() === before + 1000L)
    // time travel of the base table is untouched by the view layer
    assert(spark.sql(s"SELECT sum(m) AS sm FROM gvw.t2 VERSION AS OF $v0")
      .as[Long].head() === before)
  }

  test("name collisions: a view cannot shadow a table and vice versa") {
    mk("t3")
    val e1 = intercept[Exception] {
      spark.sql("CREATE VIEW gvw.t3 AS SELECT 1 AS one") }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    spark.sql("CREATE VIEW gvw.v3 AS SELECT id FROM gvw.t3")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gvw.v3 (x BIGINT)") }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
    // IF NOT EXISTS over an existing view: silent no-op, old text kept
    spark.sql("CREATE VIEW IF NOT EXISTS gvw.v3 AS SELECT 99 AS id")
    assert(spark.sql("SELECT count(*) AS c FROM gvw.v3").as[Long].head() === 20L)
  }

  test("column aliases, view-over-view, and CTE names inside view text") {
    mk("t4")
    spark.sql("""CREATE VIEW gvw.v4 (ident, metric) AS
                 SELECT id, m FROM gvw.t4 WHERE id <= 4""")
    assert(spark.sql("SELECT sum(metric) AS s FROM gvw.v4").as[Long]
      .head() === (1L to 4L).map(_ * 2).sum)
    // a view over a view expands recursively; a CTE name inside the text
    // must NOT be qualified into the catalog
    spark.sql("""CREATE VIEW gvw.v5 AS
                 WITH doubled AS (SELECT ident, metric * 2 AS m2 FROM gvw.v4)
                 SELECT sum(m2) AS s2 FROM doubled""")
    assert(spark.sql("SELECT * FROM gvw.v5").as[Long].head() ===
      (1L to 4L).map(_ * 4).sum)
    spark.sql("SHOW VIEWS IN gvw").show(false)
    val names = spark.sql("SHOW VIEWS IN gvw").select("viewName")
      .as[String].collect().toSet
    assert(Set("v4", "v5").subsetOf(names), names.toString)
  }

  test("self-referencing view text refuses at read with a cycle error") {
    mk("t5")
    spark.sql("CREATE VIEW gvw.v6 AS SELECT id FROM gvw.t5")
    // the REPLACE analyzes its text against the OLD v6 (fine), but the
    // stored text now names v6 itself — the read must detect the cycle
    spark.sql("CREATE OR REPLACE VIEW gvw.v6 AS SELECT id FROM gvw.v6 WHERE id > 0")
    val e = intercept[Exception] { spark.sql("SELECT * FROM gvw.v6").collect() }
    assert(e.getMessage.toLowerCase.contains("recursive"), e.getMessage)
  }

  test("DML against a view refuses loudly; analysis errors at create are loud") {
    mk("t6")
    spark.sql("CREATE VIEW gvw.v7 AS SELECT id, m FROM gvw.t6")
    Seq("DELETE FROM gvw.v7 WHERE id = 1",
        "UPDATE gvw.v7 SET m = 0 WHERE id = 1",
        "INSERT INTO gvw.v7 VALUES (99, 99)").foreach { stmt =>
      val e = intercept[Exception] { spark.sql(stmt) }
      assert(e.getMessage.contains("VIEW"), s"$stmt → ${e.getMessage}")
    }
    // base table untouched by the refusals
    assert(spark.sql("SELECT count(*) AS c FROM gvw.t6").as[Long].head() === 20L)
    // a view body that fails analysis refuses at CREATE (SQL contract)
    val e = intercept[Exception] {
      spark.sql("CREATE VIEW gvw.v8 AS SELECT no_such FROM gvw.t6") }
    assert(e.getMessage.nonEmpty)
    val e2 = intercept[Exception] { spark.sql("SELECT * FROM gvw.v8").collect() }
    assert(e2.getMessage.contains("cannot be found"), e2.getMessage)
  }

  test("SHOW CREATE TABLE on a view: runnable DDL round-trip") {
    mk("t8")
    spark.sql("""CREATE VIEW gvw.v9 (grp COMMENT 'the group', total)
                |COMMENT 'per-group totals'
                |TBLPROPERTIES ('owner' = 'pipeline', 'tier' = 'gold')
                |AS SELECT src, sum(m) AS sm FROM gvw.t8 GROUP BY src""".stripMargin)
    val ddl = spark.sql("SHOW CREATE TABLE gvw.v9").collect().head.getString(0)
    assert(ddl.startsWith("CREATE VIEW `gvw`.`v9`"), ddl)
    assert(ddl.contains("`grp` COMMENT 'the group'"), ddl)
    assert(ddl.contains("`total`"), ddl)
    assert(ddl.contains("COMMENT 'per-group totals'"), ddl)
    assert(ddl.contains("'owner' = 'pipeline'") && ddl.contains("'tier' = 'gold'"), ddl)
    assert(ddl.contains("AS\nSELECT src, sum(m) AS sm FROM gvw.t8 GROUP BY src"), ddl)
    val want = spark.sql("SELECT * FROM gvw.v9 ORDER BY grp")
      .as[(String, Long)].collect().toSeq
    // the emitted DDL is RUNNABLE: drop, re-create from it, same result
    spark.sql("DROP VIEW gvw.v9")
    spark.sql(ddl)
    assert(spark.sql("SELECT * FROM gvw.v9 ORDER BY grp")
      .as[(String, Long)].collect().toSeq === want)
    assert(spark.sql("SELECT grp FROM gvw.v9").columns.toSeq === Seq("grp"))
    // a minimal view (no column list / comment / props) stays minimal
    spark.sql("CREATE VIEW gvw.v10 AS SELECT id FROM gvw.t8")
    val ddl2 = spark.sql("SHOW CREATE TABLE gvw.v10").collect().head.getString(0)
    assert(ddl2 === "CREATE VIEW `gvw`.`v10` AS\nSELECT id FROM gvw.t8", ddl2)
  }
}
