package graft.sql

import graft.SparkSpec
import graft.io.Snapshots

/** MERGE WITH SCHEMA EVOLUTION: source columns the table lacks evolve
  * the schema stamp (nullable, with the ADD COLUMNS resurrection
  * guards), then the ordinary keyed merge lands — existing rows read
  * the new columns as NULL, AS OF below the evolution serves the old
  * shape, and the general clause path refuses (it was analyzed against
  * the pre-evolution shape). */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_mevo").toString
    spark.conf.set("spark.sql.catalog.gme", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gme.root", r)
    r
  }

  test("star merge evolves the schema; untouched rows read NULL; AS OF serves old shape") {
    val t = s"$root/t1"
    Snapshots.commitAppend(Seq((1L, 10L), (5L, 50L)).toDF("id", "m").coalesce(1),
      t, recordSchema = true)
    val v0 = Snapshots.currentVersion(spark, t)
    Seq((1L, 11L, "x"), (2L, 22L, "y")).toDF("id", "m", "note")
      .createOrReplaceTempView("mevo_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gme.t1 t USING mevo_src s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT id, m, note FROM gme.t1 ORDER BY id")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(rows === Seq((1L, 11L, Some("x")), (2L, 22L, Some("y")),
      (5L, 50L, None))) // untouched row: evolved column reads NULL
    // AS OF below the evolution serves the old two-column shape
    assert(spark.sql(s"SELECT * FROM gme.t1 VERSION AS OF $v0").columns.toSeq
      === Seq("id", "m"))
  }

  test("evolution refuses on the general clause path and on resurrection") {
    val t = s"$root/t2"
    Snapshots.commitAppend(Seq((1L, 10L, "keep")).toDF("id", "m", "note")
      .coalesce(1), t, recordSchema = true)
    spark.sql("ALTER TABLE gme.t2 DROP COLUMN note")
    Seq((1L, 11L, "ghost")).toDF("id", "m", "note")
      .createOrReplaceTempView("mevo_src2")
    // adding 'note' back would resurrect the dropped physical data
    val res = intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gme.t2 t USING mevo_src2 s
                   ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""") }
    assert(res.getMessage.contains("resurrect"), res.getMessage)
    // conditioned clauses under evolution refuse with the ALTER-first hint
    val cond = intercept[Exception] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gme.t2 t USING mevo_src2 s
                   ON t.id = s.id
                   WHEN MATCHED AND s.m > 0 THEN UPDATE SET m = s.m""") }
    assert(cond.getMessage.contains("star shapes"), cond.getMessage)
  }
}
