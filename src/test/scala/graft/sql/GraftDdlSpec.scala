package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** Table properties + ALTER TABLE through the catalog: TBLPROPERTIES are
  * manifest-recorded (transactional, time-traveling, checkpoint-carried),
  * `write.delete.mode=mor` routes SQL DELETE onto deletion vectors, and
  * ADD COLUMNS is a schema-evolution commit (x95 machinery) — old files
  * read null-padded, AS OF below the evolution serves the old shape. */
class GraftDdlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_ddl").toString
    spark.conf.set("spark.sql.catalog.gdl", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdl.root", r)
    r
  }

  private def mk(name: String): String = {
    val t = s"$root/$name"
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"s${x % 3}", x * 2L))
          .toDF("id", "src", "m").coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"))
    }
    t
  }

  test("TBLPROPERTIES: CREATE records them, SET/UNSET are commits, AS OF sees history") {
    val t = s"$root/p1" // forces the lazy catalog registration first
    spark.sql("""CREATE TABLE gdl.p1 (id BIGINT, s STRING)
                 TBLPROPERTIES ('quality.tier' = 'bronze')""")
    assert(Snapshots.tableProperties(spark, t) === Map("quality.tier" -> "bronze"))
    spark.sql("ALTER TABLE gdl.p1 SET TBLPROPERTIES ('quality.tier' = 'gold', 'owner.team' = 'corpus')")
    assert(Snapshots.tableProperties(spark, t) ===
      Map("quality.tier" -> "gold", "owner.team" -> "corpus"))
    spark.sql("ALTER TABLE gdl.p1 UNSET TBLPROPERTIES ('owner.team')")
    assert(Snapshots.tableProperties(spark, t) === Map("quality.tier" -> "gold"))
    // each change was one commit; properties time-travel with versions
    assert(Snapshots.currentVersion(spark, t) === 3L)
    assert(Snapshots.tableProperties(spark, t, Some(1L)) ===
      Map("quality.tier" -> "bronze"))
    // SHOW TBLPROPERTIES reads the same surface
    val shown = spark.sql("SHOW TBLPROPERTIES gdl.p1").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("quality.tier").contains("gold"))
    // properties survive a checkpoint + expiry (carried in full state)
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    Snapshots.expireVersions(spark, t, keepFrom = 4L)
    assert(Snapshots.tableProperties(spark, t) === Map("quality.tier" -> "gold"))
  }

  test("write.delete.mode=mor: SQL DELETE commits one dv, rewrites zero data files") {
    val t = mk("mor1")
    spark.sql("""ALTER TABLE gdl.mor1 SET TBLPROPERTIES
                 ('write.delete.mode' = 'mor', 'write.merge.keys' = 'id')""")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("DELETE FROM gdl.mor1 WHERE id BETWEEN 11 AND 13")
    // zero data files rewritten — the whole point of MoR
    assert(Snapshots.liveFiles(spark, t).toSet === before)
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    assert(spark.sql("SELECT count(*) AS n FROM gdl.mor1").as[Long].head() === 37L)
    assert(spark.sql("SELECT count(*) AS n FROM gdl.mor1 WHERE id = 12")
      .as[Long].head() === 0L)
    // pre-delete version reads in full; the dv commit shows in $history
    val v = Snapshots.currentVersion(spark, t)
    assert(spark.sql(s"SELECT count(*) AS n FROM gdl.mor1 VERSION AS OF ${v - 1}")
      .as[Long].head() === 40L)
    val dvAdds = spark.sql(s"SELECT dv_adds FROM gdl.`mor1$$history` WHERE version = $v")
      .as[Int].head()
    assert(dvAdds === 1)
    // the extension DELETE path routes on the same property (predicate
    // v1 filters cannot express → GraftDeleteCommand → MoR)
    spark.sql("DELETE FROM gdl.mor1 WHERE id % 10 = 5")
    assert(Snapshots.liveFiles(spark, t).toSet === before)
    assert(spark.sql("SELECT count(*) AS n FROM gdl.mor1").as[Long].head() === 33L)
    // flipping back to cow rewrites files again
    spark.sql("ALTER TABLE gdl.mor1 SET TBLPROPERTIES ('write.delete.mode' = 'cow')")
    spark.sql("DELETE FROM gdl.mor1 WHERE id = 1")
    assert(Snapshots.liveFiles(spark, t).toSet !== before)
    // mor without keys refuses loudly
    spark.sql("""ALTER TABLE gdl.mor1 SET TBLPROPERTIES ('write.delete.mode' = 'mor')""")
    spark.sql("ALTER TABLE gdl.mor1 UNSET TBLPROPERTIES ('write.merge.keys')")
    val e = intercept[Exception] { spark.sql("DELETE FROM gdl.mor1 WHERE id = 2") }
    assert(e.getMessage.contains("write.merge.keys"), e.getMessage)
  }

  test("ALTER TABLE ADD COLUMNS: schema-evolution commit; old versions and files null-pad") {
    val t = mk("ev1")
    spark.sql("ALTER TABLE gdl.ev1 ADD COLUMNS (score DOUBLE, note STRING)")
    assert(Snapshots.currentVersion(spark, t) === 5L)
    // current read: old files null-padded to the new shape
    val row = spark.sql("SELECT id, score, note FROM gdl.ev1 WHERE id = 7")
      .collect().head
    assert(row.getLong(0) === 7L && row.isNullAt(1) && row.isNullAt(2))
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ev1 WHERE score IS NULL")
      .as[Long].head() === 40L)
    // AS OF below the evolution serves the OLD shape
    assert(spark.sql("SELECT * FROM gdl.ev1 VERSION AS OF 4").columns.toSeq ===
      Seq("id", "src", "m"))
    assert(spark.sql("SELECT * FROM gdl.ev1").columns.toSeq ===
      Seq("id", "src", "m", "score", "note"))
    // INSERT with the new shape commits; mixed-era reads coexist
    spark.sql("INSERT INTO gdl.ev1 VALUES (99, 'sx', 0, 0.5, 'fresh')")
    assert(spark.sql("SELECT note FROM gdl.ev1 WHERE id = 99").as[String].head() === "fresh")
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ev1").as[Long].head() === 41L)
    // refusal: type changes would re-map immutable files
    intercept[Exception] {
      spark.sql("ALTER TABLE gdl.ev1 ALTER COLUMN score TYPE STRING") }
  }

  test("RENAME COLUMN is metadata-only: both file generations read, zone maps keep pruning") {
    val t = mk("rn1")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("ALTER TABLE gdl.rn1 RENAME COLUMN id TO doc_id")
    // metadata-only: no file rewritten, one commit
    assert(Snapshots.liveFiles(spark, t).toSet === before)
    assert(Snapshots.currentVersion(spark, t) === 5L)
    assert(spark.sql("SELECT * FROM gdl.rn1").columns.toSeq ===
      Seq("doc_id", "src", "m"))
    // old files serve values under the NEW name
    assert(spark.sql("SELECT sum(doc_id) AS s FROM gdl.rn1").as[Long].head()
      === (1L to 40L).sum)
    // writes after the rename land under the new name; mixed generations
    // resolve in one scan
    spark.sql("INSERT INTO gdl.rn1 VALUES (99, 'sx', 0)")
    assert(spark.sql("SELECT count(*) AS n FROM gdl.rn1 WHERE doc_id = 99")
      .as[Long].head() === 1L)
    // zone maps recorded under the OLD physical name still prune under
    // the new logical name (the stat-less post-rename insert file is
    // conservatively scanned, as ever)
    val (scan, skip) = Snapshots.pruneFiles(spark, t, "doc_id", "11", "20")
    assert(skip.size === 3, s"scan=$scan skip=$skip")
    // SQL filter pushes through too
    assert(spark.sql("SELECT sum(m) AS s FROM gdl.rn1 WHERE doc_id BETWEEN 11 AND 20")
      .as[Long].head() === (11L to 20L).map(_ * 2).sum)
    // AS OF below the evolution serves the OLD name
    assert(spark.sql("SELECT * FROM gdl.rn1 VERSION AS OF 4").columns.toSeq ===
      Seq("id", "src", "m"))
    assert(spark.sql("SELECT sum(id) AS s FROM gdl.rn1 VERSION AS OF 4")
      .as[Long].head() === (1L to 40L).sum)
    // DML on the renamed column works (CoW rewrite heals the generation)
    spark.sql("UPDATE gdl.rn1 SET m = 0 WHERE doc_id BETWEEN 1 AND 10")
    assert(spark.sql("SELECT sum(m) AS s FROM gdl.rn1 WHERE doc_id <= 10")
      .as[Long].head() === 0L)
  }

  test("DROP COLUMN is metadata-only: files unrewritten, reads project away; resurrection refused") {
    val t = mk("dr1")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("ALTER TABLE gdl.dr1 DROP COLUMN src")
    assert(Snapshots.liveFiles(spark, t).toSet === before)
    assert(spark.sql("SELECT * FROM gdl.dr1").columns.toSeq === Seq("id", "m"))
    assert(spark.sql("SELECT sum(m) AS s FROM gdl.dr1").as[Long].head()
      === (1L to 40L).map(_ * 2).sum)
    // AS OF below still serves the dropped column
    assert(spark.sql("SELECT src FROM gdl.dr1 VERSION AS OF 4 WHERE id = 1")
      .as[String].head() === "s1")
    // re-adding the same name would resurrect old data from live files
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.dr1 ADD COLUMNS (src STRING)") }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // a fresh name is fine, and inserts under the narrowed schema work
    spark.sql("ALTER TABLE gdl.dr1 ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO gdl.dr1 VALUES (99, 0, 'fresh')")
    assert(spark.sql("SELECT tag FROM gdl.dr1 WHERE id = 99").as[String].head()
      === "fresh")
  }

  test("rename chains and rename-after-drop guards") {
    val t = mk("rn2")
    spark.sql("ALTER TABLE gdl.rn2 RENAME COLUMN m TO metric")
    spark.sql("ALTER TABLE gdl.rn2 RENAME COLUMN metric TO measure")
    // chained rename: the mapping carries the ORIGINAL physical name
    assert(Snapshots.columnMapping(spark, t) === Map("measure" -> "m"))
    assert(spark.sql("SELECT sum(measure) AS s FROM gdl.rn2").as[Long].head()
      === (1L to 40L).map(_ * 2).sum)
    // renaming another column to a live physical name would collide with
    // the old files' data
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.rn2 RENAME COLUMN src TO m") }
    assert(e.getMessage.contains("physical name"), e.getMessage)
  }

  test("ALTER COLUMN TYPE widening: metadata-only, mixed generations promote, pruning holds") {
    val t = s"$root/w1"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x, x.toFloat / 2)).toDF("id", "v")
          .coalesce(1),
        t, recordSchema = i == 0, statsCols = Seq("id"))
    }
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("ALTER TABLE gdl.w1 ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE gdl.w1 ALTER COLUMN v TYPE DOUBLE")
    assert(Snapshots.liveFiles(spark, t).toSet === before) // metadata-only
    // the widened schema accepts values the narrow type could not hold
    spark.sql("INSERT INTO gdl.w1 VALUES (9999999999, 0.5)")
    val got = spark.sql("SELECT max(id) AS m, sum(v) AS s FROM gdl.w1")
      .as[(Long, Double)].head()
    assert(got._1 === 9999999999L)
    assert(math.abs(got._2 - ((1 to 20).map(_.toDouble / 2).sum + 0.5)) < 1e-9)
    // zone maps recorded under the narrow dtype still prune banded reads
    val (_, skip) = Snapshots.pruneFiles(spark, t, "id", "1", "10")
    assert(skip.nonEmpty)
    // AS OF below the evolution serves the narrow shape
    val old = spark.sql("SELECT * FROM gdl.w1 VERSION AS OF 2").schema
    assert(old("id").dataType === org.apache.spark.sql.types.IntegerType)
    assert(old("v").dataType === org.apache.spark.sql.types.FloatType)
    // narrowing refuses loudly (Spark's analyzer gate: not an up-cast)
    val nar = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.w1 ALTER COLUMN id TYPE INT") }
    assert(nar.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), nar.getMessage)
    // float→string IS a Spark up-cast but re-maps bytes: our gate refuses
    val str = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.w1 ALTER COLUMN v TYPE STRING") }
    assert(str.getMessage.contains("WIDENING"), str.getMessage)
  }

  test("ADD COLUMN DEFAULT: old files serve the frozen default with zero rewrites") {
    val t = s"$root/df1"
    spark.sql("CREATE TABLE gdl.df1 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gdl.df1 VALUES (1, 'a'), (2, 'b')")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("ALTER TABLE gdl.df1 ADD COLUMNS (tier STRING DEFAULT 'bronze')")
    // metadata-only: no file rewritten, yet old rows read the default
    assert(Snapshots.liveFiles(spark, t).toSet === before)
    assert(spark.sql("SELECT id, tier FROM gdl.df1 ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "bronze"), (2L, "bronze")))
    // INSERT omitting the column fills CURRENT_DEFAULT; explicit NULL stays
    spark.sql("INSERT INTO gdl.df1 (id, s) VALUES (3, 'c')")
    spark.sql("INSERT INTO gdl.df1 VALUES (4, 'd', NULL)")
    val got = spark.sql("SELECT id, tier FROM gdl.df1 ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    assert(got === Seq((1L, Some("bronze")), (2L, Some("bronze")),
      (3L, Some("bronze")), (4L, None)))
    // SET DEFAULT changes future inserts only; history keeps the frozen fill
    spark.sql("ALTER TABLE gdl.df1 ALTER COLUMN tier SET DEFAULT 'silver'")
    spark.sql("INSERT INTO gdl.df1 (id, s) VALUES (5, 'e')")
    val after = spark.sql("SELECT id, tier FROM gdl.df1 ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    assert(after === Seq((1L, Some("bronze")), (2L, Some("bronze")),
      (3L, Some("bronze")), (4L, None), (5L, Some("silver"))))
    // DROP DEFAULT: inserts fill NULL again; old fills stay frozen
    spark.sql("ALTER TABLE gdl.df1 ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO gdl.df1 (id, s) VALUES (6, 'f')")
    assert(spark.sql("SELECT tier FROM gdl.df1 WHERE id IN (1, 6) ORDER BY id")
      .as[Option[String]].collect().toSeq === Seq(Some("bronze"), None))
  }

  test("CREATE TABLE with DEFAULT: inserts omitting the column fill it") {
    spark.sql("CREATE TABLE gdl.df2 (id BIGINT, qty BIGINT DEFAULT 7)")
    spark.sql("INSERT INTO gdl.df2 (id) VALUES (1)")
    spark.sql("INSERT INTO gdl.df2 VALUES (2, 9)")
    assert(spark.sql("SELECT id, qty FROM gdl.df2 ORDER BY id")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 7L), (2L, 9L)))
  }

  test("CHECK constraints: declaration validates history, writes gate O(change), NULL passes") {
    val t = mk("ck1")
    spark.sql("ALTER TABLE gdl.ck1 ADD CONSTRAINT m_pos CHECK (m > 0)")
    // a violating INSERT aborts with NOTHING committed
    val v0 = Snapshots.currentVersion(spark, t)
    val bad = intercept[Exception] {
      spark.sql("INSERT INTO gdl.ck1 VALUES (100, 'sx', -5)") }
    assert(bad.getMessage.contains("m_pos"), bad.getMessage)
    assert(Snapshots.currentVersion(spark, t) === v0)
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ck1").as[Long].head() === 40L)
    // a clean INSERT lands
    spark.sql("INSERT INTO gdl.ck1 VALUES (100, 'sx', 5), (101, 'sy', 6)")
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ck1").as[Long].head() === 42L)
    // NULL passes the CHECK (SQL three-valued rule) — nullable table
    spark.sql("CREATE TABLE gdl.ck2 (id BIGINT, m BIGINT)")
    spark.sql("ALTER TABLE gdl.ck2 ADD CONSTRAINT m_pos CHECK (m > 0)")
    spark.sql("INSERT INTO gdl.ck2 VALUES (1, 5), (2, NULL)")
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ck2").as[Long].head() === 2L)
    // UPDATE cannot smuggle a violation in
    val badUp = intercept[Exception] {
      spark.sql("UPDATE gdl.ck1 SET m = -m WHERE id = 5") }
    assert(badUp.getMessage.contains("m_pos"), badUp.getMessage)
    // MERGE honors the gate too
    Seq((5L, "s2", -7L)).toDF("id", "src", "m").createOrReplaceTempView("ck1_bad")
    val badMg = intercept[Exception] {
      spark.sql("""MERGE INTO gdl.ck1 t USING ck1_bad s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *""") }
    assert(badMg.getMessage.contains("m_pos"), badMg.getMessage)
    // declaring a constraint existing rows violate refuses
    val badAdd = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.ck1 ADD CONSTRAINT m_huge CHECK (m > 1000)") }
    assert(badAdd.getMessage.contains("existing rows"), badAdd.getMessage)
    // renaming a constrained column refuses; DROP CONSTRAINT frees it
    val badRn = intercept[Exception] {
      spark.sql("ALTER TABLE gdl.ck1 RENAME COLUMN m TO metric") }
    assert(badRn.getMessage.contains("m_pos"), badRn.getMessage)
    spark.sql("ALTER TABLE gdl.ck1 DROP CONSTRAINT m_pos")
    spark.sql("UPDATE gdl.ck1 SET m = -1 WHERE id = 5") // now allowed
    assert(spark.sql("SELECT m FROM gdl.ck1 WHERE id = 5").as[Long].head() === -1L)
  }

  test("replaceWhere: predicate overwrite swaps exactly the matching slice in one commit") {
    val t = mk("rw1")
    val before = Snapshots.liveFiles(spark, t).toSet
    val v0 = Snapshots.currentVersion(spark, t)
    // recompute the 11-20 band: rows 11-20 swap for 3 fresh rows
    Seq((11L, "s0", -1L), (12L, "s0", -2L), (20L, "s2", -3L))
      .toDF("id", "src", "m")
      .writeTo("gdl.rw1").overwrite(col("id") >= 11 && col("id") <= 20)
    assert(Snapshots.currentVersion(spark, t) === v0 + 1) // ONE commit
    val ids = spark.sql("SELECT id FROM gdl.rw1").as[Long].collect().toSet
    assert(ids === ((1L to 10L) ++ (21L to 40L) ++ Seq(11L, 12L, 20L)).toSet)
    assert(spark.sql("SELECT sum(m) AS s FROM gdl.rw1 WHERE id BETWEEN 11 AND 20")
      .as[Long].head() === -6L)
    // the band bound pruned: the three files outside it never rewrote
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    // data leaking outside the predicate refuses, nothing committed
    val e = intercept[Exception] {
      Seq((999L, "sx", 0L)).toDF("id", "src", "m")
        .writeTo("gdl.rw1").overwrite(col("id") <= 5)
    }
    assert(e.getMessage.contains("OUTSIDE"), e.getMessage)
    assert(Snapshots.currentVersion(spark, t) === v0 + 1)
    // time travel below the replace sees the old slice
    assert(spark.sql(s"SELECT sum(m) AS s FROM gdl.rw1 VERSION AS OF $v0 " +
      "WHERE id BETWEEN 11 AND 20").as[Long].head() ===
      (11L to 20L).map(_ * 2).sum)
  }

  test("streaming ingest honors CHECK constraints: a violating micro-batch aborts uncommitted") {
    val t = mk("ck3")
    spark.sql("ALTER TABLE gdl.ck3 ADD CONSTRAINT m_pos CHECK (m > 0)")
    val v0 = Snapshots.currentVersion(spark, t)
    Snapshots.commitBatchOnce(spark, t, 0L,
      Seq((100L, "sx", 5L)).toDF("id", "src", "m"))
    assert(Snapshots.currentVersion(spark, t) === v0 + 1)
    val e = intercept[Exception] {
      Snapshots.commitBatchOnce(spark, t, 1L,
        Seq((101L, "sy", -5L)).toDF("id", "src", "m")) }
    assert(e.getMessage.contains("m_pos"), e.getMessage)
    // nothing committed: the bad batch's files are unreferenced orphans
    assert(Snapshots.currentVersion(spark, t) === v0 + 1)
    assert(spark.sql("SELECT count(*) AS n FROM gdl.ck3").as[Long].head() === 41L)
  }

  test("DROP TABLE deletes the tree; refuses while a branch shares files; name reusable") {
    root // force the catalog registration
    spark.sql("CREATE TABLE gdl.dt1 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gdl.dt1 VALUES (1, 'a')")
    spark.sql("CALL gdl.system.branch('dt1', 'exp')")
    val e = intercept[Exception] { spark.sql("DROP TABLE gdl.dt1") }
    assert(e.getMessage.contains("branch"), e.getMessage)
    spark.sql("CALL gdl.system.drop_branch('dt1', 'exp')")
    spark.sql("DROP TABLE gdl.dt1")
    assert(!new java.io.File(s"$root/dt1").exists())
    spark.sql("CREATE TABLE gdl.dt1 (x BIGINT)") // the name is reusable
    spark.sql("INSERT INTO gdl.dt1 VALUES (7)")
    assert(spark.sql("SELECT x FROM gdl.dt1").as[Long].head() === 7L)
    spark.sql("DROP TABLE gdl.dt1")
  }
}