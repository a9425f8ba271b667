package graft.sql

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** SQL row-level DML ([[GraftExtensions]] / [[GraftDmlRule]]): UPDATE,
  * full-expression DELETE, and MERGE INTO routed onto the library's
  * transactional mutators — with the same file discipline (zone-map
  * pruned candidates, match-checked copy-on-write, time travel intact)
  * the library calls have. */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_dml").toString
    spark.conf.set("spark.sql.catalog.gd", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gd.root", r)
    r
  }

  /** 4 one-file commits: ids 1-10 / 11-20 / 21-30 / 31-40, id zone maps. */
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

  test("UPDATE: CoW from SQL, condition-derived prune keeps untouched files byte-identical") {
    val t = mk("u1")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("UPDATE gd.u1 SET m = m * 10 WHERE id BETWEEN 11 AND 20")
    assert(Snapshots.currentVersion(spark, t) === 5L)
    // only the one overlapping file rewrote; the other three are the
    // SAME paths (never read, never written — the 100 TB posture)
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    val want = (1L to 40L).map(x => if (x >= 11 && x <= 20) x * 20 else x * 2).sum
    assert(spark.sql("SELECT sum(m) AS s FROM gd.u1").as[Long].head() === want)
    // SET expressions see OLD values; non-matching rows in the rewritten
    // file pass through; pre-update versions keep time-traveling
    assert(spark.sql("SELECT sum(m) AS s FROM gd.u1 VERSION AS OF 4")
      .as[Long].head() === (1L to 40L).map(_ * 2).sum)
  }

  test("UPDATE without WHERE touches every row; multi-assignment reads old values") {
    val t = mk("u2")
    spark.sql("UPDATE gd.u2 SET m = id, id = id + 100")
    // both assignments evaluated against the OLD row (standard UPDATE):
    // m becomes the old id, id shifts after
    val got = spark.sql("SELECT min(id) AS a, max(id) AS b, sum(m) AS s FROM gd.u2")
      .as[(Long, Long, Long)].head()
    assert(got === ((101L, 140L, (1L to 40L).sum)))
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("DELETE with a predicate v1 filters cannot express") {
    val t = mk("d1")
    spark.sql("DELETE FROM gd.d1 WHERE id % 10 = 7") // refused by SupportsDelete
    assert(spark.sql("SELECT count(*) AS n FROM gd.d1").as[Long].head() === 36L)
    assert(spark.sql("SELECT count(*) AS n FROM gd.d1 WHERE id % 10 = 7")
      .as[Long].head() === 0L)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("MERGE upsert (SET * / INSERT *): update + insert in one commit, key-pruned rewrite") {
    val t = mk("m1")
    Seq((11L, "zz", 1L), (99L, "zz", 2L)).toDF("id", "src", "m")
      .createOrReplaceTempView("m1_src")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("""MERGE INTO gd.m1 t USING m1_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(Snapshots.currentVersion(spark, t) === 5L) // ONE commit
    // only the file holding id 11 rewrote (semi-join match check inside
    // mergeInto); files 1/3/4 are byte-identical paths
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    val got = spark.sql("SELECT id, src, m FROM gd.m1 WHERE src = 'zz' ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((11L, "zz", 1L), (99L, "zz", 2L)))
    assert(spark.sql("SELECT count(*) AS n FROM gd.m1").as[Long].head() === 41L)
  }

  test("MERGE matched-only never inserts; insert-only never updates") {
    val t = mk("m2")
    Seq((12L, "up", 5L), (98L, "up", 6L)).toDF("id", "src", "m")
      .createOrReplaceTempView("m2_src")
    spark.sql("""MERGE INTO gd.m2 t USING m2_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *""")
    assert(spark.sql("SELECT count(*) AS n FROM gd.m2").as[Long].head() === 40L)
    assert(spark.sql("SELECT src FROM gd.m2 WHERE id = 12").as[String].head() === "up")
    spark.sql("""MERGE INTO gd.m2 t USING m2_src s ON t.id = s.id
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) AS n FROM gd.m2").as[Long].head() === 41L)
    // 12 was matched → untouched by the insert-only pass (still m = 5)
    assert(spark.sql("SELECT m FROM gd.m2 WHERE id = 12").as[Long].head() === 5L)
    assert(spark.sql("SELECT m FROM gd.m2 WHERE id = 98").as[Long].head() === 6L)
  }

  test("MERGE explicit full-row c = s.c assignments are accepted") {
    val t = mk("m3")
    Seq((13L, "ex", 7L)).toDF("id", "src", "m").createOrReplaceTempView("m3_src")
    spark.sql("""MERGE INTO gd.m3 t USING m3_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET id = s.id, src = s.src, m = s.m
                 WHEN NOT MATCHED THEN INSERT (id, src, m) VALUES (s.id, s.src, s.m)""")
    assert(spark.sql("SELECT src FROM gd.m3 WHERE id = 13").as[String].head() === "ex")
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("MERGE full-sync triple (BY SOURCE DELETE) makes the table equal the source") {
    val t = mk("m4")
    Seq((11L, "sync", 1L), (99L, "sync", 2L)).toDF("id", "src", "m")
      .createOrReplaceTempView("m4_src")
    spark.sql("""MERGE INTO gd.m4 t USING m4_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(Snapshots.currentVersion(spark, t) === 5L) // ONE swap commit
    assert(spark.sql("SELECT id, src, m FROM gd.m4 ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((11L, "sync", 1L), (99L, "sync", 2L)))
    // pre-sync versions keep time-traveling (swap, never delete)
    assert(spark.sql("SELECT count(*) AS n FROM gd.m4 VERSION AS OF 4")
      .as[Long].head() === 40L)
    // BY SOURCE DELETE without the INSERT arm routes to the general
    // algebra: matched rows update, unmatched targets drop, NO inserts
    Seq((11L, "keep", 7L)).toDF("id", "src", "m")
      .createOrReplaceTempView("m4_src2")
    spark.sql("""MERGE INTO gd.m4 t USING m4_src2 s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT id, src, m FROM gd.m4 ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq === Seq((11L, "keep", 7L)))
  }

  test("MERGE BY SOURCE sweeps: conditioned DELETE and UPDATE on unmatched targets") {
    val t = mk("m5")
    // source matches ids 1-10 (file 1); everything else is unmatched
    (1L to 10L).map(i => (i, "s", i)).toDF("id", "src", "m")
      .createOrReplaceTempView("m5_src")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("""MERGE INTO gd.m5 t USING m5_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET m = s.m + 1000
                 WHEN NOT MATCHED BY SOURCE AND t.id > 30 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE AND t.m % 4 = 0 THEN UPDATE SET src = 'swept'""")
    assert(Snapshots.currentVersion(spark, t) === 5L) // ONE commit
    // ids 1-10 matched-updated; 31-40 deleted; 11-30 with m%4=0 swept
    val rows = spark.sql("SELECT id, src, m FROM gd.m5 ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._1) === (1L to 30L))
    assert(rows.filter(_._1 <= 10).forall(r => r._3 == r._1 + 1000))
    assert(rows.filter(r => r._1 > 10 && (r._1 * 2) % 4 == 0).forall(_._2 == "swept"))
    assert(rows.filter(r => r._1 > 10 && (r._1 * 2) % 4 != 0)
      .forall(r => r._2 == s"s${r._1 % 3}"))
    // first-applicable: a row >30 with m%4=0 was DELETED, never swept
    assert(!rows.exists(_._1 > 30))
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).isEmpty ===
      true) // every file held claimed rows here; see next test for pruning
  }

  test("MERGE BY SOURCE rewrites only files holding claimed rows") {
    val t = mk("m6")
    (1L to 10L).map(i => (i, "s", i)).toDF("id", "src", "m")
      .createOrReplaceTempView("m6_src")
    val before = Snapshots.liveFiles(spark, t).toSet
    // claims only ids 31-40: files 2 and 3 (ids 11-30) hold unmatched
    // rows but NO claimed ones — they must not rewrite
    spark.sql("""MERGE INTO gd.m6 t USING m6_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND t.id > 30 THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM gd.m6").as[Long].head() === 30L)
    val after = Snapshots.liveFiles(spark, t).toSet
    // file 1 (ids 1-10, all matched) and files 2-3 survive byte-identical
    assert((before intersect after).size === 3)
    // a BY SOURCE condition evaluating NULL claims nothing (three-valued)
    val v = Snapshots.currentVersion(spark, t)
    spark.sql("""MERGE INTO gd.m6 t USING m6_src s ON t.id = s.id
                 WHEN NOT MATCHED BY SOURCE AND t.m > t.m + NULL THEN DELETE""")
    assert(Snapshots.currentVersion(spark, t) === v) // provable no-op
  }

  test("concurrent SQL writers serialize through optimistic retry — no lost update") {
    val t = mk("c1")
    // two threads, five UPDATEs each, disjoint id ranges: every commit
    // races the other thread's and must re-derive + retry, never drop
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(1L, 21L).map { lo =>
      new Thread(() => {
        try (0 until 5).foreach { _ =>
          spark.sql(s"UPDATE gd.c1 SET m = m + 1 WHERE id BETWEEN $lo AND ${lo + 9}")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.asScala.map(_.getMessage).mkString("; "))
    // all ten commits landed (4 staged appends + 10 updates)
    assert(Snapshots.currentVersion(spark, t) === 14L)
    val got = spark.sql(
      "SELECT sum(m) AS s FROM gd.c1 WHERE id BETWEEN 1 AND 10 OR id BETWEEN 21 AND 30")
      .as[Long].head()
    val want = ((1L to 10L) ++ (21L to 30L)).map(_ * 2 + 5).sum
    assert(got === want, "every UPDATE survived the races")
  }

  test("refusals are loud and name the rewrite: dup keys, conditioned actions, subqueries") {
    mk("r1")
    Seq((11L, "a", 1L), (11L, "b", 2L)).toDF("id", "src", "m")
      .createOrReplaceTempView("r1_dup")
    val dup = intercept[Exception] {
      spark.sql("""MERGE INTO gd.r1 t USING r1_dup s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(dup.getMessage.contains("duplicate keys"), dup.getMessage)
    Seq((11L, "a", 1L)).toDF("id", "src", "m").createOrReplaceTempView("r1_one")
    // an UNCORRELATED scalar in SET works (evaluated once, literal)
    spark.sql("UPDATE gd.r1 SET m = (SELECT max(m) FROM r1_one) WHERE id = 1")
    assert(spark.sql("SELECT m FROM gd.r1 WHERE id = 1").as[Long].head() === 1L)
    // a correlated scalar whose correlation is NOT an equality refuses
    val sub = intercept[Exception] {
      spark.sql("""UPDATE gd.r1 t SET m =
                   (SELECT max(m) FROM r1_one s WHERE s.id < t.id)""")
    }
    assert(sub.getMessage.contains("equalit"), sub.getMessage)
  }

  test("DELETE WHERE id IN (subquery): semi-join rewrite, outer conjuncts prune and filter") {
    val t = mk("sq1")
    // subquery names keys 5,6,15,25,999 (999 absent); outer conjunct
    // m > 10 excludes id=5 (m=10) — and bounds the candidate set
    Seq(5L, 6L, 15L, 25L, 999L).toDF("k").createOrReplaceTempView("sq1_keys")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("DELETE FROM gd.sq1 WHERE id IN (SELECT k FROM sq1_keys) AND m > 10 AND id BETWEEN 1 AND 20")
    val ids = spark.sql("SELECT id FROM gd.sq1").as[Long].collect().toSet
    assert(!ids(6L) && !ids(15L))       // in list, cond holds
    assert(ids(5L))                     // m = 10 fails the plain conjunct
    assert(ids(25L))                    // excluded by id BETWEEN 1 AND 20
    assert(ids.size === 38)
    // the outer bound intersects candidates: files 3-4 untouched
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size >= 2)
    assert(Snapshots.currentVersion(spark, t) === 5L) // one commit
  }

  test("UPDATE WHERE id IN (subquery): assignments read old values, nulls in list ignored") {
    val t = mk("sq2")
    Seq(Some(7L), Some(33L), None).toDF("k").createOrReplaceTempView("sq2_keys")
    spark.sql("UPDATE gd.sq2 SET m = m + 1000 WHERE id IN (SELECT k FROM sq2_keys)")
    val m = spark.sql("SELECT id, m FROM gd.sq2").as[(Long, Long)].collect().toMap
    assert(m(7L) === 1014L && m(33L) === 1066L)
    assert(m(8L) === 16L) // untouched
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("MERGE clause algebra: conditioned DELETE + partial UPDATE + conditioned INSERT") {
    val t = mk("cw1")
    Seq((3L, "D", 0L), (5L, "U", 999L), (100L, "U", 7L), (200L, "D", 8L))
      .toDF("id", "op", "delta").createOrReplaceTempView("cw1_src")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("""MERGE INTO gd.cw1 t USING cw1_src s ON t.id = s.id
                 WHEN MATCHED AND s.op = 'D' THEN DELETE
                 WHEN MATCHED THEN UPDATE SET m = t.m + s.delta
                 WHEN NOT MATCHED AND s.op <> 'D' THEN
                   INSERT (id, src, m) VALUES (s.id, 'new', s.delta)""")
    val rows = spark.sql("SELECT id, src, m FROM gd.cw1")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!rows.contains(3L))                    // conditioned delete
    assert(rows(5L) === (("s2", 10L + 999L)))     // partial SET reads t and s
    assert(rows(100L) === (("new", 7L)))          // conditioned insert
    assert(!rows.contains(200L))                  // op='D' unmatched drops
    assert(rows(7L) === (("s1", 14L)))            // pass-through
    assert(rows.size === 40)
    // key-pruned CoW: ids 3,5 share file 1 — exactly one data file rewrote
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    // one commit; pre-merge version still time-travels
    assert(Snapshots.currentVersion(spark, t) === 5L)
    assert(spark.sql("SELECT count(*) AS c FROM gd.cw1 VERSION AS OF 4")
      .as[Long].head() === 40L)
  }

  test("MERGE clause precedence: first applicable matched clause wins") {
    mk("cw2")
    Seq((1L, 5L), (2L, 50L)).toDF("id", "x").createOrReplaceTempView("cw2_src")
    spark.sql("""MERGE INTO gd.cw2 t USING cw2_src s ON t.id = s.id
                 WHEN MATCHED AND s.x < 10 THEN UPDATE SET m = -1
                 WHEN MATCHED THEN UPDATE SET m = -2""")
    val m = spark.sql("SELECT id, m FROM gd.cw2 WHERE id <= 2")
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> -1L, 2L -> -2L))
  }

  test("MERGE conditioned star actions: UPDATE SET * / INSERT * under WHEN ... AND") {
    mk("cw3")
    Seq((4L, "up", 1000L), (4000L, "in", 2000L), (9L, "skip", 0L))
      .toDF("id", "src", "m").createOrReplaceTempView("cw3_src")
    spark.sql("""MERGE INTO gd.cw3 t USING cw3_src s ON t.id = s.id
                 WHEN MATCHED AND s.src = 'up' THEN UPDATE SET *
                 WHEN NOT MATCHED AND s.src = 'in' THEN INSERT *""")
    val rows = spark.sql("SELECT id, src, m FROM gd.cw3")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows(4L) === (("up", 1000L)))
    assert(rows(4000L) === (("in", 2000L)))
    assert(rows(9L) === (("s0", 18L))) // condition false: untouched
  }

  test("DELETE WHERE EXISTS (correlated equality): decorrelates to the semi-join rewrite") {
    val t = mk("ex1")
    Seq((6L, 1L), (15L, 1L), (16L, 0L), (999L, 1L)).toDF("k", "flag")
      .createOrReplaceTempView("ex1_src")
    spark.sql("""DELETE FROM gd.ex1
                 WHERE EXISTS (SELECT 1 FROM ex1_src s WHERE s.k = id AND s.flag = 1)""")
    val ids = spark.sql("SELECT id FROM gd.ex1").as[Long].collect().toSet
    assert(!ids(6L) && !ids(15L)) // correlated match, inner flag holds
    assert(ids(16L))              // inner predicate fails: survives
    assert(ids.size === 38)
    assert(Snapshots.currentVersion(spark, t) === 5L) // one commit
  }

  test("DELETE WHERE NOT EXISTS: anti-join rewrite keeps only matched keys") {
    val t = mk("nx1")
    // keep ids 1..10 and 21..30 (and a ghost key 999 matching nothing)
    ((1L to 10L) ++ (21L to 30L) :+ 999L).toDF("k")
      .createOrReplaceTempView("nx1_keys")
    spark.sql("""DELETE FROM gd.nx1
                 WHERE NOT EXISTS (SELECT 1 FROM nx1_keys s WHERE s.k = id)""")
    val ids = spark.sql("SELECT id FROM gd.nx1").as[Long].collect().toSet
    assert(ids === ((1L to 10L) ++ (21L to 30L)).toSet)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("UPDATE WHERE NOT EXISTS AND band: plain conjuncts gate rows and prune files") {
    val t = mk("nx2")
    (1L to 5L).toDF("k").createOrReplaceTempView("nx2_keys")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("""UPDATE gd.nx2 SET m = -1
                 WHERE NOT EXISTS (SELECT 1 FROM nx2_keys s WHERE s.k = id)
                   AND id BETWEEN 1 AND 10""")
    val m = spark.sql("SELECT id, m FROM gd.nx2").as[(Long, Long)].collect().toMap
    (1L to 5L).foreach(i => assert(m(i) === i * 2))   // matched: untouched
    (6L to 10L).foreach(i => assert(m(i) === -1L))    // unmatched in band
    (11L to 40L).foreach(i => assert(m(i) === i * 2)) // outside the band
    // the band bound pruned candidates: files 2-4 never rewritten
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("NOT IN: deletes unlisted keys; one NULL in the subquery voids the statement") {
    val t = mk("ni1")
    ((1L to 30L) :+ 999L).toDF("k").createOrReplaceTempView("ni1_keys")
    spark.sql("DELETE FROM gd.ni1 WHERE id NOT IN (SELECT k FROM ni1_keys)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.ni1").as[Long].head() === 30L)
    assert(Snapshots.currentVersion(spark, t) === 5L)
    // SQL three-valued rule: a NULL in the list makes NOT IN never TRUE
    ((1L to 5L).map(Option(_)) :+ Option.empty[Long]).toDF("k")
      .createOrReplaceTempView("ni1_null")
    spark.sql("DELETE FROM gd.ni1 WHERE id NOT IN (SELECT k FROM ni1_null)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.ni1").as[Long].head() === 30L)
    assert(Snapshots.currentVersion(spark, t) === 5L) // no-op: no commit
  }

  test("NOT IN null-key immunity vs NOT EXISTS null-key deletion") {
    val t = s"$root/nk1"
    Snapshots.commitAppend(
      Seq((Option(1L), 10L), (Option(2L), 20L), (Option.empty[Long], 30L))
        .toDF("id", "m").coalesce(1), t, recordSchema = true)
    Seq(1L).toDF("k").createOrReplaceTempView("nk1_keys")
    // NOT IN: null id is UNKNOWN, survives
    spark.sql("DELETE FROM gd.nk1 WHERE id NOT IN (SELECT k FROM nk1_keys)")
    assert(spark.sql("SELECT sum(m) AS s FROM gd.nk1").as[Long].head() === 40L)
    // NOT EXISTS: null id equality-matches nothing → unmatched → deleted
    spark.sql("""DELETE FROM gd.nk1
                 WHERE NOT EXISTS (SELECT 1 FROM nk1_keys s WHERE s.k = id)""")
    assert(spark.sql("SELECT sum(m) AS s FROM gd.nk1").as[Long].head() === 10L)
  }

  test("UPDATE swap semantics: every SET expression reads the OLD row") {
    val t = mk("sw1")
    spark.sql("UPDATE gd.sw1 SET m = id, id = m WHERE id = 5")
    // old row (id=5, m=10): SQL swaps — id becomes 10, m becomes 5
    val r = spark.sql("SELECT id, m FROM gd.sw1 WHERE m = 5")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((10L, 5L)), r.toString)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("anti-UPDATE multi-assignment reads old values too (simultaneous projection)") {
    val t = mk("sw2")
    Seq(1L).toDF("k").createOrReplaceTempView("sw2_keys")
    // unmatched rows (id != 1) in the band: m = id AND id = m must swap
    spark.sql("""UPDATE gd.sw2 SET m = id, id = m
                 WHERE NOT EXISTS (SELECT 1 FROM sw2_keys s WHERE s.k = id)
                   AND id = 7""")
    val r = spark.sql("SELECT id, m FROM gd.sw2 WHERE m = 7")
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((14L, 7L)), r.toString)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("NOT IN over an EMPTY subquery deletes every row, null keys included") {
    val t = s"$root/ni2"
    Snapshots.commitAppend(
      Seq((Option(1L), 1L), (Option.empty[Long], 2L)).toDF("id", "m").coalesce(1),
      t, recordSchema = true)
    spark.sql("DELETE FROM gd.ni2 WHERE id NOT IN (SELECT id FROM gd.ni2 WHERE 1 = 0)")
    // SQL: k NOT IN (empty set) is TRUE for EVERY row, even k IS NULL
    assert(spark.sql("SELECT count(*) AS n FROM gd.ni2").as[Long].head() === 0L)
  }

  test("governed columns refuse MERGE and UPDATE assignment (identity/generated)") {
    val r = java.nio.file.Files.createTempDirectory("graft_gov").toString
    spark.conf.set("spark.sql.catalog.gov", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gov.root", r)
    spark.sql("""CREATE TABLE gov.t (
      id BIGINT GENERATED ALWAYS AS IDENTITY, a BIGINT,
      b BIGINT GENERATED ALWAYS AS (a * 2))""")
    spark.sql("INSERT INTO gov.t (a) VALUES (1)")
    Seq((1L, 5L, 10L)).toDF("id", "a", "b").createOrReplaceTempView("gov_src")
    // star UPDATE expands to explicit assignments of the governed
    // columns — the clause-level guard refuses them by name
    val mg = intercept[Exception] {
      spark.sql("""MERGE INTO gov.t t USING gov_src s ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""") }
    assert(mg.getMessage.contains("engine-governed"), mg.getMessage)
    val ua = intercept[Exception] {
      spark.sql("UPDATE gov.t SET id = 99 WHERE a = 1") }
    assert(ua.getMessage.contains("engine-governed"), ua.getMessage)
    val ub = intercept[Exception] {
      spark.sql("UPDATE gov.t SET b = 99 WHERE a = 1") }
    assert(ub.getMessage.contains("engine-governed"), ub.getMessage)
    // updating a column a generation expression READS recomputes the
    // generated value from the NEW row (the Delta semantic), and the
    // identity survives the rewrite
    spark.sql("UPDATE gov.t SET a = 7 WHERE a = 1")
    assert(spark.sql("SELECT id, a, b FROM gov.t")
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 7L, 14L)))
    // the keyed (subquery) UPDATE path recomputes too
    Seq(1L).toDF("k").createOrReplaceTempView("gov_keys")
    spark.sql("UPDATE gov.t SET a = a + 1 WHERE id IN (SELECT k FROM gov_keys)")
    assert(spark.sql("SELECT a, b FROM gov.t")
      .as[(Long, Long)].collect().toSeq === Seq((8L, 16L)))
    // and the staged (tuple NOT IN) path
    Seq((0L, 0L)).toDF("x", "y").createOrReplaceTempView("gov_none")
    spark.sql("""UPDATE gov.t SET a = a + 1
                 WHERE (a, id) NOT IN (SELECT x, y FROM gov_none)""")
    assert(spark.sql("SELECT a, b FROM gov.t")
      .as[(Long, Long)].collect().toSeq === Seq((9L, 18L)))
  }

  test("IN-list DML derives a zone-map bound: point updates rewrite O(overlapping files)") {
    val t = mk("in1")
    val before = Snapshots.liveFiles(spark, t).toSet
    spark.sql("UPDATE gd.in1 SET m = -1 WHERE id IN (12, 15, 18)")
    // all three keys live in file 2 (ids 11-20): files 1/3/4 untouched
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    assert(spark.sql("SELECT sum(m) AS s FROM gd.in1 WHERE id IN (12, 15, 18)")
      .as[Long].head() === -3L)
    spark.sql("DELETE FROM gd.in1 WHERE id IN (31, 40)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.in1").as[Long].head() === 38L)
  }

  test("scalar subqueries in SET and WHERE: evaluate once, substitute as literals") {
    val t = mk("sc1")
    Seq(100L, 200L).toDF("v").createOrReplaceTempView("sc1_scalars")
    // SET from an uncorrelated scalar; WHERE compares against another
    spark.sql("""UPDATE gd.sc1
                 SET m = (SELECT max(v) FROM sc1_scalars)
                 WHERE id <= (SELECT count(*) FROM sc1_scalars)""")
    val m = spark.sql("SELECT id, m FROM gd.sc1 WHERE id <= 4")
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 200L, 2L -> 200L, 3L -> 6L, 4L -> 8L))
    // DELETE with a scalar threshold
    spark.sql("DELETE FROM gd.sc1 WHERE m > (SELECT min(v) FROM sc1_scalars)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.sc1").as[Long].head() === 38L)
    // empty scalar yields NULL → predicate UNKNOWN → no rows deleted
    spark.sql("DELETE FROM gd.sc1 WHERE m > (SELECT v FROM sc1_scalars WHERE v > 999)")
    assert(spark.sql("SELECT count(*) AS n FROM gd.sc1").as[Long].head() === 38L)
    // >1 row errors (the SQL scalar contract)
    val e = intercept[Exception] {
      spark.sql("UPDATE gd.sc1 SET m = (SELECT v FROM sc1_scalars) WHERE id = 3") }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
  }

  test("tuple NOT IN auto-materializes (conf-gated); non-equality correlation refuses") {
    mk("rf2")
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("rf2_src")
    // with the fallback disabled, the old refusal stands
    spark.conf.set("spark.sql.graft.dml.materializeSubqueries", "false")
    try {
      val tup = intercept[Exception] {
        spark.sql("DELETE FROM gd.rf2 WHERE (id, m) NOT IN (SELECT a, b FROM rf2_src)")
      }
      assert(tup.getMessage.contains("NOT IN"), tup.getMessage)
    } finally
      spark.conf.set("spark.sql.graft.dml.materializeSubqueries", "true")
    // with it on (default): stage + evaluate in place — Spark's own
    // null-aware tuple semantics. Row (1, m=2) matches (1, 2) → survives
    // the NOT IN; every other row deletes.
    spark.sql("DELETE FROM gd.rf2 WHERE (id, m) NOT IN (SELECT a, b FROM rf2_src)")
    assert(spark.sql("SELECT id, m FROM gd.rf2").as[(Long, Long)]
      .collect().toSeq === Seq((1L, 2L)))
    // non-equality-correlated EXISTS now stages via the transplant —
    // refusal only remains behind the conf gate (and for shapes the
    // transplant can't re-bind, pinned in the range-correlated test)
    val t2 = mk("rf3")
    spark.conf.set("spark.sql.graft.dml.materializeSubqueries", "false")
    try {
      val ineq = intercept[Exception] {
        spark.sql("DELETE FROM gd.rf3 WHERE EXISTS (SELECT 1 FROM rf2_src s WHERE s.a < id)")
      }
      assert(ineq.getMessage.contains("materialize"), ineq.getMessage)
    } finally
      spark.conf.set("spark.sql.graft.dml.materializeSubqueries", "true")
    // s.a = 1: every id > 1 has a witness and deletes; id = 1 survives
    spark.sql("DELETE FROM gd.rf3 WHERE EXISTS (SELECT 1 FROM rf2_src s WHERE s.a < id)")
    assert(spark.sql("SELECT id FROM gd.rf3").as[Long].collect().toSeq === Seq(1L))
  }

  test("multi-subquery conjuncts compose: IN + NOT EXISTS in one DML WHERE") {
    val t = mk("mc1")
    Seq(5L, 15L, 25L).toDF("k").createOrReplaceTempView("mc1_in")
    Seq(15L).toDF("k2").createOrReplaceTempView("mc1_ex")
    val before = Snapshots.liveFiles(spark, t).toSet
    // semi AND anti in one statement: ids in {5,15,25} minus {15} delete
    spark.sql("""DELETE FROM gd.mc1 WHERE id IN (SELECT k FROM mc1_in)
                 AND NOT EXISTS (SELECT 1 FROM mc1_ex e WHERE e.k2 = id)""")
    val ids = spark.sql("SELECT id FROM gd.mc1").as[Long].collect().toSet
    assert(ids === ((1L to 40L).toSet -- Set(5L, 25L)))
    // the first semi gate's key range pruned candidates: ids 5..25 span
    // files 1-3, file 4 (31-40) stayed byte-identical
    assert(Snapshots.liveFiles(spark, t).toSet.intersect(before).size >= 1)
    // UPDATE with IN + NOT IN + a plain band; the band bounds the rewrite
    Seq(3L, 7L, 33L).toDF("k").createOrReplaceTempView("mc1_in2")
    Seq(7L).toDF("k2").createOrReplaceTempView("mc1_ex2")
    val live2 = Snapshots.liveFiles(spark, t).toSet
    spark.sql("""UPDATE gd.mc1 SET m = -1 WHERE id IN (SELECT k FROM mc1_in2)
                 AND id NOT IN (SELECT k2 FROM mc1_ex2) AND id <= 10""")
    val neg = spark.sql("SELECT id FROM gd.mc1 WHERE m = -1").as[Long]
      .collect().toSet
    assert(neg === Set(3L)) // 7 blocked by NOT IN, 33 blocked by the band
    // only the file holding ids 1-10 rewrote
    assert(Snapshots.liveFiles(spark, t).toSet.intersect(live2).size ===
      live2.size - 1)
  }

  test("multi-conjunct NOT IN: a null in its subquery voids the whole statement") {
    val t = mk("mc2")
    Seq(5L, 6L).toDF("k").createOrReplaceTempView("mc2_in")
    Seq(Some(6L), None).toDF("k2").createOrReplaceTempView("mc2_null")
    val v = Snapshots.currentVersion(spark, t)
    // the NOT IN conjunct is never TRUE under a null source value, so the
    // ANDed statement mutates nothing — three-valued logic survives
    // composition
    spark.sql("""DELETE FROM gd.mc2 WHERE id IN (SELECT k FROM mc2_in)
                 AND id NOT IN (SELECT k2 FROM mc2_null)""")
    assert(Snapshots.currentVersion(spark, t) === v)
    assert(spark.sql("SELECT count(*) AS n FROM gd.mc2").as[Long].head() === 40L)
  }

  test("UPDATE SET correlated scalar: per-key aggregate, empty-input value for unmatched") {
    // nullable m: an unmatched key's scalar is NULL, and assigning NULL to
    // a non-nullable column correctly errors (alignment AssertNotNull) —
    // so this table declares m nullable
    val t = s"$root/cs1"
    Snapshots.commitAppend(
      (1L to 40L).map(x => (x, x * 2L)).toDF("id", "m")
        .select(col("id"), when(col("m") > 0L, col("m")).as("m"))
        .coalesce(1), t, recordSchema = true, statsCols = Seq("id"))
    Seq((1L, 10L), (1L, 20L), (3L, 7L)).toDF("k", "v")
      .createOrReplaceTempView("cs1_src")
    // max: unmatched keys get NULL (scalar-over-empty)
    spark.sql("""UPDATE gd.cs1 SET m = (SELECT max(v) FROM cs1_src s WHERE s.k = id)
                 WHERE id <= 3""")
    val got = spark.sql("SELECT id, m FROM gd.cs1 WHERE id <= 3 ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, Some(20L)), (2L, None), (3L, Some(7L))), got.toString)
    // rows outside the WHERE untouched
    assert(spark.sql("SELECT m FROM gd.cs1 WHERE id = 4").as[Long].head() === 8L)
    // count: unmatched keys get 0, not NULL (the classic COUNT bug —
    // handled by evaluating the aggregate over empty input, not a list)
    spark.sql("""UPDATE gd.cs1 SET m = (SELECT count(*) FROM cs1_src s WHERE s.k = id)
                 WHERE id <= 3""")
    val got2 = spark.sql("SELECT id, m FROM gd.cs1 WHERE id <= 3 ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got2 === Seq((1L, 2L), (2L, 0L), (3L, 1L)), got2.toString)
    // non-aggregate correlated scalar: >1 row per key errors (SQL rule)
    val e = intercept[Exception] {
      spark.sql("""UPDATE gd.cs1 SET m = (SELECT v FROM cs1_src s WHERE s.k = id)
                   WHERE id <= 3""")
    }
    assert(e.getMessage.contains("more than one row"), e.getMessage)
    // …but a key-unique non-aggregate form works
    Seq((2L, 99L)).toDF("k", "v").createOrReplaceTempView("cs1_uni")
    spark.sql("""UPDATE gd.cs1 SET m = (SELECT v FROM cs1_uni s WHERE s.k = id)
                 WHERE id IN (2, 3)""")
    val got3 = spark.sql("SELECT id, m FROM gd.cs1 WHERE id <= 3 ORDER BY id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got3 === Seq((1L, Some(2L)), (2L, Some(99L)), (3L, None)), got3.toString)
  }

  test("staged fallback: OR-nested subquery conjuncts evaluate in place") {
    val t = mk("sg1")
    Seq(5L).toDF("k").createOrReplaceTempView("sg1_in")
    spark.sql("DELETE FROM gd.sg1 WHERE id IN (SELECT k FROM sg1_in) OR id = 35")
    val ids = spark.sql("SELECT id FROM gd.sg1").as[Long].collect().toSet
    assert(ids === ((1L to 40L).toSet -- Set(5L, 35L)))
    // staged UPDATE: matched rows take the SET, null/false rows pass through
    spark.sql("""UPDATE gd.sg1 SET m = 0
                 WHERE id IN (SELECT k + 1 FROM sg1_in) OR id > 38""")
    val zeros = spark.sql("SELECT id FROM gd.sg1 WHERE m = 0").as[Long]
      .collect().toSet
    assert(zeros === Set(6L, 39L, 40L))
    assert(spark.sql("SELECT sum(m) AS s FROM gd.sg1").as[Long].head() ===
      ((1L to 40L).toSet -- Set(5L, 35L, 6L, 39L, 40L)).map(_ * 2).sum)
  }

  test("UPDATE may assign the column its own IN-subquery keys on (gate-chain re-route)") {
    val t = mk("ka1")
    // `SET a = a + 1 WHERE a IN (SELECT …)` is valid SQL: membership
    // reads the OLD row; the keyed-merge rewrite can't assign its key,
    // so the statement re-routes through the mutateKeyed gate chain
    Seq(24L, 44L).toDF("k").createOrReplaceTempView("ka1_keys")
    spark.sql("UPDATE gd.ka1 SET m = m + 1, id = id + 100 WHERE id IN (SELECT k FROM ka1_keys)")
    val got = spark.sql("SELECT id, m FROM gd.ka1 WHERE id > 100 OR id = 24")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((124L, 49L)), got.toString) // id 24: m 48->49, id +100
    assert(spark.sql("SELECT count(*) FROM gd.ka1").as[Long].head() === 40L)
    // anti (NOT IN) key assignment always worked (mutateAnti)
    spark.sql("""UPDATE gd.ka1 SET id = id + 1000
                 WHERE id NOT IN (SELECT id FROM gd.ka1 WHERE id <= 40)""")
    assert(spark.sql("SELECT id FROM gd.ka1 WHERE id > 1000").as[Long]
      .collect().toSeq === Seq(1124L))
    // correlated EXISTS + key assignment re-routes the same way
    Seq(33L).toDF("k").createOrReplaceTempView("ka1_keys2")
    spark.sql("""UPDATE gd.ka1 t SET id = id + 2000
                 WHERE EXISTS (SELECT 1 FROM ka1_keys2 s WHERE s.k = t.id)""")
    assert(spark.sql("SELECT id FROM gd.ka1 WHERE id > 2000").as[Long]
      .collect().toSeq === Seq(2033L))
  }

  test("staged tuple NOT IN: exact three-valued nulls on BOTH sides, hash-join decomposed") {
    // the decomposition (GraftStager.decompose) must reproduce SQL's
    // tuple semantics exactly: a row deletes iff for EVERY subquery row
    // some column pair is non-null on both sides and differs
    val t = s"$root/sg2"
    Snapshots.commitAppend(Seq(
      (1L, Option(1L), Option(1L)),  // exact match       -> IN TRUE  -> keep
      (2L, None, Option(5L)),        // possEq (2,null)   -> UNKNOWN  -> keep
      (3L, Option(2L), Option(9L)),  // possEq (2,null)   -> UNKNOWN  -> keep
      (4L, None, Option(6L)),        // possEq (null,6)   -> UNKNOWN  -> keep
      (5L, Option(3L), None),        // possEq (null,6)   -> UNKNOWN  -> keep
      (6L, Option(7L), Option(7L)))  // differs everywhere -> NOT IN TRUE -> delete
      .toDF("id", "a", "b").coalesce(1), t, recordSchema = true)
    Seq((Option(1L), Option(1L)), (Option.empty[Long], Option(6L)),
      (Option(2L), Option.empty[Long]))
      .toDF("a", "b").createOrReplaceTempView("sg2_s")
    spark.sql("DELETE FROM gd.sg2 WHERE (a, b) NOT IN (SELECT a, b FROM sg2_s)")
    assert(spark.sql("SELECT id FROM gd.sg2").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
    // (the hash-join SHAPE and its cost law are pinned by ProbeStaged:
    // 790 s -> 5.9 s at sf10; here we pin the semantics)
  }

  test("range-correlated EXISTS stages: transplanted into the candidate reads") {
    val t = mk("rc1")
    // intervals: [10, 14] and [30, 33]; rows whose id falls inside one
    // (after scaling) delete. Non-equality correlation: id BETWEEN lo AND hi.
    Seq((10L, 14L), (30L, 33L)).toDF("lo", "hi").createOrReplaceTempView("rc1_iv")
    spark.sql("""DELETE FROM gd.rc1 t
                 WHERE EXISTS (SELECT 1 FROM rc1_iv v
                               WHERE t.id BETWEEN v.lo AND v.hi)""")
    assert(spark.sql("SELECT id FROM gd.rc1").as[Long].collect().toSet ===
      ((1L to 40L).toSet -- (10L to 14L) -- (30L to 33L)))
    // NOT EXISTS twin with an extra band conjunct: update ids 20..25 NOT
    // covered by any interval
    spark.sql("""UPDATE gd.rc1 t SET m = -1
                 WHERE NOT EXISTS (SELECT 1 FROM rc1_iv v
                                   WHERE t.id BETWEEN v.lo AND v.hi)
                   AND id BETWEEN 20 AND 25""")
    assert(spark.sql("SELECT count(*) AS n FROM gd.rc1 WHERE m = -1")
      .as[Long].head() === 6L)
    // a shadowed outer name still refuses (the transplant would capture)
    Seq((1L, 2L)).toDF("id", "hi").createOrReplaceTempView("rc1_bad")
    val e = intercept[Exception] {
      spark.sql("""DELETE FROM gd.rc1 t
                   WHERE EXISTS (SELECT 1 FROM rc1_bad v
                                 WHERE t.id > v.hi AND t.m > v.id)""")
    }
    assert(e.getMessage.contains("materialize the subquery") ||
      e.getMessage.contains("no sound mapping"), e.getMessage)
  }

  // ---- join-DML: UPDATE … FROM / DELETE … USING (GraftJoinDml +
  // GraftDmlRule.joinShapeDml → one mutateKeyed gate chain) ----

  test("UPDATE … FROM: cross-name key, source+target residuals, one commit, pruned files") {
    val t = mk("jf1")
    Seq((11L, 1000L, "U"), (12L, 2000L, "D"), (31L, 3000L, "U"))
      .toDF("k", "v", "op").createOrReplaceTempView("jf1_src")
    val before = Snapshots.liveFiles(spark, t).toSet
    // only id=11 qualifies: 12 fails s.op='U', 31 fails the target band
    spark.sql("""UPDATE gd.jf1 SET m = s.v + m
                 FROM jf1_src s
                 WHERE id = s.k AND s.op = 'U' AND id BETWEEN 11 AND 20""")
    assert(Snapshots.currentVersion(spark, t) === 5L) // ONE commit
    // the target band zone-map-prunes: three of four files untouched
    assert((before intersect Snapshots.liveFiles(spark, t).toSet).size === 3)
    val want = (1L to 40L).map(x => if (x == 11) 1000L + x * 2 else x * 2).sum
    assert(spark.sql("SELECT sum(m) AS s FROM gd.jf1").as[Long].head() === want)
  }

  test("DELETE … USING: semi-join delete; multi-match is harmless for DELETE") {
    val t = mk("jd1")
    // duplicate source keys: deleting a row matched twice is unambiguous
    Seq((5L, "a"), (5L, "b"), (17L, "a"), (99L, "a"))
      .toDF("k", "tag").createOrReplaceTempView("jd1_src")
    spark.sql("DELETE FROM gd.jd1 USING jd1_src s WHERE id = s.k")
    assert(spark.sql("SELECT count(*) AS n FROM gd.jd1").as[Long].head() === 38L)
    assert(spark.sql("SELECT count(*) AS n FROM gd.jd1 WHERE id IN (5, 17)")
      .as[Long].head() === 0L)
    assert(Snapshots.currentVersion(spark, t) === 5L)
  }

  test("UPDATE … FROM: ambiguous source match (two rows feed one SET) errors") {
    mk("jf2")
    Seq((5L, 10L), (5L, 20L)).toDF("k", "v").createOrReplaceTempView("jf2_src")
    val e = intercept[Exception] {
      spark.sql("UPDATE gd.jf2 SET m = s.v FROM jf2_src s WHERE id = s.k")
    }
    assert(e.getMessage.contains("ambiguous source match"))
    // …but the same multi-match with a SET that reads no source column is
    // unambiguous and applies once
    spark.sql("UPDATE gd.jf2 SET m = -1 FROM jf2_src s WHERE id = s.k")
    assert(spark.sql("SELECT m FROM gd.jf2 WHERE id = 5").as[Long].head() === -1L)
  }

  test("join-DML refusals: mixed residual, missing WHERE, no key equality") {
    mk("jf3")
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("jf3_src")
    val mixed = intercept[Exception] {
      spark.sql("DELETE FROM gd.jf3 USING jf3_src s WHERE id = s.k AND m > s.v")
    }
    assert(mixed.getMessage.contains("mixed target×source conjunct"))
    val noWhere = intercept[Exception] {
      spark.sql("UPDATE gd.jf3 SET m = 0 FROM jf3_src s")
    }
    assert(noWhere.getMessage.contains("requires a WHERE"))
    val noKey = intercept[Exception] {
      spark.sql("DELETE FROM gd.jf3 USING jf3_src s WHERE m > 100 AND s.v < 5")
    }
    assert(noKey.getMessage.contains("column equality join key"))
    // a garbage statement still surfaces the PARSER's error, not ours
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("UPDATE gd.jf3 GARBAGE HERE")
    }
  }

  test("UPDATE … FROM: subquery source with alias; matched-only MERGE widens too") {
    val t = mk("jf4")
    Seq((21L, 7L, true), (22L, 8L, false))
      .toDF("key", "delta", "keep").createOrReplaceTempView("jf4_src")
    spark.sql("""UPDATE gd.jf4 SET m = m + s.d
                 FROM (SELECT key AS kk, delta AS d FROM jf4_src WHERE keep) s
                 WHERE id = s.kk""")
    assert(spark.sql("SELECT m FROM gd.jf4 WHERE id = 21").as[Long].head() === 49L)
    assert(spark.sql("SELECT m FROM gd.jf4 WHERE id = 22").as[Long].head() === 44L)
    // hand-written matched-only MERGE with a cross-name ON + residual now
    // routes through the same gate chain instead of refusing
    spark.sql("""MERGE INTO gd.jf4 t USING jf4_src s ON t.id = s.key AND s.keep
                 WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) AS n FROM gd.jf4 WHERE id = 21")
      .as[Long].head() === 0L)
    assert(spark.sql("SELECT count(*) AS n FROM gd.jf4").as[Long].head() === 39L)
    assert(Snapshots.currentVersion(spark, t) === 6L)
  }
}
