package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** GraftCatalog: the whole snapshot layer reachable from spark.sql —
  * current reads, VERSION AS OF (number and tag), TIMESTAMP AS OF,
  * deletion-vector resolution, and predicate pushdown that turns SQL
  * filters into manifest file pruning (zone maps + bloom sidecars).
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", r)
    r
  }

  private def mkSliced(name: String, slices: Int = 4): String = {
    val t = s"$root/$name"
    (0 until slices).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, s"s${x % 3}", x * 2L))
          .toDF("id", "src", "m").coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"))
    }
    t
  }

  test("SELECT over the catalog reads the current snapshot; columns prune") {
    mkSliced("t1")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t1").as[Long].head() === 40L)
    assert(spark.sql("SELECT sum(m) AS s FROM graft.t1").as[Long].head() ===
      (1L to 40L).map(_ * 2).sum)
    // a single-column projection carries only that column across the scan
    assert(spark.sql("SELECT id FROM graft.t1 ORDER BY id LIMIT 3")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
  }

  test("VERSION AS OF: by number and by tag; TIMESTAMP AS OF by instant") {
    val t = mkSliced("t2")
    Snapshots.tag(spark, t, "first-two", Some(2L))
    val ts = System.currentTimeMillis()
    Thread.sleep(2)
    Snapshots.commitAppend(Seq((99L, "s9", 0L)).toDF("id", "src", "m").coalesce(1), t)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t2").as[Long].head() === 41L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t2 VERSION AS OF 2")
      .as[Long].head() === 20L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t2 VERSION AS OF 'first-two'")
      .as[Long].head() === 20L)
    val iso = new java.sql.Timestamp(ts).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft.t2 TIMESTAMP AS OF '$iso'")
      .as[Long].head() === 40L)
  }

  test("WHERE predicates prune files via zone maps; results stay exact") {
    mkSliced("t3")
    GraftScanInfo.last = None
    val rows = spark.sql(
      "SELECT id, m FROM graft.t3 WHERE id BETWEEN 15 AND 18 ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(rows === (15L to 18L).map(x => (x, x * 2)))
    val info = GraftScanInfo.last.get
    assert(info.total === 4 && info.candidates === 1,
      s"expected 1 of 4 files kept, got $info")
    // one-sided comparison prunes too (zone-map ranges can't express it,
    // statCompare can)
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM graft.t3 WHERE id > 30")
      .as[Long].head() === 10L)
    assert(GraftScanInfo.last.get.candidates === 1)
    // the pushed filters are visible in the physical plan
    val plan = spark.sql("SELECT id FROM graft.t3 WHERE id = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
  }

  test("point lookups prune through the bloom sidecar index") {
    val t = s"$root/t4"
    (0 until 8).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10)
          .map(x => (x.toLong, s"k${x * 7919 % 997}")).toDF("id", "ukey").coalesce(1),
        t, recordSchema = true)
    }
    Snapshots.buildBloomIndex(spark, t, "ukey", fpp = 0.001)
    GraftScanInfo.last = None
    val got = spark.sql(s"SELECT id FROM graft.t4 WHERE ukey = 'k${33 * 7919 % 997}'")
      .as[Long].collect().toSeq
    assert(got === Seq(33L))
    val info = GraftScanInfo.last.get
    assert(info.candidates <= 2, s"bloom should keep ~1 of 8 files: $info")
    assert(info.total === 8)
  }

  test("deletion vectors resolve in SQL reads; time travel sees pre-delete state") {
    val t = mkSliced("t5")
    Snapshots.deleteWhereMor(spark, t, col("id") === 5L, keys = Seq("id"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.t5").as[Long].head() === 39L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t5 WHERE id = 5")
      .as[Long].head() === 0L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t5 VERSION AS OF 4")
      .as[Long].head() === 40L)
  }

  test("CALL graft.system.*: the maintenance surface runs from SQL") {
    val t = s"$root/t7"
    (0 until 8).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10)
          .map(x => (x.toLong, s"k${x * 7919 % 997}", (x % 4).toLong))
          .toDF("id", "ukey", "b").coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"), recordRowCounts = true)
    }
    def one(sql: String) = spark.sql(sql).collect().head
    assert(one("CALL graft.system.fast_count('t7')").getLong(0) === 80L)
    val bi = one("CALL graft.system.bloom_index('t7', 'ukey', 0.001)")
    assert(bi.getLong(1) === 8L) // indexed
    val opt = one("CALL graft.system.optimize('t7', 'id,b', 4)")
    assert(opt.getLong(1) === 8L && opt.getLong(2) === 4L)
    // the OPTIMIZE commit refreshed the bloom index: a SQL point lookup
    // on the rewritten layout still prunes files
    GraftScanInfo.last = None
    assert(spark.sql(s"SELECT id FROM graft.t7 WHERE ukey = 'k${33 * 7919 % 997}'")
      .as[Long].collect().toSeq === Seq(33L))
    assert(GraftScanInfo.last.get.candidates <= 2)
    val v = Snapshots.currentVersion(spark, t)
    assert(one(s"CALL graft.system.tag('t7', 'keep', $v)").getLong(0) === v)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t7 VERSION AS OF 'keep'")
      .as[Long].head() === 80L)
    assert(one("CALL graft.system.checkpoint('t7')").getLong(0) === v)
    val exp = one(s"CALL graft.system.expire('t7', $v)")
    assert(exp.getLong(1) === v && exp.getLong(0) === v - 1)
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.t7 VERSION AS OF 1").collect()
    }
    assert(one("CALL graft.system.vacuum('t7')").getLong(0) >= 8L)
    assert(one("CALL graft.system.fast_count('t7')").getLong(0) === 80L)
    intercept[Exception] { spark.sql("CALL graft.system.no_such('t7')").collect() }
  }

  test("INSERT INTO appends one commit; INSERT OVERWRITE swaps under snapshot isolation") {
    val t = s"$root/t8"
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s").coalesce(1), t,
      recordSchema = true)
    spark.sql("INSERT INTO graft.t8 VALUES (2, 'b'), (3, 'c')")
    assert(Snapshots.currentVersion(spark, t) === 2L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t8").as[Long].head() === 3L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t8 VERSION AS OF 1")
      .as[Long].head() === 1L)
    // self-referencing overwrite: the read pins the pre-write snapshot
    // (new files written before the swap commit), so this is well-defined
    spark.sql("INSERT OVERWRITE graft.t8 SELECT id * 10, s FROM graft.t8")
    assert(spark.sql("SELECT id FROM graft.t8 ORDER BY id")
      .as[Long].collect().toSeq === Seq(10L, 20L, 30L))
    // pre-overwrite versions still time-travel (swap, not delete)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t8 VERSION AS OF 2")
      .as[Long].head() === 3L)
  }

  test("bare COUNT(*) pushes down to manifest fastCount; filtered counts scan") {
    val t = s"$root/t9"
    (0 until 2).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, x % 3)).toDF("id", "g")
          .coalesce(1),
        t, recordSchema = true, recordRowCounts = true)
    }
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM graft.t9").as[Long].head() === 20L)
    assert(GraftScanInfo.last.get.pushed === Seq("COUNT(*) -> fastCount"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.t9 VERSION AS OF 1")
      .as[Long].head() === 10L)
    // a WHERE keeps the ordinary scan path (filters re-evaluate exactly)
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM graft.t9 WHERE id > 15")
      .as[Long].head() === 5L)
    assert(!GraftScanInfo.last.get.pushed.contains("COUNT(*) -> fastCount"))
    // LIMIT folds into the wrapped scan and stays exact
    assert(spark.sql("SELECT id FROM graft.t9 LIMIT 3").count() === 3L)
  }

  test("metadata tables: t$history / t$files / t$tags / t$detail answer from manifests") {
    val t = mkSliced("t10")
    Snapshots.deleteWhereMor(spark, t, col("id") === 5L, keys = Seq("id"))
    Snapshots.tag(spark, t, "gold", Some(2L))
    val hist = spark.sql("SELECT version, adds, dv_adds FROM graft.`t10$history` ORDER BY version")
      .as[(Long, Int, Int)].collect().toSeq
    assert(hist.size === 5 && hist.take(4).forall(h => h._2 === 1 && h._3 === 0))
    assert(hist.last === ((5L, 0, 1))) // the MoR delete: dv-only commit
    assert(spark.sql("SELECT count(*) AS n FROM graft.`t10$files`").as[Long].head() === 4L)
    assert(spark.sql("SELECT sum(bytes) AS b FROM graft.`t10$files`").as[Long].head() > 0L)
    assert(spark.sql("SELECT name, version FROM graft.`t10$tags`")
      .as[(String, Long)].collect().toSeq === Seq(("gold", 2L)))
    val d = spark.sql("SELECT version, files, dv_keys, schema_recorded FROM graft.`t10$detail`")
      .as[(Long, Int, Long, Boolean)].head()
    assert(d === ((5L, 4, 1L, true)))
    // t$stats: one row per live (file, column) zone map; `id` covers all
    // 4 live files with true bounds, reserved __bytes rows are flagged
    val idStats = spark.sql(
      "SELECT path, min, max FROM graft.`t10$stats` WHERE column = 'id' AND NOT reserved")
      .as[(String, String, String)].collect().toSeq
    assert(idStats.size === 4)
    assert(idStats.map(_._2.toLong).min === 1L && idStats.map(_._3.toLong).max === 40L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.`t10$stats` WHERE column = '__bytes' AND reserved")
      .as[Long].head() === 4L)
  }

  test("TRUNCATE TABLE: one transactional commit, history time-travels") {
    val t = mkSliced("t19")
    spark.sql("TRUNCATE TABLE graft.t19")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t19").as[Long].head() === 0L)
    // one commit, not a directory wipe: pre-truncate state still reads
    assert(Snapshots.currentVersion(spark, t) === 5L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t19 VERSION AS OF 4")
      .as[Long].head() === 40L)
    spark.sql("INSERT INTO graft.t19 VALUES (1, 's0', 2)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t19").as[Long].head() === 1L)
  }

  test("CALL maintain: binpack + verified checkpoint + vacuum as one sweep") {
    val t = mkSliced("t18")
    val r = spark.sql("CALL graft.system.maintain('t18')").collect().head
    assert(r.getLong(1) === 4L, "four small slice files binpack")
    assert(r.getLong(3) === 0L, "expiry is opt-in (keep_days=0 skips)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t18").as[Long].head() === 40L)
    assert(Snapshots.currentVersion(spark, t) === 5L) // 4 appends + binpack
    // history intact: the sweep never expired anything
    assert(spark.sql("SELECT count(*) AS n FROM graft.t18 VERSION AS OF 2")
      .as[Long].head() === 20L)
  }

  test("CREATE TABLE and CTAS: schema-stamped empty v1, then transactional appends") {
    spark.sql("CREATE TABLE graft.t11 (id BIGINT, s STRING)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t11").as[Long].head() === 0L)
    spark.sql("INSERT INTO graft.t11 VALUES (1, 'a'), (2, 'b')")
    spark.sql("CREATE TABLE graft.t12 AS SELECT id * 10 AS id, s FROM graft.t11")
    assert(spark.sql("SELECT id FROM graft.t12 ORDER BY id")
      .as[Long].collect().toSeq === Seq(10L, 20L))
    // the CTAS table is an ordinary snapshot table: schema recorded,
    // version history live
    assert(Snapshots.tableSchema(spark, s"$root/t12").isDefined)
    intercept[Exception] { spark.sql("CREATE TABLE graft.t11 (x BIGINT)") }
    // identity PARTITIONED BY is write clustering now (GraftClusterSpec);
    // hash buckets stay refused — zone maps cannot prune them
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.t13 (x BIGINT) PARTITIONED BY (bucket(8, x))")
    }
  }

  test("DELETE FROM graft.t WHERE …: copy-on-write transactional delete from SQL") {
    val t = mkSliced("t14")
    val vBefore = Snapshots.currentVersion(spark, t)
    spark.sql("DELETE FROM graft.t14 WHERE id BETWEEN 11 AND 20")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t14").as[Long].head() === 30L)
    assert(spark.sql("SELECT count(*) AS n FROM graft.t14 WHERE id = 15")
      .as[Long].head() === 0L)
    // one new version; pre-delete state keeps time traveling
    assert(Snapshots.currentVersion(spark, t) === vBefore + 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.t14 VERSION AS OF $vBefore")
      .as[Long].head() === 40L)
    // NULL-predicate semantics hold through SQL (rows with NULL cond stay)
    spark.sql("DELETE FROM graft.t14 WHERE id > 35 AND src = 's1'")
    assert(spark.sql("SELECT count(*) AS n FROM graft.t14").as[Long].head() ===
      30L - spark.sql(
        s"SELECT count(*) AS n FROM graft.t14 VERSION AS OF ${vBefore + 1} " +
          "WHERE id > 35 AND src = 's1'").as[Long].head())
  }

  test("nested namespaces map to directories; DROP works there; unknown table rejects") {
    val t = s"$root/ns/t6"
    Snapshots.commitAppend(Seq((1L, "a")).toDF("id", "s").coalesce(1), t,
      recordSchema = true)
    assert(spark.sql("SELECT count(*) AS n FROM graft.ns.t6").as[Long].head() === 1L)
    intercept[Exception] { spark.sql("SELECT * FROM graft.no_such").collect() }
    // a racing writer's commit is invisible to an already-analyzed query
    // (version pinned at load) but a fresh query sees it
    Snapshots.commitAppend(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    assert(spark.sql("SELECT count(*) AS n FROM graft.ns.t6").as[Long].head() === 2L)
    // DROP TABLE resolves through nested namespaces too
    spark.sql("DROP TABLE graft.ns.t6")
    assert(!new java.io.File(t).exists())
    intercept[Exception] { spark.sql("SELECT * FROM graft.ns.t6").collect() }
  }

  test("VERSION AS OF resolves tags BEFORE version numbers; bad refs reject") {
    val t = mkSliced("t15") // versions 1..4, 10 rows each
    // a tag legitimately named '2' (tag() imposes no naming rule) pinned
    // to version 1 — the ref must win over version 2, or the query would
    // silently read the wrong snapshot (Iceberg ref-before-snapshot-id)
    Snapshots.tag(spark, t, "2", Some(1L))
    assert(spark.sql("SELECT count(*) AS n FROM graft.t15 VERSION AS OF '2'")
      .as[Long].head() === 10L)
    // numbers not shadowed by a tag still resolve as versions
    assert(spark.sql("SELECT count(*) AS n FROM graft.t15 VERSION AS OF 3")
      .as[Long].head() === 30L)
    // empty and unknown refs reject with a real error, not NumberFormat
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.t15 VERSION AS OF ''").collect() }
    intercept[Exception] {
      spark.sql("SELECT * FROM graft.t15 VERSION AS OF 'no-such-ref'").collect() }
  }

  test("session-pinned cuts: SQL reads resolve at the published cut, never mixed") {
    import graft.io.MultiTable
    val data = s"$root/cut_data"
    val idx = s"$root/cut_idx"
    def slice(a: Int, b: Int) = (a to b).map(x => (x.toLong, x * 2L)).toDF("id", "m")
    def reindex(): Unit = Snapshots.commitAppend(
      Seq((Snapshots.readAt(spark, data).count(),
        Snapshots.currentVersion(spark, data))).toDF("n_docs", "data_version")
        .coalesce(1), idx, recordSchema = true)
    Snapshots.commitAppend(slice(1, 10).coalesce(1), data, recordSchema = true)
    reindex()
    MultiTable.publish(spark, s"$root/cut_ledger", Map("cut_data" -> 1L, "cut_idx" -> 1L))
    Snapshots.commitAppend(slice(11, 20).coalesce(1), data)
    reindex()
    MultiTable.publish(spark, s"$root/cut_ledger", Map("cut_data" -> 2L, "cut_idx" -> 2L))
    // a THIRD data commit lands WITHOUT a publish — the classic race
    Snapshots.commitAppend(slice(21, 30).coalesce(1), data)
    spark.sql("SET spark.graft.cut.graft = cut_ledger")
    try {
      // pinned reads: both members at cut 2 — stale-but-consistent
      assert(spark.sql("SELECT count(*) AS n FROM graft.cut_data").as[Long].head() === 20L)
      assert(spark.sql(
        "SELECT n_docs, data_version FROM graft.cut_idx ORDER BY data_version DESC LIMIT 1")
        .as[(Long, Long)].head() === ((20L, 2L)))
      // a historical cut replays forever
      spark.sql("SET spark.graft.cut.graft = cut_ledger@1")
      assert(spark.sql("SELECT count(*) AS n FROM graft.cut_data").as[Long].head() === 10L)
      // explicit AS OF names its own snapshot — bypasses the pin
      assert(spark.sql("SELECT count(*) AS n FROM graft.cut_data VERSION AS OF 3")
        .as[Long].head() === 30L)
      // a non-member read while pinned refuses (consistent would be a lie)
      val e = intercept[Exception] {
        spark.sql("SELECT count(*) AS n FROM graft.t1").collect() }
      assert(e.getMessage.contains("not a member"), e.getMessage)
    } finally spark.sql("RESET spark.graft.cut.graft")
    // unpinned: ordinary current-version read sees the unpublished chunk
    assert(spark.sql("SELECT count(*) AS n FROM graft.cut_data").as[Long].head() === 30L)
  }

  test("distributed stats verdicts equal the driver path's (threshold forced to 1)") {
    mkSliced("t17")
    def run(): (Seq[(Long, Long)], Int) = {
      GraftScanInfo.last = None
      val rows = spark.sql(
        "SELECT id, m FROM graft.t17 WHERE id BETWEEN 15 AND 18 ORDER BY id")
        .as[(Long, Long)].collect().toSeq
      (rows, GraftScanInfo.last.get.candidates)
    }
    val (r1, c1) = run() // driver path (4 files, far below the threshold)
    spark.conf.set("spark.graft.scan.statsDistributeThreshold", "1")
    try {
      val (r2, c2) = run() // manifests read as a Spark job, verdicts on executors
      assert(r2 === r1 && c2 === c1, s"driver=($r1,$c1) distributed=($r2,$c2)")
      assert(c1 === 1) // and the pruning is real either way
      // point + prefix predicates take the same path
      assert(spark.sql("SELECT count(*) AS n FROM graft.t17 WHERE id = 7")
        .as[Long].head() === 1L)
    } finally spark.conf.unset("spark.graft.scan.statsDistributeThreshold")
  }

  test("LIKE 'p%' pruning never false-negatives on a U+FFFF-bearing min") {
    val t = s"$root/t16"
    // file 1's MIN itself starts with 'p' but sorts ABOVE 'p'+U+FFFF —
    // the naive `min <= p + '￿'` upper bound would prune this file
    // and silently drop its matching row
    Snapshots.commitAppend(Seq(("p￿z", 1L), ("q", 2L)).toDF("s", "v")
      .coalesce(1), t, recordSchema = true, statsCols = Seq("s"))
    Snapshots.commitAppend(Seq(("zz", 3L)).toDF("s", "v").coalesce(1), t,
      statsCols = Seq("s"))
    GraftScanInfo.last = None
    val got = spark.sql("SELECT v FROM graft.t16 WHERE s LIKE 'p%'")
      .as[Long].collect().toSeq
    assert(got === Seq(1L))
    // pruning still works where it should: the all-'z' file is skipped
    val info = GraftScanInfo.last.get
    assert(info.total === 2 && info.candidates === 1, s"$info")
  }
}
