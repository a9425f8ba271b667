package graft.sql

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

/** PARTITIONED BY as manifest-native write clustering ([[Clustering]]):
  * the spec records as a table property, INSERTs range-cluster and
  * zone-map on it, and the existing scan pruning serves partition
  * pruning — no directories, predicates stay on raw columns. */
class GraftClusterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    spark.conf.set("spark.sql.catalog.gclu", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gclu.root", r)
    r
  }

  private def scanInfo = GraftScanInfo.last.get

  /** At test scale AQE coalesces the range shuffle to ONE tiny file
    * (correct at real scale — files sized by bytes); pin the partition
    * count so layout assertions see distinct range files. */
  private def withRangeFiles[A](body: => A): A = {
    val k = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, prev)
  }

  test("identity clustering: INSERT clusters, equality predicate prunes files") {
    root
    spark.sql("CREATE TABLE gclu.c1 (id BIGINT, src STRING, m BIGINT) PARTITIONED BY (src)")
    (1 to 400).map(i => (i.toLong, s"s${i % 4}", i.toLong))
      .toDF("id", "src", "m").createOrReplaceTempView("c1_in")
    withRangeFiles { spark.sql("INSERT INTO gclu.c1 SELECT * FROM c1_in") }
    // property recorded; partitioning reported
    assert(Snapshots.tableProperties(spark, s"$root/c1")(Clustering.Prop) === "src")
    val total = Snapshots.liveFiles(spark, s"$root/c1").size
    assert(total > 1, "clustered insert should write multiple range files")
    GraftScanInfo.last = None
    val got = spark.sql("SELECT sum(m) AS s FROM gclu.c1 WHERE src = 's2'")
      .as[Long].head()
    assert(got === (1 to 400).filter(_ % 4 == 2).map(_.toLong).sum)
    assert(scanInfo.candidates < scanInfo.total,
      s"expected file pruning on the cluster column, got $scanInfo")
  }

  test("days(ts) clustering: range predicate on the RAW column prunes") {
    root
    spark.sql("""CREATE TABLE gclu.c2 (ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    val rows = for (d <- 1 to 8; i <- 1 to 25)
      yield (java.sql.Timestamp.valueOf(f"2026-03-$d%02d 1${i % 9}:00:00"), (d * 100 + i).toLong)
    rows.toDF("ts", "v").createOrReplaceTempView("c2_in")
    withRangeFiles { spark.sql("INSERT INTO gclu.c2 SELECT * FROM c2_in") }
    GraftScanInfo.last = None
    val got = spark.sql(
      """SELECT count(*) AS n FROM gclu.c2
         WHERE ts >= TIMESTAMP '2026-03-03 00:00:00'
           AND ts <  TIMESTAMP '2026-03-05 00:00:00'""").as[Long].head()
    assert(got === 50L)
    assert(scanInfo.candidates < scanInfo.total,
      s"expected day-range pruning via raw-ts zone maps, got $scanInfo")
  }

  test("INSERT OVERWRITE keeps the layout: stats re-stamped, pruning survives") {
    root
    spark.sql("CREATE TABLE gclu.c3 (id BIGINT, src STRING) PARTITIONED BY (src)")
    (1 to 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
      .createOrReplaceTempView("c3_in")
    withRangeFiles {
      spark.sql("INSERT INTO gclu.c3 SELECT * FROM c3_in")
      spark.sql("INSERT OVERWRITE gclu.c3 SELECT id, src FROM c3_in WHERE id <= 80")
    }
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c3 WHERE src = 's1'")
      .as[Long].head() === 20L)
    assert(scanInfo.candidates < scanInfo.total,
      s"overwrite must re-stamp zone maps, got $scanInfo")
    // row counts re-stamped too: COUNT(*) stays metadata-only
    assert(Snapshots.fastCount(spark, s"$root/c3") === 80L)
  }

  test("mutations preserve the layout: UPDATE and MERGE keep pruning alive") {
    root
    spark.sql("CREATE TABLE gclu.c4 (id BIGINT, src STRING, m BIGINT) PARTITIONED BY (src)")
    (1 to 200).map(i => (i.toLong, s"s${i % 4}", i.toLong))
      .toDF("id", "src", "m").createOrReplaceTempView("c4_in")
    withRangeFiles {
      spark.sql("INSERT INTO gclu.c4 SELECT * FROM c4_in")
      // CoW UPDATE rewrites every file (all hold odd ids); the rewritten
      // files must come back clustered + stat'd, not smeared
      spark.sql("UPDATE gclu.c4 SET m = m + 1000 WHERE id % 2 = 1")
    }
    GraftScanInfo.last = None
    val got = spark.sql("SELECT count(*) AS n FROM gclu.c4 WHERE src = 's3'")
      .as[Long].head()
    assert(got === 50L)
    assert(scanInfo.candidates < scanInfo.total,
      s"post-UPDATE scan must still prune, got $scanInfo")
    // an insert-only library merge (the CDC shape) also lands clustered
    withRangeFiles {
      graft.io.Snapshots.mergeInto(spark, s"$root/c4",
        (201 to 280).map(i => (i.toLong, s"s${i % 4}", 0L)).toDF("id", "src", "m"),
        Seq("id"))
    }
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c4 WHERE src = 's3'")
      .as[Long].head() === 70L)
    assert(scanInfo.candidates < scanInfo.total,
      s"post-MERGE scan must still prune, got $scanInfo")
  }

  test("streaming batch commits cluster and stamp stats on clustered tables") {
    root
    spark.sql("CREATE TABLE gclu.c5 (id BIGINT, src STRING) PARTITIONED BY (src)")
    val t = s"$root/c5"
    withRangeFiles {
      Snapshots.commitBatchOnce(spark, t, 0L,
        (1 to 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src"))
    }
    val live = Snapshots.liveFiles(spark, t).toSet
    val srcStats = Snapshots.fileStats(spark, t)
      .filter(st => st.column == "src" && live(st.path))
    assert(srcStats.map(_.path).toSet === live,
      "every batch-committed file must carry cluster-column zone maps")
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c5 WHERE src = 's2'")
      .as[Long].head() === 25L)
    assert(scanInfo.candidates < scanInfo.total)
    assert(Snapshots.fastCount(spark, t) === 100L)
  }

  test("CALL optimize defaults cols to the cluster spec; refuses without either") {
    root
    spark.sql("CREATE TABLE gclu.c6 (id BIGINT, src STRING) PARTITIONED BY (src)")
    (1 to 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
      .createOrReplaceTempView("c6_in")
    withRangeFiles { spark.sql("INSERT INTO gclu.c6 SELECT * FROM c6_in") }
    val r = spark.sql("CALL gclu.system.optimize('c6', '', 2)").collect().head
    assert(r.getLong(2) <= 2L)
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c6 WHERE src = 's1'")
      .as[Long].head() === 25L)
    // unclustered table with empty cols refuses, naming the property
    spark.sql("CREATE TABLE gclu.c7 (id BIGINT)")
    val e = intercept[Exception](
      spark.sql("CALL gclu.system.optimize('c7', '', 2)").collect())
    assert(e.getMessage.contains("write.cluster.by"))
  }

  test("multi-dim PARTITIONED BY z-clusters: EVERY dimension prunes alone") {
    root
    spark.sql("CREATE TABLE gclu.c8 (a BIGINT, b BIGINT, v BIGINT) PARTITIONED BY (a, b)")
    (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong, (a * 32 + b).toLong))
      .toDF("a", "b", "v").createOrReplaceTempView("c8_in")
    withRangeFiles { spark.sql("INSERT INTO gclu.c8 SELECT * FROM c8_in") }
    assert(Snapshots.liveFiles(spark, s"$root/c8").size > 1)
    // a predicate on the SECOND dimension alone prunes — the lexicographic
    // layout this replaces cannot do this (b spans its whole domain in
    // every leading-dim range file)
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c8 WHERE b < 8")
      .as[Long].head() === 32L * 8)
    val ib = scanInfo
    assert(ib.candidates < ib.total, s"second-dim pruning failed: $ib")
    // and the first dimension still prunes
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c8 WHERE a < 8")
      .as[Long].head() === 32L * 8)
    val ia = scanInfo
    assert(ia.candidates < ia.total, s"first-dim pruning failed: $ia")
  }

  test("mixed temporal+string multi-dim: both transforms prune through z") {
    root
    spark.sql("""CREATE TABLE gclu.c9 (ts TIMESTAMP, src STRING, v BIGINT)
                 PARTITIONED BY (days(ts), src)""")
    val rows = for (d <- 1 to 8; s <- 0 until 4; i <- 1 to 8)
      yield (java.sql.Timestamp.valueOf(f"2026-04-$d%02d 0$i:00:00"), s"g$s", i.toLong)
    rows.toDF("ts", "src", "v").createOrReplaceTempView("c9_in")
    withRangeFiles { spark.sql("INSERT INTO gclu.c9 SELECT * FROM c9_in") }
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c9 WHERE src = 'g0'")
      .as[Long].head() === 64L)
    assert(scanInfo.candidates < scanInfo.total,
      s"string-dim pruning failed: $scanInfo")
    GraftScanInfo.last = None
    assert(spark.sql(
      """SELECT count(*) AS n FROM gclu.c9
         WHERE ts >= TIMESTAMP '2026-04-01 00:00:00'
           AND ts <  TIMESTAMP '2026-04-03 00:00:00'""").as[Long].head() === 64L)
    assert(scanInfo.candidates < scanInfo.total,
      s"temporal-dim pruning failed: $scanInfo")
  }

  test("retrofit: ALTER TABLE SET write.cluster.by clusters every later write") {
    root
    // an UNPARTITIONED table picks up clustering mid-life through the
    // ordinary property surface — no recreate, next writes cluster
    spark.sql("CREATE TABLE gclu.c10 (id BIGINT, src STRING)")
    (1 to 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
      .createOrReplaceTempView("c10_in")
    spark.sql("INSERT INTO gclu.c10 SELECT * FROM c10_in") // pre-retrofit: unclustered
    spark.sql("ALTER TABLE gclu.c10 SET TBLPROPERTIES ('write.cluster.by'='src')")
    withRangeFiles {
      spark.sql("INSERT OVERWRITE gclu.c10 SELECT * FROM c10_in")
    }
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c10 WHERE src = 's2'")
      .as[Long].head() === 25L)
    assert(scanInfo.candidates < scanInfo.total,
      s"retrofit overwrite must cluster + stat, got $scanInfo")
  }

  test("clone at a tag: CALL clone(..., ref) pins the named corpus") {
    root
    spark.sql("CREATE TABLE gclu.c11 (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gclu.c11 VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"CALL gclu.system.tag('c11', 'curated', ${Snapshots.currentVersion(spark, s"$root/c11")})")
    spark.sql("INSERT INTO gclu.c11 VALUES (3, 'c')")
    val r = spark.sql("CALL gclu.system.clone('c11', 'c11fork', 0, 'curated')")
      .collect().head
    assert(r.getLong(1) === 2L) // base = the tagged version
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c11fork").as[Long].head() === 2L)
    assert(spark.sql("SELECT count(*) AS n FROM gclu.c11").as[Long].head() === 3L)
  }

  test("bucket() refuses with the bloom-index pointer; unknown column refuses") {
    root
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gclu.cb (id BIGINT) PARTITIONED BY (bucket(16, id))"))
    assert(e.getMessage.contains("bloom_index"))
    val e2 = intercept[Exception](spark.sql(
      "CREATE TABLE gclu.cu (id BIGINT) PARTITIONED BY (nope)"))
    assert(e2.getMessage.contains("unknown column") ||
      e2.getMessage.contains("Couldn't find column"))
  }

  test("spec evolution timeline: old files keep pruning on the old spec, new writes cluster by the new, OPTIMIZE heals the split") {
    root
    spark.sql("""CREATE TABLE gclu.ce (id BIGINT, src STRING, m BIGINT)
                |PARTITIONED BY (src)""".stripMargin)
    (1 to 200).map(i => (i.toLong, s"s${i % 4}", i * 2L)).toDF("id", "src", "m")
      .createOrReplaceTempView("ce_in")
    withRangeFiles {
      spark.sql("INSERT INTO gclu.ce SELECT * FROM ce_in WHERE id <= 100")
    }
    val t = s"$root/ce"
    // EVOLVE the spec: later writes cluster by id instead of src
    spark.sql("ALTER TABLE gclu.ce SET TBLPROPERTIES ('write.cluster.by'='id')")
    // the evolution commit is announced in the history notes
    assert(Snapshots.notes(spark, t).exists(_.startsWith("cluster-evolve:src->id")),
      Snapshots.notes(spark, t).mkString("; "))
    withRangeFiles {
      spark.sql("INSERT INTO gclu.ce SELECT * FROM ce_in WHERE id > 100")
    }
    // t$detail surfaces the layout split: the pre-evolution files carry
    // src stats but no id stats
    val d = spark.sql(s"SELECT cluster_spec, unclustered_files FROM gclu.`ce$$detail`")
      .collect().head
    assert(d.getString(0) === "id")
    assert(d.getInt(1) > 0, "pre-evolution files must show as unclustered")
    // OLD files still prune on the OLD spec column…
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.ce WHERE src = 's2' AND id <= 100")
      .as[Long].head() === 25L)
    assert(scanInfo.candidates < scanInfo.total, s"old-spec prune: $scanInfo")
    // …and NEW files prune on the NEW spec column
    GraftScanInfo.last = None
    assert(spark.sql("SELECT count(*) AS n FROM gclu.ce WHERE id BETWEEN 101 AND 120")
      .as[Long].head() === 20L)
    assert(scanInfo.candidates < scanInfo.total, s"new-spec prune: $scanInfo")
    // one OPTIMIZE heals the split completely
    spark.sql("CALL gclu.system.optimize('ce')")
    val d2 = spark.sql(s"SELECT unclustered_files FROM gclu.`ce$$detail`")
      .collect().head
    assert(d2.getInt(0) === 0, "OPTIMIZE must close the layout split")
    assert(spark.sql("SELECT sum(m) AS s FROM gclu.ce").as[Long].head()
      === (1L to 200L).map(_ * 2).sum)
    // an invalid evolution refuses at the ALTER
    val bad = intercept[Exception](spark.sql(
      "ALTER TABLE gclu.ce SET TBLPROPERTIES ('write.cluster.by'='nope')"))
    assert(bad.getMessage.contains("unknown column"), bad.getMessage)
    val badFn = intercept[Exception](spark.sql(
      "ALTER TABLE gclu.ce SET TBLPROPERTIES ('write.cluster.by'='days(src)')"))
    assert(badFn.getMessage.contains("timestamp/date"), badFn.getMessage)
  }
}
