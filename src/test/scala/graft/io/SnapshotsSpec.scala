package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString + "/tbl"

  private def df(ids: Range) = ids.map(_.toLong).toDF("id")

  test("commitAppend + readAt: versions accumulate and time travel is stable") {
    val t = tmpTable()
    assert(Snapshots.currentVersion(spark, t) === 0L)
    val v1 = Snapshots.commitAppend(df(1 to 10), t)
    val v2 = Snapshots.commitAppend(df(11 to 15), t)
    assert((v1, v2) === ((1L, 2L)))
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t).count() === 15)
    // a later commit must not disturb an already-resolved old version
    Snapshots.commitAppend(df(16 to 16), t)
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t, Some(2)).count() === 15)
    assert(Snapshots.readAt(spark, t).count() === 16)
  }

  test("remove commits drop files; diff reports file-level changes") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t)
    Snapshots.commitAppend(df(11 to 15), t)
    val v1Files = Snapshots.liveFiles(spark, t, Some(1))
    val v3 = Snapshots.commit(spark, t, adds = Nil, removes = v1Files)
    assert(v3 === 3L)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (11L to 15L).toSet)
    val d = Snapshots.diff(spark, t, 1, 3).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d.count(_._2 == "removed") === v1Files.size)
    assert(d.map(_._1).toSet.intersect(v1Files.toSet) === v1Files.toSet)
    // reverse direction: v1's files come back as added, v2's leave
    val d2 = Snapshots.diff(spark, t, 3, 1).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d2.filter(_._2 == "added").map(_._1).toSet === v1Files.toSet)
    assert(d2.count(_._2 == "removed") === Snapshots.liveFiles(spark, t, Some(3)).size)
  }

  test("losing a version race throws ConcurrentCommitException") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 3), t)
    // both writers resolved their reads at v1; the second PUT must lose
    val base = Snapshots.currentVersion(spark, t)
    Snapshots.commit(spark, t, adds = Seq("x"), baseVersion = Some(base))
    intercept[Snapshots.ConcurrentCommitException] {
      Snapshots.commit(spark, t, adds = Seq("y"), baseVersion = Some(base))
    }
    // the loser re-resolves and retries cleanly
    assert(Snapshots.commit(spark, t, adds = Seq("y")) === base + 2)
  }

  test("checkpoint shortens replay without changing any resolution") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t)
    Snapshots.commitAppend(df(6 to 9), t)
    val before = Snapshots.liveFiles(spark, t, Some(2))
    assert(Snapshots.checkpoint(spark, t) === 2L)
    assert(Snapshots.liveFiles(spark, t, Some(2)) === before)
    Snapshots.commitAppend(df(10 to 12), t)
    assert(Snapshots.readAt(spark, t).count() === 12)
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 5) // pre-checkpoint history intact
  }

  test("vacuum reclaims only unreferenced data (crashed-writer garbage)") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t)
    // a writer that crashed after writing data but before committing
    df(100 to 200).write.parquet(s"$t/data/orphan")
    val deleted = Snapshots.vacuum(spark, t)
    assert(deleted.nonEmpty && deleted.forall(_.contains("/data/orphan/")))
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 5L).toSet)
    assert(Snapshots.vacuum(spark, t).isEmpty) // idempotent
  }

  test("empty version needs a schema; unknown versions are rejected") {
    val t = tmpTable()
    val sc = StructType(Seq(StructField("id", LongType)))
    assert(Snapshots.readAt(spark, t, None, Some(sc)).count() === 0)
    intercept[IllegalArgumentException] {
      Snapshots.readAt(spark, t, None, None)
    }
    Snapshots.commitAppend(df(1 to 3), t)
    intercept[IllegalArgumentException] {
      Snapshots.liveFiles(spark, t, Some(7))
    }
  }

  test("compact swaps the live set in one transaction; history and content survive") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t)
    Snapshots.commitAppend(df(11 to 15), t)
    assert(Snapshots.liveFiles(spark, t).size > 1)
    val v3 = Snapshots.compact(spark, t, targetFiles = 1)
    assert(v3 === 3L)
    assert(Snapshots.liveFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 15L).toSet)
    // time travel to pre-compaction versions still resolves the old files
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 10)
    assert(Snapshots.readAt(spark, t, Some(2)).count() === 15)
    // removed-but-referenced files are NOT vacuum-eligible
    assert(Snapshots.vacuum(spark, t).isEmpty)
    // compacting an already-compact table is a no-op version-wise
    assert(Snapshots.compact(spark, t, targetFiles = 1) === 3L)
  }

  test("paths with quotes/backslashes survive the manifest round trip") {
    val t = tmpTable()
    val weird = Seq("""/da"ta/p\art-1.parquet""", "/tab\tle/part-2.parquet")
    Snapshots.commit(spark, t, adds = weird)
    assert(Snapshots.liveFiles(spark, t) === weird)
  }

  test("schema evolution: widened commits null-pad old files; time travel keeps the old shape") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), t,
      recordSchema = true)
    Snapshots.commitAppend(Seq((3L, 30L, "en"), (4L, 40L, "de"))
      .toDF("id", "n", "lang"), t, recordSchema = true)
    // current read: evolved 3-column shape, v1 files null-padded
    val cur = Snapshots.readAt(spark, t)
    assert(cur.columns.toSeq === Seq("id", "n", "lang"))
    val byId = cur.collect().map(r => r.getLong(0) ->
      Option(r.getAs[String]("lang"))).toMap
    assert(byId(1L).isEmpty && byId(3L).contains("en"))
    // time travel to v1: the pre-evolution 2-column shape
    val v1 = Snapshots.readAt(spark, t, Some(1))
    assert(v1.columns.toSeq === Seq("id", "n"))
    assert(v1.count() === 2)
    // recorded schemas resolve per version
    assert(Snapshots.tableSchema(spark, t, Some(1)).get.fieldNames.toSeq ===
      Seq("id", "n"))
    assert(Snapshots.tableSchema(spark, t).get.fieldNames.toSeq ===
      Seq("id", "n", "lang"))
  }

  test("schema evolution: explicit schema still wins; unstamped tables unchanged") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "n"), t) // no stamp
    assert(Snapshots.tableSchema(spark, t).isEmpty)
    // unstamped: file-inferred read, as before evolution support
    assert(Snapshots.readAt(spark, t).columns.toSeq === Seq("id", "n"))
    // explicit schema overrides any recorded one
    val narrow = StructType(Seq(StructField("id", LongType)))
    assert(Snapshots.readAt(spark, t, schema = Some(narrow)).columns.toSeq === Seq("id"))
  }

  test("schema evolution: empty pre-data version resolves via the recorded schema") {
    val t = tmpTable()
    // a schema-only commit (no files yet) — readAt(v1) yields a typed
    // empty frame without the caller passing a schema
    Snapshots.commit(spark, t, adds = Nil,
      schemaJson = Some(StructType(Seq(StructField("id", LongType))).json))
    val v1 = Snapshots.readAt(spark, t, Some(1))
    assert(v1.columns.toSeq === Seq("id") && v1.count() === 0)
  }

  /** Four range-disjoint files (one commit each, zone maps on id):
    * slice i holds ids [i*100, i*100+99]. */
  private def slicedTable(): String = {
    val t = tmpTable()
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(df(i * 100 to i * 100 + 99).coalesce(1), t,
        recordSchema = true, statsCols = Seq("id"))
    }
    t
  }

  test("zone maps: stats recorded per live file; pruneFiles partitions by range") {
    val t = slicedTable()
    val stats = Snapshots.fileStats(spark, t)
    val live = Snapshots.liveFiles(spark, t)
    assert(stats.map(_.path).toSet === live.toSet) // every live file has an id stat
    assert(stats.forall(_.dtype == "bigint"))
    // a predicate hitting only slice 2 scans exactly slice 2's file(s)
    val (scan, pruned) = Snapshots.pruneFiles(spark, t, "id", "210", "260")
    assert(scan.size === 1 && pruned.size === 3)
    val scanStat = stats.find(_.path == scan.head).get
    assert(scanStat.min.toLong === 200L && scanStat.max.toLong === 299L)
    // readPruned over that range ≡ the full-scan filter
    val viaPruned = Snapshots.readPruned(spark, t, "id", "210", "260")
      .filter(col("id").between(210, 260)).as[Long].collect().toSet
    assert(viaPruned === (210L to 260L).toSet)
  }

  test("footer fast path: stats identical to the scan pass across dtypes, nulls, NaN fallback") {
    // the footer path must be bit-identical to the scan's cast-AS-STRING
    // rendering, or pruning comparisons would diverge between commits
    // that took different paths
    val dir = java.nio.file.Files.createTempDirectory("graft_fstat").toString
    val data = Seq(
      (1L, 7, -2.5d, 3.25f, java.sql.Date.valueOf("2020-02-29"), Option(9L)),
      (2L, -40, 1.0e9d, -0.0f, java.sql.Date.valueOf("1999-12-31"), None),
      (3L, 0, 0.125d, 7.5f, java.sql.Date.valueOf("2020-02-29"), Option(-3L)))
      .toDF("l", "i", "d", "f", "dt", "on")
    data.repartition(2).write.parquet(s"$dir/p")
    val parts = new java.io.File(s"$dir/p").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getAbsolutePath).toSeq
    val cols = Seq("l", "i", "d", "f", "dt", "on")
    val viaFooter = Snapshots.computeStats(spark, s"$dir/p", parts, cols,
      withRowCounts = true)
    // force the scan pass by including a STRING column (unsafe dtype)
    val dataS = data.withColumn("s", concat(lit("v"), col("l")))
    dataS.repartition(2).write.parquet(s"$dir/q")
    val partsQ = new java.io.File(s"$dir/q").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getAbsolutePath).toSeq
    val viaScan = Snapshots.computeStats(spark, s"$dir/q", partsQ, cols :+ "s",
      withRowCounts = true)
    def key(st: Snapshots.FileStat) = (st.column, st.dtype, st.min, st.max)
    // same logical rows in both dirs → identical per-column global bounds
    def bounds(sts: Seq[Snapshots.FileStat], c: String) = {
      val s = sts.filter(_.column == c)
      (s.map(_.min).min, s.map(_.max).max, s.head.dtype)
    }
    cols.foreach { c =>
      assert(bounds(viaFooter, c) === bounds(viaScan, c), s"column $c")
    }
    assert(viaFooter.filter(_.column == Snapshots.RowsStat).map(_.min.toLong).sum === 3L)
    // NaN poisons footer ordering → the NaN frame must take the scan path
    // and still record SOMETHING sane (scan min/max of doubles with NaN)
    val nan = Seq(1.0d, Double.NaN, 2.0d).toDF("d")
    nan.coalesce(1).write.parquet(s"$dir/n")
    val partsN = new java.io.File(s"$dir/n").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getAbsolutePath).toSeq
    val nanStats = Snapshots.computeStats(spark, s"$dir/n", partsN, Seq("d"))
    assert(nanStats.nonEmpty) // fell back, did not silently drop
  }

  test("zone maps: a file with no stat for the column is conservatively scanned") {
    val t = slicedTable()
    // an unstamped commit (no statsCols) — must never be pruned
    Snapshots.commitAppend(df(1000 to 1001).coalesce(1), t)
    val (scan, _) = Snapshots.pruneFiles(spark, t, "id", "210", "260")
    assert(scan.size === 2) // slice 2 + the statless file
  }

  test("deleteWhere rewrites only matching files; untouched files stay byte-identical") {
    val t = slicedTable()
    val before = Snapshots.liveFiles(spark, t)
    val res = Snapshots.deleteWhere(spark, t, col("id").between(150, 250),
      prune = Some(("id", "150", "250")))
    // slices 1 and 2 intersect [150,250]; slices 0 and 3 must survive as-is
    assert(res.rewritten.size === 2 && res.untouched === 2)
    val after = Snapshots.liveFiles(spark, t)
    assert(before.toSet.intersect(after.toSet).size === 2) // same path strings
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet ===
      ((0L to 149L) ++ (251L to 399L)).toSet)
    // time travel across the delete: the pre-delete version is intact
    assert(Snapshots.readAt(spark, t, Some(res.version - 1)).count() === 400)
    // and vacuum never reclaims the removed-but-referenced files
    assert(Snapshots.vacuum(spark, t).isEmpty)
    assert(Snapshots.readAt(spark, t, Some(res.version - 1)).count() === 400)
    // survivors were re-stamped: a follow-up pruned delete still narrows
    val (scan2, _) = Snapshots.pruneFiles(spark, t, "id", "0", "10")
    assert(scan2.size === 1)
  }

  test("deleteWhere: a zone-map false positive (no matching rows) is not rewritten") {
    val t = slicedTable()
    // [140,160] intersects slice 1's [100,199] zone map, but delete only
    // even ids in [150,160] that don't exist: cond matches nothing there
    val res = Snapshots.deleteWhere(spark, t,
      col("id").between(150, 160) && col("id") > lit(1000),
      prune = Some(("id", "140", "160")))
    assert(res.rewritten.isEmpty)
    assert(Snapshots.currentVersion(spark, t) === res.version) // no new commit
    assert(Snapshots.readAt(spark, t).count() === 400)
  }

  test("deleteWhere without prune hint scans all candidates, same result") {
    val t = slicedTable()
    val res = Snapshots.deleteWhere(spark, t, col("id") % 100 === 7)
    assert(res.rewritten.size === 4) // every slice holds one match
    assert(Snapshots.readAt(spark, t).count() === 396)
  }

  test("updateWhere rewrites only matching files, leaves other rows in them intact") {
    val t = slicedTable()
    val before = Snapshots.liveFiles(spark, t)
    val res = Snapshots.updateWhere(spark, t, col("id").between(150, 250),
      Seq("id" -> (col("id") + 10000L)),
      prune = Some(("id", "150", "250")))
    assert(res.rewritten.size === 2 && res.untouched === 2)
    assert(Snapshots.liveFiles(spark, t).toSet.intersect(before.toSet).size === 2)
    val ids = Snapshots.readAt(spark, t).as[Long].collect().toSet
    // matched rows moved by +10000; unmatched rows in the SAME files kept
    assert(ids === ((0L to 149L) ++ (251L to 399L) ++
      (10150L to 10250L)).toSet)
    // pre-update version unchanged
    assert(Snapshots.readAt(spark, t, Some(res.version - 1))
      .as[Long].collect().toSet === (0L to 399L).toSet)
    // rewritten files re-stamped: stats now cover the new id range
    val (scan, _) = Snapshots.pruneFiles(spark, t, "id", "10150", "10250")
    assert(scan.size <= 2 && scan.nonEmpty)
  }

  test("updateWhere rejects duplicate assignment targets") {
    val t = slicedTable()
    val e = intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, t, col("id") === 1L,
        Seq("id" -> lit(1L), "id" -> lit(2L)))
    }
    assert(e.getMessage.contains("duplicate assignment"), e.getMessage)
  }

  test("updateWhere with no matches commits nothing") {
    val t = slicedTable()
    val v = Snapshots.currentVersion(spark, t)
    val res = Snapshots.updateWhere(spark, t, col("id") === -5,
      Seq("id" -> lit(0L)))
    assert(res.rewritten.isEmpty && res.version === v)
  }

  test("deleteWhere with a fully-pruning hint is a no-op (no scan, no commit)") {
    val t = slicedTable()
    val v = Snapshots.currentVersion(spark, t)
    val res = Snapshots.deleteWhere(spark, t, col("id") === 99999,
      prune = Some(("id", "99990", "99999")))
    assert(res.rewritten.isEmpty && res.untouched === 4)
    assert(res.version === v && Snapshots.currentVersion(spark, t) === v)
  }

  test("deleteWhere with a NULL-valued predicate keeps NULL-cond rows (SQL DELETE semantics)") {
    val t = tmpTable()
    // two files, each with a NULL flag row; delete WHERE flag = true must
    // remove only the TRUE rows — NULL-cond rows survive in BOTH the
    // rewritten file and the untouched one (no file-dependent loss)
    Snapshots.commitAppend(Seq((1L, Some(true)), (2L, Some(false)), (3L, None))
      .toDF("id", "flag").coalesce(1), t, recordSchema = true)
    Snapshots.commitAppend(Seq((4L, Some(false)), (5L, None))
      .toDF("id", "flag").coalesce(1), t)
    val res = Snapshots.deleteWhere(spark, t, col("flag") === lit(true))
    assert(res.rewritten.size === 1) // only the file holding id=1
    assert(Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet ===
      Set(2L, 3L, 4L, 5L))
  }

  test("mergeInto replaces matched keys, inserts new ones, rewrites only matching files") {
    val t = tmpTable()
    def part(ids: Range) =
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "val").coalesce(1)
    (0 until 4).foreach(i => Snapshots.commitAppend(part(i * 100 until (i + 1) * 100), t,
      recordSchema = true, statsCols = Seq("id")))
    // updates hit files 1 and 2 only; 1000/1001 are inserts — column order
    // deliberately flipped vs the table
    val updates = Seq(("u150", 150L), ("u250", 250L), ("ins", 1000L), ("ins", 1001L))
      .toDF("val", "id")
    val res = Snapshots.mergeInto(spark, t, updates, keys = Seq("id"),
      pruneOn = Some("id"))
    assert(res.rewritten.size === 2 && res.untouched === 2)
    val now = Snapshots.readAt(spark, t)
    assert(now.count() === 402)
    assert(now.filter(col("id").isin(150L, 250L)).select("val").as[String]
      .collect().toSet === Set("u150", "u250"))
    assert(now.filter(col("id") >= 1000L).count() === 2)
    assert(now.filter(col("id") === 151L).select("val").as[String].head() === "v151")
    // pre-merge version time-travels
    assert(Snapshots.readAt(spark, t, Some(res.version - 1)).count() === 400)
    // rewritten files were re-stamped: key-range prune still narrows
    val (scan, _) = Snapshots.pruneFiles(spark, t, "id", "0", "10")
    assert(scan.size === 1)
  }

  test("mergeInto on an empty table is a plain insert; all-new keys rewrite nothing") {
    val t = tmpTable()
    val res0 = Snapshots.mergeInto(spark, t,
      Seq((1L, "a")).toDF("id", "val"), keys = Seq("id"))
    assert(res0.version === 1L && res0.rewritten.isEmpty)
    // second merge with only-new keys: no file holds a match → no rewrite
    val res1 = Snapshots.mergeInto(spark, t,
      Seq((2L, "b")).toDF("id", "val"), keys = Seq("id"), pruneOn = Some("id"))
    assert(res1.rewritten.isEmpty)
    assert(Snapshots.readAt(spark, t).count() === 2)
  }

  test("zone maps on decimal columns compare numerically, not lexicographically") {
    val t = tmpTable()
    // lexicographically "100.00" < "20.00", so a string compare would
    // wrongly prune the [100,199] file for a BETWEEN 150 AND 160 probe
    def dec(lo: Int, hi: Int) =
      spark.range(lo, hi + 1).select(col("id").cast("decimal(10,2)").as("d"))
    Snapshots.commitAppend(dec(0, 99).coalesce(1), t,
      recordSchema = true, statsCols = Seq("d"))
    Snapshots.commitAppend(dec(100, 199).coalesce(1), t, statsCols = Seq("d"))
    val (scan, skip) = Snapshots.pruneFiles(spark, t, "d", "150", "160")
    assert(scan.size === 1 && skip.size === 1)
    assert(Snapshots.readPruned(spark, t, "d", "150", "160")
      .filter(col("d").between(150, 160)).count() === 11)
  }

  test("optimizeZorder: content invariant, one commit, both-dim pruning, time travel") {
    val t = tmpTable()
    // 4 append-ordered files over a 16×16 grid — each initial file spans
    // the FULL range of both dims (zero pruning value in either)
    val pts = (0 until 256).map(i => (i.toLong, (i % 16).toLong, (i / 16).toLong))
      .toDF("id", "a", "b")
    (0 until 4).foreach(i =>
      Snapshots.commitAppend(pts.filter(col("id") % 4 === i).coalesce(1), t,
        recordSchema = true, statsCols = Seq("a", "b")))
    val before = Snapshots.readAt(spark, t).as[(Long, Long, Long)].collect().toSet
    val res = Snapshots.optimizeZorder(spark, t, "a", "b", targetFiles = 4, bits = 4)
    assert((res.version, res.filesBefore, res.filesAfter) === ((5L, 4, 4)))
    // content byte-for-byte equivalent, old versions untouched
    assert(Snapshots.readAt(spark, t).as[(Long, Long, Long)].collect().toSet === before)
    assert(Snapshots.readAt(spark, t, Some(4)).count() === 256)
    assert(Snapshots.readAt(spark, t, Some(1)).count() === 64)
    // z-clustered files are bounded rectangles: a narrow band in EITHER
    // dim prunes files (the pre-optimize layout could prune in neither)
    val keptA = Snapshots.pruneFiles(spark, t, "a", "0", "3")._1.size
    val keptB = Snapshots.pruneFiles(spark, t, "b", "0", "3")._1.size
    assert(keptA < 4 && keptB < 4, s"keptA=$keptA keptB=$keptB")
    // the pruned read still sees every band row
    assert(Snapshots.readPruned(spark, t, "a", "0", "3")
      .filter(col("a").between(0, 3)).count() === 64)
    // removed files stay referenced by their commits — vacuum reclaims none
    assert(Snapshots.vacuum(spark, t).isEmpty)
  }

  test("optimizeZorder normalizes numeric dims: domains >= 2^bits still prune") {
    val t = tmpTable()
    // both dims span far beyond 2^16 — unnormalized, zValueK would mask
    // them to value MOD 2^16, every file would cover the full value range,
    // and the rewrite would buy zero pruning (the ADVICE r12 finding)
    val pts = (0 until 256).map(i =>
      (i.toLong * 1000000L, (i % 16).toLong * 50000000L)).toDF("a", "b")
    Snapshots.commitAppend(pts.coalesce(4), t,
      recordSchema = true, statsCols = Seq("a", "b"))
    val before = Snapshots.readAt(spark, t).as[(Long, Long)].collect().toSet
    Snapshots.optimizeZorder(spark, t, "a", "b", targetFiles = 4, bits = 16)
    assert(Snapshots.readAt(spark, t).as[(Long, Long)].collect().toSet === before)
    // a narrow band in EITHER dim prunes files: each file is a bounded
    // rectangle of the REAL (a, b) plane, not of (a mod 2^16, b mod 2^16)
    val keptA = Snapshots.pruneFiles(spark, t, "a", "0", "30000000")._1.size
    val keptB = Snapshots.pruneFiles(spark, t, "b", "0", "100000000")._1.size
    assert(keptA < 4 && keptB < 4, s"keptA=$keptA keptB=$keptB")
    assert(Snapshots.readPruned(spark, t, "a", "0", "30000000")
      .filter(col("a") <= 30000000L).count() === 31)
    // k = 1 on the same wide domain is exact range clustering
    Snapshots.optimizeZorder(spark, t, Seq("a"), targetFiles = 4, bits = 16)
    assert(Snapshots.pruneFiles(spark, t, "a", "0", "30000000")._1.size === 1)
  }

  test("optimizeZorder equi-depth numeric rank: lognormal skew still prunes bands") {
    val t = tmpTable()
    // heavily skewed id domain: min-max scaling would collapse ~all rows
    // into the lowest z-cells (the whole range is dominated by a few huge
    // outliers) and band reads at the dense low end would prune nothing
    val rnd = new scala.util.Random(7)
    val vals = (0 until 2048).map(_ =>
      math.max(1L, math.exp(rnd.nextGaussian() * 3.0 + 5.0).toLong))
    val pts = vals.zipWithIndex.map { case (v, i) => (v, (i % 16).toLong) }
      .toDF("a", "b")
    Snapshots.commitAppend(pts.coalesce(4), t,
      recordSchema = true, statsCols = Seq("a", "b"))
    val before = Snapshots.readAt(spark, t).as[(Long, Long)].collect().sorted
    Snapshots.optimizeZorder(spark, t, "a", "b", targetFiles = 8, bits = 16)
    assert(Snapshots.readAt(spark, t).as[(Long, Long)].collect().sorted
      === before)
    // a band at the dense low end (half the rows by count, a sliver of
    // the value range) opens a strict subset of the files
    val med = vals.sorted.apply(vals.length / 2)
    val (scan, skip) = Snapshots.pruneFiles(spark, t, "a", "1", med.toString)
    assert(skip.nonEmpty, s"scan=${scan.size} skip=${skip.size}")
    assert(Snapshots.readPruned(spark, t, "a", "1", med.toString)
      .filter(col("a") <= med).count() === vals.count(_ <= med))
  }

  test("optimizeZorder inherits retired stat coverage: __rows and non-dim zone maps survive") {
    val t = tmpTable()
    val pts = (0 until 256).map(i => (i.toLong, (i % 16).toLong, (255 - i).toLong))
      .toDF("a", "b", "d")
    Snapshots.commitAppend(pts.coalesce(4), t, recordSchema = true,
      statsCols = Seq("a", "b", "d"), recordRowCounts = true)
    Snapshots.optimizeZorder(spark, t, "a", "b", targetFiles = 4, bits = 8)
    val live = Snapshots.liveFiles(spark, t).toSet
    val stats = Snapshots.fileStats(spark, t)
    // OPTIMIZE must never turn pruning (or metadata COUNT(*)) off: every
    // rewritten file carries the stat columns the retired files carried,
    // including the non-clustered 'd' and the reserved __rows
    assert(live.forall(p => stats.exists(st => st.path == p && st.column == "d")))
    assert(live.forall(p =>
      stats.exists(st => st.path == p && st.column == Snapshots.RowsStat)))
    assert(Snapshots.fastCount(spark, t) === 256L)
    assert(Snapshots.readPruned(spark, t, "d", "0", "63")
      .filter(col("d") <= 63).count() === 64)
  }

  test("temporal zone maps: a read session in a different zone declines pruning, never false-prunes") {
    val t = tmpTable()
    val pts = Seq("2024-01-01 01:00:00", "2024-01-01 06:00:00",
      "2024-06-01 01:00:00", "2024-06-01 06:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    // two files with disjoint ts ranges, zone maps recorded under UTC
    Snapshots.commitAppend(pts.filter(col("ts") < lit("2024-03-01")).coalesce(1),
      t, recordSchema = true, statsCols = Seq("ts"))
    Snapshots.commitAppend(pts.filter(col("ts") >= lit("2024-03-01")).coalesce(1),
      t, statsCols = Seq("ts"))
    // the stamp records the write zone
    assert(Snapshots.fileStats(spark, t).filter(_.column == "ts")
      .forall(_.dtype == "timestamp@UTC"))
    // same-zone read: the January band prunes the June file
    val (scanU, skipU) =
      Snapshots.pruneFiles(spark, t, "ts", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(scanU.size === 1 && skipU.size === 1)
    // a read session in another zone renders literals differently — the
    // verdict declines (both files scanned) instead of silently dropping
    // matching rows
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val (scanN, skipN) =
        Snapshots.pruneFiles(spark, t, "ts", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
      assert(scanN.size === 2 && skipN.isEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("optimizeZorder on an empty table is a no-op") {
    val t = tmpTable()
    val res = Snapshots.optimizeZorder(spark, t, "a", "b", targetFiles = 4)
    assert(res === Snapshots.OptimizeResult(0L, 0, 0))
  }

  test("rowDiff classifies insert/update/delete; rewritten-unchanged rows drop out") {
    val t = tmpTable()
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "s", "v")
    Snapshots.commitAppend(base.coalesce(1), t, recordSchema = true, statsCols = Seq("id"))
    // one CoW delete (rewrites the whole file minus id=2) …
    Snapshots.deleteWhere(spark, t, col("id") === 2)
    // … then a merge: update id=3, insert id=9
    Snapshots.mergeInto(spark, t,
      Seq((3L, "c", 300L), (9L, "z", 90L)).toDF("id", "s", "v"), keys = Seq("id"))
    // delete step (v1→v2): ids 1/3/4 were rewritten byte-equal — only the
    // delete itself may surface
    val d1 = Snapshots.rowDiff(spark, t, 1, 2, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(d1 === Set(2L -> "delete"))
    // merge step (v2→v3)
    val d2 = Snapshots.rowDiff(spark, t, 2, 3, Seq("id")).orderBy("id")
      .as[(Long, String, Option[String], Option[String], Option[Long], Option[Long])]
      .collect().toSeq
    assert(d2 === Seq(
      (3L, "update", Some("c"), Some("c"), Some(30L), Some(300L)),
      (9L, "insert", None, Some("z"), None, Some(90L))))
    // whole span (v1→v3) composes all three changes
    val d3 = Snapshots.rowDiff(spark, t, 1, 3, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(d3 === Set(2L -> "delete", 3L -> "update", 9L -> "insert"))
    // reversed endpoints invert the feed
    val r = Snapshots.rowDiff(spark, t, 3, 1, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(r === Set(2L -> "insert", 3L -> "update", 9L -> "delete"))
    // identical endpoints: empty feed
    assert(Snapshots.rowDiff(spark, t, 3, 3, Seq("id")).count() === 0L)
  }

  test("rowDiff across a widening commit resolves both sides under the newer schema") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "v").coalesce(1), t,
      recordSchema = true)
    Snapshots.commitAppend(Seq((2L, 20L, "x")).toDF("id", "v", "tag").coalesce(1), t,
      recordSchema = true)
    val d = Snapshots.rowDiff(spark, t, 1, 2, Seq("id"))
      .as[(Long, String, Option[Long], Option[Long], Option[String], Option[String])]
      .collect().toSeq
    assert(d === Seq((2L, "insert", None, Some(20L), None, Some("x"))))
  }

  // ---- merge-on-read deletion vectors -----------------------------------

  /** 4-file table: (id, s, v) rows 1..20 in four range slices with id
    * zone maps — the MoR fixtures' shared shape. */
  private def morTable(): String = {
    val t = tmpTable()
    (0 until 4).foreach { i =>
      val rows = ((i * 5 + 1) to (i * 5 + 5)).map(j => (j.toLong, s"s$j", j * 10L))
      Snapshots.commitAppend(rows.toDF("id", "s", "v").coalesce(1), t,
        recordSchema = true, statsCols = Seq("id"))
    }
    t
  }

  test("deleteWhereMor: one tombstone commit, zero data files rewritten, reads resolve it") {
    val t = morTable()
    val filesBefore = Snapshots.liveFiles(spark, t)
    val r = Snapshots.deleteWhereMor(spark, t, col("id").isin(7L, 12L), keys = Seq("id"),
      prune = Some(("id", "7", "12")))
    assert(r.tombstoned === 2L)
    assert(r.dataFilesRewritten === 0)
    assert(Snapshots.liveFiles(spark, t) === filesBefore) // no data file touched
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).count() === 18)
    assert(Snapshots.readAt(spark, t).filter(col("id").isin(7L, 12L)).count() === 0)
    // time travel: the pre-delete version still sees the full set
    assert(Snapshots.readAt(spark, t, Some(r.version - 1)).count() === 20)
    // readPruned resolves tombstones too
    assert(Snapshots.readPruned(spark, t, "id", "6", "8")
      .filter(col("id") === 7L).count() === 0)
    // idempotent: re-deleting the same keys matches nothing, commits nothing
    val r2 = Snapshots.deleteWhereMor(spark, t, col("id").isin(7L), keys = Seq("id"))
    assert(r2.tombstoned === 0L && r2.dvFile.isEmpty)
    assert(r2.version === r.version)
  }

  test("MoR delete then MERGE: fold re-inserts the key, ghost rows never resurrect") {
    val t = morTable()
    Snapshots.deleteWhereMor(spark, t, col("id").isin(3L, 9L), keys = Seq("id"))
    assert(Snapshots.readAt(spark, t).count() === 18)
    // merge re-upserts id=3 (tombstoned) and updates id=4 (live), inserts id=99
    val res = Snapshots.mergeInto(spark, t,
      Seq((3L, "s3b", 333L), (4L, "s4b", 444L), (99L, "s99", 990L)).toDF("id", "s", "v"),
      keys = Seq("id"))
    val now = Snapshots.readAt(spark, t)
    assert(now.count() === 20) // 18 + re-insert(3) + insert(99); 9 still deleted
    assert(now.filter(col("id") === 3L).select("v").as[Long].head() === 333L)
    assert(now.filter(col("id") === 9L).count() === 0) // survivor tombstone still live
    assert(now.filter(col("id") === 4L).select("s").as[String].head() === "s4b")
    // the fold rewrote the dv: one fresh dv holding only id=9
    val dvs = Snapshots.liveDvFiles(spark, t)
    assert(dvs.size === 1)
    assert(spark.read.parquet(dvs.head).as[Long].collect().toSeq === Seq(9L))
    // ghost check: id=3's ORIGINAL physical row (v=30) must not survive in
    // any live file — the merge rewrote its file even though the row was
    // tombstoned at merge time
    assert(now.filter(col("id") === 3L).count() === 1)
    // pre-merge, pre-delete versions both time-travel
    assert(Snapshots.readAt(spark, t, Some(4)).count() === 20)
    assert(res.version === Snapshots.currentVersion(spark, t))
  }

  test("MoR: compact folds tombstones and retires the dv files") {
    val t = morTable()
    Snapshots.deleteWhereMor(spark, t, col("id") <= 2L, keys = Seq("id"))
    val v = Snapshots.compact(spark, t, targetFiles = 2)
    assert(Snapshots.liveDvFiles(spark, t).isEmpty)
    assert(Snapshots.liveFiles(spark, t).size === 2)
    assert(Snapshots.readAt(spark, t).count() === 18)
    // a fresh append of a previously-tombstoned key is visible again
    Snapshots.commitAppend(Seq((1L, "s1b", 11L)).toDF("id", "s", "v"), t)
    assert(Snapshots.readAt(spark, t).filter(col("id") === 1L).count() === 1)
    assert(v === Snapshots.currentVersion(spark, t) - 1)
  }

  test("MoR: optimizeZorder folds tombstones; CoW delete coexists with live dvs") {
    val t = morTable()
    Snapshots.deleteWhereMor(spark, t, col("id") === 5L, keys = Seq("id"))
    // CoW delete with a live dv: match-check ignores ghosts, rewrite drops them
    val cow = Snapshots.deleteWhere(spark, t, col("id") === 6L,
      prune = Some(("id", "6", "6")))
    assert(cow.rewritten.size === 1)
    assert(Snapshots.readAt(spark, t).count() === 18)
    assert(Snapshots.liveDvFiles(spark, t).size === 1) // dv survives the CoW pass
    val opt = Snapshots.optimizeZorder(spark, t, "id", "v", targetFiles = 2)
    assert(Snapshots.liveDvFiles(spark, t).isEmpty) // folded
    assert(Snapshots.readAt(spark, t).count() === 18)
    assert(opt.filesAfter === 2)
  }

  test("MoR: vacuum never reclaims a referenced dv; checkpoints carry dv lines") {
    val t = morTable()
    val r = Snapshots.deleteWhereMor(spark, t, col("id") === 10L, keys = Seq("id"))
    Snapshots.checkpoint(spark, t)
    // another commit after the checkpoint, then resolve THROUGH the checkpoint
    Snapshots.commitAppend(Seq((50L, "s50", 500L)).toDF("id", "s", "v"), t)
    assert(Snapshots.readAt(spark, t).count() === 20) // 19 live + 1 appended
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    val vacuumed = Snapshots.vacuum(spark, t)
    assert(!vacuumed.exists(_.contains("/dv-")), "a referenced dv was vacuumed")
    assert(Snapshots.readAt(spark, t).filter(col("id") === 10L).count() === 0)
    // time travel to the pre-delete version still full
    assert(Snapshots.readAt(spark, t, Some(r.version - 1)).count() === 20)
  }

  test("MoR: rowDiff surfaces tombstone-only deletes from shared files") {
    val t = morTable()
    val v0 = Snapshots.currentVersion(spark, t)
    val r = Snapshots.deleteWhereMor(spark, t, col("id").isin(8L, 14L), keys = Seq("id"))
    // no data file changed between v0 and r.version — the delta is dv-only
    val d = Snapshots.rowDiff(spark, t, v0, r.version, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(d === Set(8L -> "delete", 14L -> "delete"))
    // and the reverse direction reads as inserts
    val rev = Snapshots.rowDiff(spark, t, r.version, v0, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(rev === Set(8L -> "insert", 14L -> "insert"))
    // delete-then-merge span: composes tombstone and rewrite changes
    Snapshots.mergeInto(spark, t,
      Seq((8L, "s8b", 888L)).toDF("id", "s", "v"), keys = Seq("id"))
    val span = Snapshots.rowDiff(spark, t, v0, Snapshots.currentVersion(spark, t), Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toSet
    assert(span === Set(8L -> "update", 14L -> "delete"))
  }

  test("MoR: mismatched dv keys are rejected loudly") {
    val t = morTable()
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    intercept[IllegalArgumentException] {
      Snapshots.deleteWhereMor(spark, t, col("s") === "s2", keys = Seq("s"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.mergeInto(spark, t,
        Seq((2L, "x", 0L)).toDF("id", "s", "v"), keys = Seq("s"))
    }
  }

  test("history summarizes every commit: appends, merge, MoR delete, fold") {
    val t = morTable()
    Snapshots.deleteWhereMor(spark, t, col("id") === 7L, keys = Seq("id"))
    Snapshots.mergeInto(spark, t, Seq((7L, "s7b", 700L)).toDF("id", "s", "v"),
      keys = Seq("id"), note = Some("cdc-batch-0"))
    val h = Snapshots.history(spark, t)
    assert(h.map(_.version) === (1L to 6L))
    // 4 appends: one add each, schema stamped
    assert(h.take(4).forall(c => c.adds === 1 && c.removes === 0 && c.schemaStamped))
    // v5 MoR delete: dv-only commit
    val del = h(4)
    assert(del.adds === 0 && del.dvAdds === 1 && del.removes === 0)
    // v6 merge: rewrites + retires the dv (fully folded → no new dv), noted
    val merge = h(5)
    assert(merge.adds > 0 && merge.removes >= 2 && merge.dvAdds === 0)
    assert(merge.notes === Seq("cdc-batch-0"))
  }

  test("rowDiff with NO recorded schema and divergent file shapes null-pads the union") {
    val t = tmpTable()
    // no recordSchema anywhere: the two versions' exclusive file sets
    // genuinely disagree on columns
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "v").coalesce(1), t)
    Snapshots.commitAppend(Seq((2L, 20L, "x")).toDF("id", "v", "tag").coalesce(1), t)
    val d = Snapshots.rowDiff(spark, t, 1, 2, Seq("id"))
    assert(d.columns.toSet === Set("id", "change", "v_before", "v_after",
      "tag_before", "tag_after"))
    val rows = d.select("id", "change", "tag_after")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(rows === Seq((2L, "insert", Some("x"))))
  }

  test("restore rolls content back as a new commit; history and time travel survive") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t, recordSchema = true)
    Snapshots.commitAppend(df(11 to 15), t, recordSchema = true)
    Snapshots.deleteWhere(spark, t, col("id") <= 3)
    assert(Snapshots.readAt(spark, t).count() === 12)
    val v4 = Snapshots.restore(spark, t, toVersion = 1, note = Some("undo-bad-ingest"))
    assert(v4 === 4L)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 10L).toSet)
    // nothing destroyed: every pre-restore version still resolves
    assert(Snapshots.readAt(spark, t, Some(2)).count() === 15)
    assert(Snapshots.readAt(spark, t, Some(3)).count() === 12)
    assert(Snapshots.notes(spark, t).contains("undo-bad-ingest"))
    // metadata-only: the restore commit wrote no data files
    assert(Snapshots.liveFiles(spark, t).toSet ===
      Snapshots.liveFiles(spark, t, Some(1)).toSet)
    // restoring to identical content is a no-op, not an empty commit
    assert(Snapshots.restore(spark, t, toVersion = 1) === 4L)
    assert(Snapshots.currentVersion(spark, t) === 4L)
  }

  test("restore across a MoR delete reinstates the deletion-vector state") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1),
      t, recordSchema = true)
    Snapshots.deleteWhereMor(spark, t, col("id") === 2L, keys = Seq("id"))
    assert(Snapshots.readAt(spark, t).count() === 2)
    // roll back BEFORE the delete: dv must drop out
    Snapshots.restore(spark, t, toVersion = 1)
    assert(Snapshots.liveDvFiles(spark, t).isEmpty)
    assert(Snapshots.readAt(spark, t).count() === 3)
    // roll forward to the deleted state: dv must come back
    Snapshots.restore(spark, t, toVersion = 2)
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 3L -> 30L))
  }

  test("restore re-stamps the target's schema across an evolution") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L)).toDF("id", "n").coalesce(1), t, recordSchema = true)
    Snapshots.commitAppend(Seq((2L, 20L, "x")).toDF("id", "n", "tag").coalesce(1), t,
      recordSchema = true)
    assert(Snapshots.readAt(spark, t).columns.toSet === Set("id", "n", "tag"))
    Snapshots.restore(spark, t, toVersion = 1)
    assert(Snapshots.readAt(spark, t).columns.toSet === Set("id", "n"))
  }

  test("tags pin versions immutably; vacuum keeps tagged files; bad names rejected") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t, recordSchema = true)
    Snapshots.commitAppend(df(6 to 9), t, recordSchema = true)
    assert(Snapshots.tag(spark, t, "v1-curated", Some(1)) === 1L)
    assert(Snapshots.tag(spark, t, "latest") === 2L) // default = current
    assert(Snapshots.tags(spark, t) === Map("v1-curated" -> 1L, "latest" -> 2L))
    assert(Snapshots.readTag(spark, t, "v1-curated").count() === 5)
    intercept[IllegalArgumentException] { Snapshots.tag(spark, t, "latest", Some(1)) }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, t, "no/slash") }
    intercept[IllegalArgumentException] { Snapshots.tag(spark, t, "ghost", Some(7)) }
    intercept[IllegalArgumentException] { Snapshots.readTag(spark, t, "missing") }
    // a tagged version's files survive vacuum like any committed version's
    Snapshots.compact(spark, t)
    assert(Snapshots.vacuum(spark, t).isEmpty)
    assert(Snapshots.readTag(spark, t, "v1-curated").as[Long].collect().toSet
      === (1L to 5L).toSet)
  }

  test("compactSmall binpacks only the small tail; big files stay byte-identical") {
    val t = tmpTable()
    // one big file (1000 rows), six tiny ones
    Snapshots.commitAppend(df(1 to 1000), t, recordSchema = true, statsCols = Seq("id"))
    val big = Snapshots.liveFiles(spark, t)
    (1 to 6).foreach(i => Snapshots.commitAppend(
      df(1000 + i to 1000 + i).coalesce(1), t, recordSchema = true, statsCols = Seq("id")))
    val bigBytes = big.map(p =>
      new java.io.File(new java.net.URI(p).getPath) -> 0).map(_._1.length()).sum
    val bigMtimes = big.map(p => new java.io.File(new java.net.URI(p).getPath).lastModified())
    val r = Snapshots.compactSmall(spark, t, smallBytes = bigBytes / big.size,
      targetBytes = Long.MaxValue, statsCols = Seq("id"))
    assert(r.packed === 6 && r.filesAfter === 1 && r.untouched === big.size)
    assert(Snapshots.readAt(spark, t).count() === 1006)
    // untouched files were never rewritten
    assert(big.map(p => new java.io.File(new java.net.URI(p).getPath).lastModified())
      === bigMtimes)
    // the rewritten tail regained zone-map stats
    assert(Snapshots.fileStats(spark, t).exists(st =>
      st.column == "id" && st.min.toLong == 1001 && st.max.toLong == 1006))
    // fewer than 2 small files = nothing to gain, no commit
    val r2 = Snapshots.compactSmall(spark, t, smallBytes = 1, targetBytes = Long.MaxValue)
    assert(r2.version === r.version && r2.packed === 0)
  }

  test("compactSmall preserves live MoR deletes without folding them") {
    val t = tmpTable()
    (0 until 4).foreach(i => Snapshots.commitAppend(
      Seq((i.toLong, i * 10L)).toDF("id", "v").coalesce(1), t, recordSchema = true))
    Snapshots.deleteWhereMor(spark, t, col("id") === 2L, keys = Seq("id"))
    val r = Snapshots.compactSmall(spark, t, smallBytes = Long.MaxValue,
      targetBytes = Long.MaxValue)
    assert(r.packed === 4 && r.filesAfter === 1)
    // dv still live (not folded), still suppressing at read
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet
      === Set(0L, 1L, 3L))
    // a later full compact folds it
    Snapshots.compact(spark, t)
    assert(Snapshots.liveDvFiles(spark, t).isEmpty)
    assert(Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet
      === Set(0L, 1L, 3L))
  }

  test("expireVersions bounds history: reads above the horizon unchanged, below reject, vacuum reclaims") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t, recordSchema = true, statsCols = Seq("id"))
    Snapshots.commitAppend(df(11 to 15), t, recordSchema = true, statsCols = Seq("id"))
    Snapshots.compact(spark, t)                                   // v3: v1/v2 files now historical
    Snapshots.commit(spark, t, adds = Nil, removes = Nil, notes = Seq("ledger-epoch-1")) // v4
    Snapshots.commitAppend(df(16 to 20), t, recordSchema = true, statsCols = Seq("id")) // v5
    val preReads = (3L to 5L).map(v => Snapshots.readAt(spark, t, Some(v))
      .as[Long].collect().toSet)
    val preStats = Snapshots.fileStats(spark, t).toSet
    val r = Snapshots.expireVersions(spark, t, keepFrom = 3)
    assert(r.expired === Seq(1L, 2L) && r.checkpointAt === 3L)
    // the horizon and everything above it resolve byte-identically
    assert((3L to 5L).map(v => Snapshots.readAt(spark, t, Some(v))
      .as[Long].collect().toSet) === preReads)
    // below the horizon: the ordinary unknown-version rejection
    intercept[IllegalArgumentException] { Snapshots.readAt(spark, t, Some(2)) }
    // metadata survives the expired commits: schema, note ledger, zone maps
    assert(Snapshots.tableSchema(spark, t).isDefined)
    assert(Snapshots.notes(spark, t).contains("ledger-epoch-1"))
    assert(Snapshots.fileStats(spark, t).toSet === preStats)
    assert(Snapshots.pruneFiles(spark, t, "id", "16", "20")._1.nonEmpty)
    // v1/v2's pre-compaction files are now unreferenced → vacuum food;
    // everything live stays
    val reclaimed = Snapshots.vacuum(spark, t)
    assert(reclaimed.nonEmpty)
    assert(Snapshots.readAt(spark, t).as[Long].collect().toSet === (1L to 20L).toSet)
    assert(Snapshots.readAt(spark, t, Some(3)).count() === 15)
  }

  test("expireVersions refuses to cross a pinned tag; proceeds once untagged") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t, recordSchema = true)
    Snapshots.commitAppend(df(6 to 9), t, recordSchema = true)
    Snapshots.tag(spark, t, "pinned", Some(1))
    intercept[IllegalArgumentException] { Snapshots.expireVersions(spark, t, 2) }
    // same call with the tag out of the doomed range is fine
    assert(Snapshots.expireVersions(spark, t, 1).expired === Seq.empty)
    intercept[IllegalArgumentException] { Snapshots.expireVersions(spark, t, 7) }
  }

  test("expireVersions carries live deletion vectors across the horizon") {
    val t = tmpTable()
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v").coalesce(1),
      t, recordSchema = true)
    Snapshots.deleteWhereMor(spark, t, col("id") === 2L, keys = Seq("id"))
    Snapshots.commitAppend(Seq((4L, 40L)).toDF("id", "v").coalesce(1), t,
      recordSchema = true)
    Snapshots.expireVersions(spark, t, keepFrom = 3)
    assert(Snapshots.liveDvFiles(spark, t).size === 1)
    assert(Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 3L, 4L))
    assert(Snapshots.vacuum(spark, t).isEmpty) // dv + data all still referenced
    assert(Snapshots.readAt(spark, t).select("id").as[Long].collect().toSet
      === Set(1L, 3L, 4L))
  }

  private def bloomTable(): String = {
    val t = tmpTable()
    // 4 files, keys deliberately UNCLUSTERED: md5 images interleave across
    // commits, so zone maps on ukey cannot skip anything
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        spark.range(i.toLong * 100, i * 100 + 100)
          .select(col("id"), md5(col("id").cast("string")).as("ukey"),
            (col("id") * 10).as("v")).coalesce(1),
        t, recordSchema = true)
    }
    t
  }

  test("bloom index: point lookup reads only might-contain files, parity with full scan") {
    val t = bloomTable()
    val r = Snapshots.buildBloomIndex(spark, t, "ukey", fpp = 0.001)
    assert(r.indexed === 4 && r.alreadyIndexed === 0)
    val probes = Seq(7L, 142L, 333L).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val got = Snapshots.readPoint(spark, t, "ukey", probes)
      .select("id").as[Long].collect().toSet
    assert(got === Set(7L, 142L, 333L))
    // a miss probe returns nothing and (at fpp 0.001) prunes everything
    assert(Snapshots.readPoint(spark, t, "ukey", Seq("no-such-key")).isEmpty)
    // incremental: a new commit is the only thing the next build touches
    Snapshots.commitAppend(
      spark.range(400, 450).select(col("id"), md5(col("id").cast("string")).as("ukey"),
        (col("id") * 10).as("v")).coalesce(1), t, recordSchema = true)
    val r2 = Snapshots.buildBloomIndex(spark, t, "ukey", fpp = 0.001)
    assert(r2.indexed === 1 && r2.alreadyIndexed === 4)
    assert(Snapshots.readPoint(spark, t, "ukey", probes.take(1)).count() === 1)
  }

  test("bloom index: unindexed files are conservatively read; nulls never match") {
    val t = bloomTable()
    Snapshots.buildBloomIndex(spark, t, "ukey")
    // a post-index commit has no bloom row → always a candidate, never wrong
    Snapshots.commitAppend(
      Seq((999L, "plainkey", 0L)).toDF("id", "ukey", "v").coalesce(1),
      t, recordSchema = true)
    assert(Snapshots.readPoint(spark, t, "ukey", Seq("plainkey"))
      .select("id").as[Long].collect().toSeq === Seq(999L))
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(null)).isEmpty)
  }

  test("bloom index: rebuild retires old sidecars (vacuum food); MoR deletes resolve") {
    val t = bloomTable()
    Snapshots.buildBloomIndex(spark, t, "ukey")
    val old = Snapshots.liveBloomFiles(spark, t)
    val probe = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    Snapshots.deleteWhereMor(spark, t, col("id") === 7L, keys = Seq("id"))
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe)).isEmpty)
    val r = Snapshots.buildBloomIndex(spark, t, "ukey", rebuild = true)
    assert(r.indexed === 4)
    assert(Snapshots.liveBloomFiles(spark, t).toSet.intersect(old.toSet) === Set.empty)
    // retired sidecars stay for time travel until their adding version
    // expires — then they are vacuum food
    assert(Snapshots.vacuum(spark, t).isEmpty)
    Snapshots.expireVersions(spark, t, Snapshots.currentVersion(spark, t))
    val reclaimed = Snapshots.vacuum(spark, t)
    assert(old.forall(p => reclaimed.contains(p)))
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe)).isEmpty)
  }

  test("restore reinstates the bloom-index live set with the content it covers") {
    val t = bloomTable()
    Snapshots.buildBloomIndex(spark, t, "ukey") // v5
    val indexed = Snapshots.liveBloomFiles(spark, t)
    Snapshots.buildBloomIndex(spark, t, "ukey", rebuild = true) // v6: retires v5's
    assert(Snapshots.liveBloomFiles(spark, t).toSet.intersect(indexed.toSet).isEmpty)
    Snapshots.restore(spark, t, toVersion = 5)
    assert(Snapshots.liveBloomFiles(spark, t).toSet === indexed.toSet)
    // and back to the pre-index world: no sidecars live
    Snapshots.restore(spark, t, toVersion = 4)
    assert(Snapshots.liveBloomFiles(spark, t).isEmpty)
    val probe = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe)).count() === 1)
  }

  test("bloom index survives expireVersions via the full-state checkpoint") {
    val t = bloomTable()
    Snapshots.buildBloomIndex(spark, t, "ukey") // v5
    Snapshots.commitAppend(
      spark.range(500, 510).select(col("id"), md5(col("id").cast("string")).as("ukey"),
        (col("id") * 10).as("v")).coalesce(1), t, recordSchema = true) // v6
    Snapshots.expireVersions(spark, t, keepFrom = 5)
    assert(Snapshots.liveBloomFiles(spark, t).nonEmpty)
    val probe = java.security.MessageDigest.getInstance("MD5")
      .digest("142".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe))
      .select("id").as[Long].collect().toSeq === Seq(142L))
    assert(Snapshots.vacuum(spark, t).isEmpty) // everything still referenced
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe)).count() === 1)
  }

  test("optimizeZorder clusters STRING dims by dictionary rank; string-side pruning works") {
    val t = tmpTable()
    // 4 files, every file holds every group: nothing prunable pre-optimize
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        spark.range(1000).filter(col("id") % 4 === i)
          .select(concat(lit("src"), (col("id") % 20).cast("string")).as("g"),
            (col("id") % 256).as("b"), col("id")).coalesce(1),
        t, recordSchema = true, statsCols = Seq("g", "b"))
    }
    val before = Snapshots.readAt(spark, t)
      .agg(count(lit(1)), sum(col("id"))).as[(Long, Long)].head()
    val preKept = Snapshots.pruneFiles(spark, t, "g", "src4", "src4")._1.size
    assert(preKept === 4) // the motivating failure: every file spans all groups
    val r = Snapshots.optimizeZorder(spark, t, Seq("g", "b"), targetFiles = 16, bits = 8)
    assert(r.filesBefore === 4 && r.filesAfter === 16)
    // content invariant
    assert(Snapshots.readAt(spark, t)
      .agg(count(lit(1)), sum(col("id"))).as[(Long, Long)].head() === before)
    // the string dim now prunes (dictionary rank clusters equal values)...
    val keptG = Snapshots.pruneFiles(spark, t, "g", "src4", "src4")._1.size
    assert(keptG < 16, s"string-dim pruning should skip files, kept $keptG")
    // ...and so does the numeric dim, and the pruned read loses nothing
    val keptB = Snapshots.pruneFiles(spark, t, "b", "16", "31")._1.size
    assert(keptB < 16, s"numeric-dim pruning should skip files, kept $keptB")
    assert(Snapshots.readPruned(spark, t, "g", "src4", "src4")
      .filter(col("g") === "src4").count() === 50)
  }

  test("TIMESTAMP AS OF: versionAt resolves manifest-recorded millis; below-earliest rejects") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t, recordSchema = true)
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(2) // ts lines are millisecond-precise — no 1.1 s mtime sleep
    Snapshots.commitAppend(df(11 to 15), t, recordSchema = true)
    assert(Snapshots.versionAt(spark, t, afterV1) === 1L)
    assert(Snapshots.versionAt(spark, t, System.currentTimeMillis()) === 2L)
    // a timestamp before any commit REJECTS (Delta/Iceberg contract): it
    // cannot be distinguished from an instant inside an expired span
    intercept[IllegalArgumentException] { Snapshots.versionAt(spark, t, 0L) }
    assert(Snapshots.readAsOf(spark, t, afterV1).count() === 10)
    assert(Snapshots.readAsOf(spark, t, System.currentTimeMillis()).count() === 15)
    // history carries the same instants, ascending
    val ts = Snapshots.history(spark, t).map(_.tsMillis)
    assert(ts.size === 2 && ts === ts.sorted && ts.forall(_ > 0))
  }

  test("expireOlderThan keeps the AS OF horizon resolvable; detail reports the state") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 10), t, recordSchema = true)
    Snapshots.commitAppend(df(11 to 12).coalesce(1), t, recordSchema = true)
    Thread.sleep(2)
    val ts = System.currentTimeMillis()
    Snapshots.commitAppend(df(13 to 15).coalesce(1), t, recordSchema = true)
    Snapshots.deleteWhereMor(spark, t, col("id") === 1L, keys = Seq("id"))
    Snapshots.tag(spark, t, "now")
    val r = Snapshots.expireOlderThan(spark, t, ts)
    // the newest version visible at ts (v2) is the horizon and survives
    assert(r.checkpointAt === 2L && r.expired === Seq(1L))
    assert(Snapshots.readAsOf(spark, t, ts).count() === 12)
    intercept[Exception] { Snapshots.readAt(spark, t, Some(1)) }
    val d = Snapshots.detail(spark, t)
    assert(d.version === 4L && d.files === 6 && d.smallFiles === 6)
    assert(d.dvFiles === 1 && d.dvKeys === 1L && d.bloomSidecars === 0)
    assert(d.versionsRetained === 3 && d.checkpoints === 1)
    assert(d.tags === Map("now" -> 4L) && d.schemaRecorded)
    // a table with no pre-ts history is a no-op
    assert(Snapshots.expireOlderThan(spark, t, 1L) === Snapshots.ExpireResult(Nil, 0L))
  }

  test("fastCount: recorded counts + exact fallback + dv deferral all agree with count()") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 100), t, recordSchema = true, recordRowCounts = true)
    assert(Snapshots.fastCount(spark, t) === 100L)
    // an uncounted commit falls back to scanning ONLY the uncounted files
    Snapshots.commitAppend(df(101 to 130), t)
    assert(Snapshots.fastCount(spark, t) === 130L)
    assert(Snapshots.fileStats(spark, t).count(_.column === Snapshots.RowsStat) > 0)
    // tombstone suppression is row-level: fastCount defers to the read
    Snapshots.deleteWhereMor(spark, t, col("id") === 5L, keys = Seq("id"))
    assert(Snapshots.fastCount(spark, t) === 129L)
    // maintenance rewrites drop the counts; the fallback stays exact
    Snapshots.compact(spark, t)
    assert(Snapshots.fastCount(spark, t) === 129L)
    // time travel counts the PAST version
    assert(Snapshots.fastCount(spark, t, Some(1)) === 100L)
  }

  test("expiry racing readers: above-horizon reads stable, doomed reads complete-or-reject") {
    val t = tmpTable()
    (1 to 30).foreach(i => Snapshots.commitAppend(df(i to i).coalesce(1), t,
      recordSchema = true))
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    @volatile var stop = false
    // current reads must never fail or change content while history expires
    val current = Future {
      var ok = true
      while (!stop) ok &= Snapshots.readAt(spark, t).count() == 30L
      ok
    }
    // a doomed version must never resolve PARTIALLY: its count is right
    // or the read errors loudly (unknown version / vanished manifest)
    val doomed = Future {
      var silentWrong = 0
      while (!stop)
        scala.util.Try(Snapshots.readAt(spark, t, Some(10)).count()).foreach { n =>
          if (n != 10L) silentWrong += 1
        }
      silentWrong
    }
    Thread.sleep(150)
    Snapshots.expireVersions(spark, t, keepFrom = 25)
    Thread.sleep(150)
    stop = true
    assert(Await.result(current, 60.seconds))
    assert(Await.result(doomed, 60.seconds) === 0)
    pool.shutdown()
    assert(Snapshots.readAt(spark, t).count() === 30L)
    intercept[Exception] { Snapshots.readAt(spark, t, Some(10)).count() }
  }

  test("commit publish is atomic: manifests appear complete, no temp residue") {
    val t = tmpTable()
    // hammer one table from 8 threads with a READER racing the writers:
    // under temp-file + hard-link publish a listed manifest is always
    // fully parseable, so the reader's live-set size only ever grows
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(9)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val writers = (1 to 8).map { w =>
      Future {
        var committed = false
        while (!committed)
          try { Snapshots.commit(spark, t, adds = Seq(s"f$w")); committed = true }
          catch { case _: Snapshots.ConcurrentCommitException => () }
      }
    }
    val reader = Future {
      var last = 0
      var monotone = true
      (1 to 200).foreach { _ =>
        val n = Snapshots.liveFiles(spark, t).size // throws on a partial manifest
        if (n < last) monotone = false
        last = n
      }
      monotone
    }
    assert(Await.result(reader, 60.seconds))
    Await.result(Future.sequence(writers), 60.seconds)
    pool.shutdown()
    assert(Snapshots.currentVersion(spark, t) === 8L)
    assert(Snapshots.liveFiles(spark, t).toSet === (1 to 8).map(w => s"f$w").toSet)
    // the publish leaves no temp files behind (winner or loser)
    val residue = new java.io.File(s"$t/_manifest").listFiles()
      .map(_.getName).filter(_.contains(".tmp."))
    assert(residue.isEmpty, residue.mkString(","))
  }

  test("a truncated manifest line is unparseable-not-fatal; intact lines still read") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 5), t)
    // hand-craft a v2 whose first line is truncated mid-path (no closing
    // quote) — impossible under atomic publish, but a reader must degrade
    // to ignoring the malformed line, not die mid-retry-loop
    val v1Files = Snapshots.liveFiles(spark, t).toSet
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_manifest/v0000000002.json"),
      s"""{"a":"add","p":"/trunca\n{"a":"add","p":"extra.parquet"}\n{"a":"add","p":"noclose""".getBytes("UTF-8"))
    assert(Snapshots.liveFiles(spark, t, Some(2)).toSet === v1Files + "extra.parquet")
  }

  test("a stale or partial checkpoint at the horizon is repaired in place; expiry proceeds") {
    val t = tmpTable()
    (1 to 3).foreach(i =>
      Snapshots.commitAppend(df(i * 10 to i * 10 + 1).coalesce(1), t,
        recordSchema = true, statsCols = Seq("id")))
    // a squatting pre-full-state checkpoint at the horizon: add lines only
    // (STALE live set — version 1's), no schema/stats/notes — exactly what
    // a crashed or legacy writer leaves. Before the repair path existed,
    // this file permanently blocked both checkpoint() and expireVersions()
    // at version 3 (vacuum never sweeps _manifest/c*.json).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_manifest/c0000000003.json"),
      Snapshots.liveFiles(spark, t, Some(1))
        .map(p => s"""{"a":"add","p":"$p"}""").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    // checkpointAt REWRITES-AND-REPLACES the damaged file (regenerable:
    // nothing below 3 is expired yet), re-verifies, and expiry anchors on it
    val r = Snapshots.expireVersions(spark, t, keepFrom = 3)
    assert(r.expired === Seq(1L, 2L) && r.checkpointAt === 3L)
    // the repaired checkpoint carries FULL state across the horizon:
    // live set, schema, zone maps — not the squatter's stale v1 set
    assert(Snapshots.readAt(spark, t).count() === 6L)
    assert(Snapshots.tableSchema(spark, t).isDefined)
    assert(Snapshots.pruneFiles(spark, t, "id", "30", "31")._1.size === 1)
    intercept[IllegalArgumentException] { Snapshots.readAt(spark, t, Some(2)) }
  }

  test("checkpoint repair invalidates the parsed-manifest cache (no stale entry survives the in-place rewrite)") {
    val t = tmpTable()
    (1 to 3).foreach(i =>
      Snapshots.commitAppend(df(i * 10 to i * 10 + 1).coalesce(1), t,
        recordSchema = true, statsCols = Seq("id")))
    val ckPath = s"$t/_manifest/c0000000003.json"
    // squatter: stale v1 live set, no schema/stats — same shape as the
    // repair test above; warm the cache ON the squatter first (that is
    // the dangerous state: a rewrite of identical length landing in the
    // same mtime granule would validate against this entry forever)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ckPath),
      Snapshots.liveFiles(spark, t, Some(1))
        .map(p => s"""{"a":"add","p":"$p"}""").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    // expiry's checkpoint verification parses (and caches) the squatter,
    // then repairs it in place — the repair must drop that cache entry
    // before republishing, or a same-length same-mtime-granule rewrite
    // would serve the squatter's parse forever
    Snapshots.expireVersions(spark, t, keepFrom = 3)
    // after the repair the cache must hold the REPAIRED full state for
    // this path (or nothing) — never the squatter's add-only parse
    val cached = Snapshots.cachedManifestLines(
      new org.apache.hadoop.fs.Path(ckPath).toString)
    assert(cached.forall(ls => ls.exists(_._1 == "schema")),
      s"stale squatter parse survived the in-place repair: $cached")
    // and readers resolve the repaired state
    assert(Snapshots.readAt(spark, t).count() === 6L)
  }

  test("notes: duplicates and ascending order survive checkpoint and expiry") {
    val t = tmpTable()
    Snapshots.commitAppend(df(1 to 2).coalesce(1), t, recordSchema = true,
      notes = Seq("a"))
    Snapshots.commitAppend(df(3 to 4).coalesce(1), t, notes = Seq("a"))
    Snapshots.commitAppend(df(5 to 6).coalesce(1), t, notes = Seq("b"))
    assert(Snapshots.notes(spark, t) === Seq("a", "a", "b"))
    Snapshots.checkpoint(spark, t)
    assert(Snapshots.notes(spark, t) === Seq("a", "a", "b"))
    Snapshots.expireVersions(spark, t, keepFrom = 2)
    assert(Snapshots.notes(spark, t) === Seq("a", "a", "b"))
    assert(Snapshots.retentionHorizon(spark, t) === 2L)
  }

  test("readPrunedRanges: conjunctive ranges intersect per-file zone maps") {
    val t = tmpTable()
    (0 until 4).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10).map(x => (x.toLong, (x % 4).toLong))
          .toDF("id", "g").coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"))
    }
    // two ranges on the statted column AND together: only file 2 overlaps
    val r = Snapshots.readPrunedRanges(spark, t,
      Seq(("id", "11", "30"), ("id", "15", "18")))
    assert(r.select(input_file_name()).distinct().count() === 1L)
    assert(r.filter(col("id").between(15, 18)).count() === 4L)
    // a range on an un-statted column prunes nothing (conservative)...
    assert(Snapshots.readPrunedRanges(spark, t, Seq(("g", "0", "0")))
      .select(input_file_name()).distinct().count() === 4L)
    // ...and no ranges reads everything
    assert(Snapshots.readPrunedRanges(spark, t, Nil).count() === 40L)
  }

  test("OPTIMIZE and binpack refresh the bloom index in the same commit") {
    val t = tmpTable()
    (0 until 8).foreach { i =>
      Snapshots.commitAppend(
        (i * 10 + 1 to i * 10 + 10)
          .map(x => (x.toLong, s"k${x * 7919 % 997}", x % 4))
          .toDF("id", "ukey", "b").coalesce(1),
        t, recordSchema = true, statsCols = Seq("id"))
    }
    Snapshots.buildBloomIndex(spark, t, "ukey", fpp = 0.001)
    val probe = s"k${33 * 7919 % 997}"
    assert(Snapshots.bloomPrune(spark, t, "ukey", Seq(probe))._1.size <= 2)
    // a z-order rewrite retires every file — the index must keep pruning
    // IMMEDIATELY, with the old sidecars retired in the same commit
    Snapshots.optimizeZorder(spark, t, "id", "b", targetFiles = 8)
    val (kept, skipped) = Snapshots.bloomPrune(spark, t, "ukey", Seq(probe))
    assert(kept.size + skipped.size === 8 && kept.size <= 2,
      s"post-OPTIMIZE bloom should prune: kept ${kept.size} of 8")
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe))
      .select("id").as[Long].collect().toSeq === Seq(33L))
    assert(Snapshots.liveBloomFiles(spark, t).nonEmpty)
    // binpack of a small tail: new files covered, survivors keep coverage
    Snapshots.compactSmall(spark, t, smallBytes = 1L << 40, targetBytes = 1L << 40)
    val (kept2, skipped2) = Snapshots.bloomPrune(spark, t, "ukey", Seq(probe))
    assert(kept2.size <= 1 && kept2.size + skipped2.size ===
      Snapshots.liveFiles(spark, t).size)
    assert(Snapshots.readPoint(spark, t, "ukey", Seq(probe))
      .select("id").as[Long].collect().toSeq === Seq(33L))
  }

  test("tag-vs-expiry race: a tag() that returned never dangles across a completed expiry") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    import scala.util.Try
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    (1 to 5).foreach { _ =>
      val t = tmpTable()
      (1 to 3).foreach(i =>
        Snapshots.commitAppend(df(i * 10 to i * 10 + 1).coalesce(1), t,
          recordSchema = true))
      val tagF = Future(Try(Snapshots.tag(spark, t, "pin", Some(2L))))
      val expF = Future(Try(Snapshots.expireVersions(spark, t, keepFrom = 3L)))
      val tagR = Await.result(tagF, 60.seconds)
      val expR = Await.result(expF, 60.seconds)
      // the sealed invariant: both succeeding is impossible — the expiry's
      // re-scan sees the tag (expiry aborts) or the tag's post-create floor
      // read sees the horizon (tag self-rejects)
      assert(!(tagR.isSuccess && expR.isSuccess),
        "tag pinned v2 AND expiry deleted it")
      if (tagR.isSuccess) // tag returned → it must resolve, forever
        assert(Snapshots.readTag(spark, t, "pin").count() === 4L)
      if (expR.isSuccess) // expiry completed → no tag claims the dead version
        assert(!Snapshots.tags(spark, t).contains("pin"))
    }
    pool.shutdown()
  }
}
