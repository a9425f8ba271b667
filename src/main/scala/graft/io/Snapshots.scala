package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned snapshot manifest over parquet data files — the dataset-
  * versioning layer a continuous training-data pipeline needs ("which
  * exact corpus trained run 47?", "diff yesterday's curation against
  * today's", "roll back the bad ingest"): a transaction-log shape
  * (commit files + checkpoints) reduced to the operations this engine
  * uses, built on the same object-store discipline as the incremental
  * tracker ([[graft.incremental.Incremental]]).
  *
  * Layout under a table root:
  * {{{
  *   <table>/data/<writer-chosen dirs>/part-*.parquet   data, written FIRST
  *   <table>/_manifest/v0000000001.json                 one commit = one file
  *   <table>/_manifest/c0000000007.json                 checkpoint of the live set
  * }}}
  *
  * Safety properties:
  *  - A commit is ONE atomic publish of a fully-written version-named
  *    file — content goes to a temp file first, then appears under the
  *    final name in a single atomic step (local: hard link; HDFS: rename),
  *    so a concurrent reader sees each manifest either absent or complete,
  *    and two writers racing to the same version lose deterministically
  *    ([[ConcurrentCommitException]]; the loser re-reads state and retries
  *    with the next version). The guarantee holds on filesystems with an
  *    atomic exclusive-create/rename (local POSIX, HDFS); stock S3A has
  *    neither — S3 deployments need Hadoop 3.4.2+ conditional writes
  *    (If-None-Match PUT) or a commit coordinator, the same requirement
  *    every manifest-log table format documents.
  *  - Data files are written BEFORE the commit that references them: a
  *    crash between the two leaves unreferenced garbage (reclaimed by
  *    [[vacuum]]), never a manifest pointing at missing data.
  *  - Nothing live is ever renamed or deleted: commits and checkpoints are
  *    create-once objects; [[vacuum]] touches only files no version
  *    references.
  *  - Readers of a version see an immutable file set forever (time
  *    travel); version resolution replays the checkpoint + commit tail,
  *    so read cost is O(commits since last checkpoint), not O(history).
  *
  * Driver state is metadata-sized throughout: the live set is a path list
  * (the same order as a transaction log's file inventory), never data.
  */
object Snapshots {

  final case class ConcurrentCommitException(table: String, version: Long)
      extends RuntimeException(
        s"version $version of $table was committed concurrently; re-read and retry")

  /** Per-file zone-map entry recorded in the manifest at commit time:
    * min/max of one column over one data file, values as strings, compared
    * under `dtype` ("bigint" / "double" / everything-else-lexicographic).
    * Files whose recorded range cannot intersect a predicate's range are
    * skipped without opening them — the manifest-level analog of parquet
    * row-group stats, and what makes [[deleteWhere]] touch only the files
    * that can hold matching rows. */
  final case class FileStat(path: String, column: String, dtype: String,
                            min: String, max: String)

  /** Outcome of a [[deleteWhere]]: the committed version, the files that
    * were rewritten (they contained matching rows), and the count of live
    * files left byte-identical on disk. */
  final case class DeleteResult(version: Long, rewritten: Seq[String],
                                untouched: Int)

  /** Outcome of a [[deleteWhereMor]]: the committed version, the count of
    * tombstoned keys, and the dv file committed (None when nothing
    * matched — no commit happens). `dataFilesRewritten` is always 0 by
    * construction; it exists so audits of the two delete paths read the
    * same way. */
  final case class MorDeleteResult(version: Long, tombstoned: Long,
                                   dvFile: Option[String]) {
    val dataFilesRewritten: Int = 0
  }

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every snapshot DATA-FILE write goes through this. The table's
    * atomicity point is the manifest publish ([[commit]]'s create-
    * exclusive v-file) — data files are invisible until it lands — so
    * the write itself needs no two-phase directory commit:
    * FileOutputCommitter algorithm 2 renames each task's output straight
    * into the destination (dropping the O(files) driver-side merge pass
    * of job commit), and the _SUCCESS marker is skipped (every reader
    * resolves files through the manifest, never through markers; the
    * part listings filter to `part-*` regardless). Partial files from a
    * failed job stay unreferenced — [[vacuum]] food, exactly like a lost
    * optimistic writer. */
  private[graft] def writeData(df: DataFrame, dir: String,
                               overwrite: Boolean = false): Unit = {
    val w = df.write
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    (if (overwrite) w.mode("overwrite") else w).parquet(dir)
  }

  /** The part files of a freshly written data dir, WITH their listing
    * status — callers pass the lengths to [[commit]] (`addLens`) so the
    * byte stats never re-list the directory. */
  private[graft] def listParts(f: FileSystem, dir: String)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))

  private[graft] def lensOf(sts: Seq[org.apache.hadoop.fs.FileStatus]): Map[String, Long] =
    sts.map(s => s.getPath.toString -> s.getLen).toMap

  /** Exact row count of freshly written parquet files from their FOOTERS —
    * O(#files) metadata reads, no Spark job (the writer already counted
    * every row group). None when any footer is unreadable (caller falls
    * back to a scan count). */
  private def footerRowCount(spark: SparkSession, parts: Seq[String]): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    var n = 0L
    for (p <- parts) {
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.forEach(b => n += b.getRowCount)
        finally r.close()
      } catch { case _: Exception => return None }
    }
    Some(n)
  }

  private def manifestDir(table: String) = s"$table/_manifest"
  private val CommitFile = """v(\d{10})\.json""".r
  private val CheckpointFile = """c(\d{10})\.json""".r
  private val StatSep = "\u0001"

  /** JSON string escape (the manifest is line-oriented JSON; paths may
    * contain quotes/backslashes/control chars). */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Minimal JSON-line field extraction for our own two-field records —
    * no external parser dependency; handles the escapes [[jq]] emits. */
  private def junq(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' =>
          i += 1
          s.charAt(i) match {
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case c   => sb.append(c)
          }
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def parseLine(line: String): Option[(String, String)] = {
    // {"a":"add","p":"<escaped>"}
    val t = line.trim
    if (t.isEmpty) None
    else {
      val a = t.indexOf("\"a\":\"")
      val p = t.indexOf("\"p\":\"")
      if (a < 0 || p < 0) None
      else {
        val aEnd = t.indexOf('"', a + 5)
        val rest = t.substring(p + 5)
        // path value ends at the first UNESCAPED quote
        var i = 0
        var end = -1
        while (end < 0 && i < rest.length) {
          rest.charAt(i) match {
            case '\\' => i += 2
            case '"'  => end = i
            case _    => i += 1
          }
        }
        // no terminating quote = a truncated/partial line (can only happen
        // on a filesystem without atomic publish) — unparseable, not fatal
        if (aEnd < 0 || end < 0) None
        else Some((t.substring(a + 5, aEnd), junq(rest.substring(0, end))))
      }
    }
  }

  private def readLines(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8).split('\n').toSeq
    finally in.close()
  }

  /** Parsed-manifest cache. Every metadata accessor (live set, schema,
    * properties, stats, notes, history) replays the manifest log from
    * scratch, and a multi-statement SQL session replays it per statement —
    * profiled at sf0.1, the lifecycle fixtures spend ~half their wall in
    * driver-side gaps of which repeated manifest open+read+parse is a
    * steady component, and on an object store each re-read is a GET.
    * Commit manifests are write-once (create-exclusive publish, only
    * expiry ever deletes them), so their parsed form is cacheable;
    * checkpoint files can be REWRITTEN in place (the damaged-checkpoint
    * repair path), so entries validate against (length, mtime) before
    * being served — one cheap metadata call instead of open+read+parse.
    * The cache is capacity-bounded and cleared wholesale on overflow
    * (manifests are KBs; 64 Ki entries bounds it at tens of MB). */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Seq[(String, String)])]()

  /** Test hook: the cached parse for a manifest path, if any — pins that
    * in-place rewrites (checkpoint repair) never leave a stale entry
    * behind ([[checkpointAt]]'s explicit invalidation). */
  private[io] def cachedManifestLines(path: String): Option[Seq[(String, String)]] =
    Option(manifestCache.get(path)).map(_._3)

  private def parsedManifest(f: FileSystem, p: Path): Seq[(String, String)] = {
    val st = f.getFileStatus(p) // same FileNotFoundException contract as open()
    val key = p.toString
    val hit = manifestCache.get(key)
    if (hit != null && hit._1 == st.getLen && hit._2 == st.getModificationTime)
      hit._3
    else {
      val parsed = readLines(f, p).flatMap(parseLine)
      if (manifestCache.size > 65536) manifestCache.clear()
      manifestCache.put(key, (st.getLen, st.getModificationTime, parsed))
      parsed
    }
  }

  /** Create-exclusive PUBLISH — THE commit primitive. The manifest must be
    * either ABSENT or COMPLETE: a concurrent reader that lists the new
    * version mid-write and replays an empty/partial v-file would derive a
    * wrong live set, so creating the file and then streaming bytes into it
    * is not enough. Both paths therefore write the full content to a
    * temp file first and publish it under the final name atomically:
    *
    *  - local: NIO `createLink(target, tmp)` — a hard link is one atomic
    *    directory entry (fails if target exists = exclusive; the entry
    *    points at the already-complete inode = never partial);
    *  - HDFS (and any Hadoop FS with atomic rename): `rename(tmp, target)`
    *    with overwrite=false — atomic at the namenode, fails if the
    *    target exists.
    *
    * S3 caveat: stock S3A rename is copy+delete (non-atomic) and
    * create-exclusive is HEAD-then-PUT (check-then-act), so the
    * multi-writer guarantee does NOT hold on S3 as written — it needs
    * Hadoop 3.4.2+ conditional writes (`fs.s3a.create.conditional`,
    * If-None-Match PUT) or an external commit coordinator, the same
    * requirement every manifest-log table format documents for S3.
    *
    * Returns false ONLY when the target already exists (a lost create
    * race — benign everywhere this is called). A genuine I/O failure
    * PROPAGATES: a caller that read false-means-exists would otherwise
    * mistake a failed publish for a completed one ([[expireVersions]]
    * deleting history against a checkpoint that never landed was exactly
    * that bug). */
  private def writeExclusive(f: FileSystem, p: Path, lines: Seq[String]): Boolean = {
    val bytes = (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(nio.getParent)
      val tmp = nio.resolveSibling(
        s".${nio.getFileName}.tmp.${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, bytes) // temp write failure = genuine, propagates
      try {
        java.nio.file.Files.createLink(nio, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          // some filesystems surface the lost link race as a bare
          // IOException; target-present = race, target-absent = failure
          if (java.nio.file.Files.exists(nio)) false else throw e
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val tmp = new Path(p.getParent,
        s".${p.getName}.tmp.${java.util.UUID.randomUUID()}")
      // the temp name is UUID-unique: nothing can race it, so any failure
      // creating/writing it is genuine and propagates
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      try {
        val renamed =
          try f.rename(tmp, p)
          catch { case _: java.io.IOException => false }
        if (renamed) true
        else if (f.exists(p)) false // lost the publish race
        else throw new java.io.IOException(
          s"atomic publish of $p failed: rename returned false with no existing target")
      } finally { try f.delete(tmp, false) catch { case _: java.io.IOException => () } }
    }
  }

  /** All committed versions, ascending (version 0 = the empty table,
    * implicit). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case CommitFile(v) => Some(v.toLong)
      case _             => None
    }).sorted
  }

  def currentVersion(spark: SparkSession, table: String): Long =
    versions(spark, table).lastOption.getOrElse(0L)

  /** Append one commit: `adds`/`removes` are data-file paths (absolute or
    * table-relative — they are opaque to the manifest). Returns the new
    * version. `baseVersion` is the optimistic-concurrency token: pass the
    * version the writer RESOLVED ITS READS AT and the commit lands as
    * base+1 or throws [[ConcurrentCommitException]] if any other writer
    * got there first (re-read, re-derive, retry). Omitted, the base is
    * re-resolved at commit time — last-writer-wins append, safe only for
    * add-only writers. */
  def commit(spark: SparkSession, table: String,
             adds: Seq[String], removes: Seq[String] = Nil,
             baseVersion: Option[Long] = None,
             schemaJson: Option[String] = None,
             stats: Seq[FileStat] = Nil,
             notes: Seq[String] = Nil,
             dvAdds: Seq[String] = Nil,
             bloomAdds: Seq[String] = Nil,
             props: Seq[(String, Option[String])] = Nil,
             addLens: Map[String, Long] = Map.empty): Long = {
    val f = fs(spark, table)
    f.mkdirs(new Path(manifestDir(table)))
    val next = baseVersion.getOrElse(currentVersion(spark, table)) + 1
    // every added data file gets a __bytes stat recorded AT COMMIT TIME
    // (one listStatus per write dir — writers put a commit's parts in one
    // directory, so this is ~1 metadata RPC, the Iceberg file-size-in-
    // manifest contract; callers that already LISTED the fresh dir pass
    // the lengths through `addLens` and skip even that one call). The SQL
    // scan's SupportsReportStatistics sums these so join planning sees
    // real sizes (auto-broadcast of small tables) without touching data
    // files. A missing listing entry just skips the stat — sizes are an
    // estimate surface, never correctness.
    val (knownAdds, unknownAdds) = adds.partition(addLens.contains)
    val sizeStats: Seq[FileStat] =
      knownAdds.map { p =>
        val len = addLens(p).toString
        FileStat(p, BytesStat, "bigint", len, len)
      } ++
      unknownAdds.groupBy(p => new Path(p).getParent).toSeq.flatMap { case (dir, ps) =>
        val byName = ps.map(p => new Path(p).getName -> p).toMap
        try f.listStatus(dir).toSeq
          .filter(s => s.isFile && byName.contains(s.getPath.getName))
          .map { s =>
            val len = s.getLen.toString
            FileStat(byName(s.getPath.getName), BytesStat, "bigint", len, len)
          }
        catch { case _: java.io.IOException => Nil }
      }
    // the schema/stat/note lines reuse the (a, p) line shape; liveFiles'
    // add/remove match ignores them, referencedFiles treats the payloads
    // as never-matching "paths" — both harmless by construction. Stat
    // fields ride in one U+0001-separated payload (jq escapes control
    // chars), so stat values must not themselves contain U+0001. Notes
    // are opaque writer-chosen strings riding IN the transaction —
    // the idempotence ledger for replayed streaming merges ([[notes]]).
    // "dv" lines add DELETION-VECTOR files (key tombstones, see
    // [[deleteWhereMor]]); they retire through the same "remove" action
    // as data files (paths are unique, so the shared action is safe).
    // the commit's wall-clock timestamp rides IN the manifest ("ts" line):
    // [[versionAt]]/TIMESTAMP AS OF resolve from it at millisecond
    // precision on every filesystem, instead of from the manifest object's
    // mtime (second-granular on local fs, undefined on object stores).
    // Replay readers ignore unknown actions, so old manifests (no ts line,
    // resolved by mtime fallback) and new ones coexist.
    val lines =
      Seq(s"""{"a":"ts","p":${jq(System.currentTimeMillis().toString)}}""") ++
        schemaJson.map(s => s"""{"a":"schema","p":${jq(s)}}""").toSeq ++
        adds.map(p => s"""{"a":"add","p":${jq(p)}}""") ++
        removes.map(p => s"""{"a":"remove","p":${jq(p)}}""") ++
        dvAdds.map(p => s"""{"a":"dv","p":${jq(p)}}""") ++
        bloomAdds.map(p => s"""{"a":"bloom","p":${jq(p)}}""") ++
        (stats ++ sizeStats).map(st => s"""{"a":"stat","p":${jq(
          Seq(st.path, st.column, st.dtype, st.min, st.max).mkString(StatSep))}}""") ++
        notes.map(s => s"""{"a":"note","p":${jq(s)}}""") ++
        // TABLE PROPERTIES ride the same line shape: a "prop" payload of
        // `key<SEP>value` sets, bare `key` unsets; replay is last-wins
        // ([[tableProperties]]). One more append-only metadata stream —
        // time travel sees the properties AS OF each version for free.
        props.map { case (k, v) =>
          require(k.nonEmpty && !k.contains(StatSep) &&
            v.forall(!_.contains(StatSep)),
            s"table property key/value must be non-empty and free of U+0001: $k")
          s"""{"a":"prop","p":${jq(v.fold(k)(x => s"$k$StatSep$x"))}}"""
        }
    val path = new Path(f"${manifestDir(table)}/v$next%010d.json")
    if (!writeExclusive(f, path, lines)) throw ConcurrentCommitException(table, next)
    // pre-populate the parsed cache: the very next statement's metadata
    // replay re-reads this fresh manifest otherwise (one read+parse per
    // commit saved; validation still goes through getFileStatus)
    try {
      val st = f.getFileStatus(path)
      manifestCache.put(path.toString,
        (st.getLen, st.getModificationTime, lines.flatMap(parseLine)))
    } catch { case _: java.io.IOException => () }
    next
  }

  /** Write `df` as a new data directory under the table and commit it as
    * one transaction (add-only). `recordSchema` additionally stamps the
    * commit with `df`'s schema — the SCHEMA EVOLUTION hook: a later commit
    * may stamp a WIDER schema (new nullable columns); [[readAt]] then
    * resolves every version under the schema recorded AS OF that version,
    * so time travel sees the old shape and current reads see old files
    * null-padded to the new one. Returns the new version. */
  /** Reserved stat "column" carrying a file's exact ROW COUNT (min = max
    * = count, dtype bigint) — what makes [[fastCount]] metadata-only. A
    * real column can never collide: `__rows` is not a legal stats target
    * (computeStats is called with schema column names). */
  val RowsStat = "__rows"

  /** Reserved stat "column" carrying a file's exact ON-DISK BYTE SIZE
    * (min = max = length, dtype bigint), recorded by [[commit]] for every
    * added data file. Powers the SQL catalog's `SupportsReportStatistics`
    * (pruned-candidate byte sums → real broadcast decisions) the way
    * Iceberg manifests carry `file_size_in_bytes`. Same non-collision
    * argument as [[RowsStat]]. */
  val BytesStat = "__bytes"

  /** Stat pseudo-columns that are NOT schema columns — never legal
    * inputs to [[computeStats]]'s min/max scan. */
  def reservedStat(c: String): Boolean = c == RowsStat || c == BytesStat

  def commitAppend(df: DataFrame, table: String,
                   recordSchema: Boolean = false,
                   statsCols: Seq[String] = Nil,
                   notes: Seq[String] = Nil,
                   recordRowCounts: Boolean = false,
                   propsOf: Seq[String] => Seq[(String, Option[String])] =
                     _ => Nil,
                   baseVersion: Option[Long] = None): Long = {
    val spark = df.sparkSession
    val dir = s"$table/data/${java.util.UUID.randomUUID().toString}"
    // CHECK constraints ride the write job itself ([[Constraints
    // .observed]]) and gate between data write and manifest commit: a
    // violation aborts with the files unreferenced (vacuum food) — same
    // abort point as the old read-back pass, one O(change) read cheaper
    val (inst, check) = Constraints.observed(spark, table, df, "appended")
    writeData(inst, dir)
    check()
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    commit(spark, table, adds = parts, baseVersion = baseVersion,
      schemaJson = if (recordSchema) Some(df.schema.json) else None,
      // propsOf sees the freshly written parts — the identity-watermark
      // hook (a caller deriving property updates from the written data)
      props = propsOf(parts),
      stats = computeStats(spark, dir, parts, statsCols,
        withRowCounts = recordRowCounts),
      notes = notes, addLens = lensOf(partsSt))
  }

  /** COUNT(*) from manifest metadata — zero data files opened for every
    * file whose commit recorded a row count (`recordRowCounts`), an exact
    * scan-count fallback for the rest (the result is always exact; the
    * recorded fraction is just free). With live deletion vectors the
    * count defers to the dv-resolved read — tombstone suppression is a
    * row-level fact metadata can't see. At 100 TB a row-counted table
    * answers COUNT(*) from one manifest replay. */
  def fastCount(spark: SparkSession, table: String,
                version: Option[Long] = None): Long = {
    val v = version.getOrElse(currentVersion(spark, table))
    if (liveDvFiles(spark, table, Some(v)).nonEmpty)
      return readAt(spark, table, Some(v)).count()
    val live = liveFiles(spark, table, Some(v))
    if (live.isEmpty) return 0L
    val counted = fileStats(spark, table, Some(v))
      .filter(_.column == RowsStat).map(st => st.path -> st.min.toLong).toMap
    val missing = live.filterNot(counted.contains)
    val scanned =
      if (missing.isEmpty) 0L
      else schemaRead(spark, table, Some(v), missing).count()
    live.flatMap(counted.get).sum + scanned
  }

  /** Per-file min/max of `statsCols` over the freshly written `dir` — ONE
    * column-pruned scan grouped by `input_file_name()`, collected at
    * O(#files × #cols) (metadata-sized, like the live set itself).
    * Scan-file URIs are matched back to the listed part paths by file
    * name: Spark part names embed the write job's UUID, so they are
    * unique across the table's lifetime. All-null files emit no stat
    * (conservatively unprunable). `withRowCounts` folds the per-file
    * exact row count ([[RowsStat]]) into the SAME aggregation pass —
    * previously a second O(written files) scan job per commit; every
    * commit that records both now reads its fresh files once. */
  private[graft] def computeStats(spark: SparkSession, dir: String,
                                  parts: Seq[String],
                                  statsCols: Seq[String],
                                  withRowCounts: Boolean = false): Seq[FileStat] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    if (parts.isEmpty || (statsCols.isEmpty && !withRowCounts)) return Nil
    val raw0 = spark.read.parquet(dir)
    // inherited stat columns may name a column the rewrite no longer
    // carries (ALTER DROP COLUMN): skip them, never throw
    val present = raw0.schema.fieldNames.toSet
    val keep = statsCols.filter(present)
    if (keep.isEmpty && !withRowCounts) return Nil
    // METADATA-ONLY fast path (guide §6 — the Iceberg manifest contract):
    // the parquet writer already recorded per-row-group min/max and row
    // counts in the file FOOTERS, so for dtypes whose footer values render
    // identically to the scan's `cast AS STRING` (integrals, float/double,
    // date) the stats pass needs no Spark job and re-reads no data —
    // O(#files) footer reads instead of an O(written bytes) scan per
    // commit. Strings (footer min/max may be truncated), timestamps
    // (session-zone rendering), decimals, and any footer with missing or
    // NaN-polluted statistics fall back to the exact scan pass.
    footerStats(spark, raw0.schema, parts, keep, withRowCounts) match {
      case Some(st) => st
      case None     => computeStatsOn(spark, raw0, parts, keep, withRowCounts)
    }
  }

  /** [[computeStats]]'s footer fast path: Some(stats) when EVERY requested
    * column of every part file has usable footer statistics of a safely
    * renderable dtype, None → caller falls back to the scan. Rendering
    * matches the scan pass's `cast(col AS STRING)` exactly for the
    * accepted dtypes (Long/Int/Short/Byte → decimal string, Double/Float
    * → java toString, Date → ISO local date), so pruning comparisons see
    * identical values either way. */
  private def footerStats(spark: SparkSession, schema: StructType,
                          parts: Seq[String], statsCols: Seq[String],
                          withRowCounts: Boolean): Option[Seq[FileStat]] = {
    import org.apache.spark.sql.types._
    val safe = statsCols.forall(c => schema(c).dataType match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType | DateType => true
      case _ => false
    })
    if (!safe) return None
    val conf = spark.sparkContext.hadoopConfiguration
    def render(dt: DataType, v: Any): Option[String] = (dt, v) match {
      case (LongType, x: java.lang.Long)       => Some(x.toString)
      case (IntegerType | ShortType | ByteType, x: java.lang.Integer) =>
        Some(x.toString)
      case (DoubleType, x: java.lang.Double) =>
        if (x.isNaN) None else Some(x.toString)
      case (FloatType, x: java.lang.Float) =>
        if (x.isNaN) None else Some(x.toString)
      case (DateType, x: java.lang.Integer) =>
        Some(java.time.LocalDate.ofEpochDay(x.longValue()).toString)
      case _ => None
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStat]
    for (p <- parts) {
      val footer =
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(p), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter finally r.close()
        } catch { case _: Exception => return None }
      val blocks = footer.getBlocks
      if (withRowCounts) {
        var n = 0L
        blocks.forEach(b => n += b.getRowCount)
        out += FileStat(p, RowsStat, "bigint", n.toString, n.toString)
      }
      for (c <- statsCols) {
        val dt = schema(c).dataType
        var lo: Any = null; var hi: Any = null
        var nonNull = 0L; var usable = true
        blocks.forEach { b =>
          val cc = b.getColumns.stream()
            .filter(x => x.getPath.toDotString == c).findFirst()
          if (!cc.isPresent) usable = false
          else {
            val st = cc.get.getStatistics
            if (st == null || !st.isNumNullsSet) usable = false
            else {
              val nn = cc.get.getValueCount - st.getNumNulls
              if (nn > 0) {
                if (!st.hasNonNullValue) usable = false
                else {
                  nonNull += nn
                  val mn = st.genericGetMin; val mx = st.genericGetMax
                  if (lo == null ||
                      st.comparator.asInstanceOf[java.util.Comparator[Any]]
                        .compare(mn, lo) < 0) lo = mn
                  if (hi == null ||
                      st.comparator.asInstanceOf[java.util.Comparator[Any]]
                        .compare(mx, hi) > 0) hi = mx
                }
              }
            }
          }
        }
        if (!usable) return None
        if (nonNull > 0) {
          (render(dt, lo), render(dt, hi)) match {
            case (Some(a), Some(b))
                if !a.contains(StatSep) && !b.contains(StatSep) =>
              out += FileStat(p, c, dt.simpleString, a, b)
            case _ => return None // NaN or unrenderable → exact scan pass
          }
        } // all-null column in this file: no stat (conservatively unprunable)
      }
    }
    Some(out.toSeq)
  }

  private def computeStatsOn(spark: SparkSession, raw: DataFrame,
                             parts: Seq[String],
                             statsCols: Seq[String],
                             withRowCounts: Boolean = false): Seq[FileStat] = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min}
    // session-zoned TIMESTAMP stats render under the WRITE session's time
    // zone (`cast AS STRING`); stamp that zone into the dtype so a READ
    // session in a different zone declines the comparison instead of
    // producing false-negative prunes ([[statZoneOk]]). Legacy plain
    // "timestamp" stats predate the stamp and mean the documented UTC
    // convention. date / timestamp_ntz render zone-free and stay bare.
    val writeZone = spark.sessionState.conf.sessionLocalTimeZone
    val dtypes = statsCols.map { c =>
      val s = raw.schema(c).dataType.simpleString
      c -> (if (s == "timestamp") s"timestamp@$writeZone" else s)
    }.toMap
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))) ++
      (if (withRowCounts) Seq(count(lit(1)).as("__n")) else Nil)
    val byName = parts.map(p => new Path(p).getName -> p).toMap
    raw.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        byName.get(new Path(r.getString(0)).getName).toSeq.flatMap { p =>
          statsCols.zipWithIndex.flatMap { case (c, i) =>
            val lo = r.getString(1 + 2 * i)
            val hi = r.getString(2 + 2 * i)
            // a min/max containing the manifest field separator would
            // shift the parsed payload and record WRONG bounds — drop the
            // stat instead (conservatively unprunable, never incorrect)
            if (lo == null || hi == null ||
                lo.contains(StatSep) || hi.contains(StatSep)) None
            else Some(FileStat(p, c, dtypes(c), lo, hi))
          } ++ (if (withRowCounts) {
            val n = r.getLong(1 + 2 * statsCols.length).toString
            Seq(FileStat(p, RowsStat, "bigint", n, n))
          } else Nil)
        }
      }
  }

  /** All zone-map stats recorded for files LIVE at `version` (default
    * current). Commit manifests are never deleted, so the replay sees the
    * full stat history regardless of checkpoints; a file's stats are
    * immutable (files are write-once), so first-seen wins. */
  def fileStats(spark: SparkSession, table: String,
                version: Option[Long] = None): Seq[FileStat] = {
    val f = fs(spark, table)
    val v = version.getOrElse(currentVersion(spark, table))
    val live = liveFiles(spark, table, Some(v)).toSet
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[FileStat]
    def fold(lines: Seq[(String, String)]): Unit =
      lines.foreach {
        case ("stat", payload) =>
          payload.split(StatSep, 5) match {
            case Array(p, cl, dt, lo, hi)
                if live(p) && seen.add((p, cl)) =>
              out += FileStat(p, cl, dt, lo, hi)
            case _ =>
          }
        case _ =>
      }
    versions(spark, table).filter(_ <= v).foreach { c =>
      fold(parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json")))
    }
    // full-state checkpoints carry the live files' stats forward across
    // [[expireVersions]]; pre-expiry the commits above already held them
    // (stats are immutable per (path, column), so the dedup is exact)
    checkpointVersions(spark, table).filter(_ <= v).sorted.lastOption.foreach { c =>
      fold(parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json")))
    }
    // metadata-only RENAME: stats recorded under the old PHYSICAL name
    // surface under the current LOGICAL name, so pruning (and stat
    // inheritance through rewrites) keeps working across the rename —
    // within any one file only one generation of the name exists
    val phys2log = columnMapping(spark, table, Some(v))
      .collect { case (l, p) if l != p => p -> l }
    if (phys2log.isEmpty) out.toSeq
    else out.toSeq.map(st =>
      phys2log.get(st.column).map(l => st.copy(column = l)).getOrElse(st))
  }

  /** The manifest files whose "stat" lines cover everything live at
    * `version`: commits ≤ version plus the newest checkpoint ≤ version
    * (exactly [[fileStats]]'s sources) — for the DISTRIBUTED verdict
    * path ([[graft.sql.GraftScan]]), which reads them as a Spark text
    * job instead of a driver replay. */
  def statSourceManifests(spark: SparkSession, table: String,
                          version: Option[Long] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, table))
    versions(spark, table).filter(_ <= v)
      .map(c => f"${manifestDir(table)}/v$c%010d.json") ++
      checkpointVersions(spark, table).filter(_ <= v).sorted.lastOption
        .map(c => f"${manifestDir(table)}/c$c%010d.json")
  }

  /** Parse one manifest line into its [[FileStat]] if it is a "stat"
    * line (None otherwise) — executor-safe (pure string work), the
    * per-line unit of the distributed verdict path. Duplicate stats are
    * the caller's non-problem: stats are immutable per (path, column). */
  def parseStatLine(line: String): Option[FileStat] =
    parseLine(line) match {
      case Some(("stat", payload)) => payload.split(StatSep, 5) match {
        case Array(p, cl, dt, lo, hi) => Some(FileStat(p, cl, dt, lo, hi))
        case _                        => None
      }
      case _ => None
    }

  private def checkpointVersions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
      case CheckpointFile(c) => Some(c.toLong)
      case _                 => None
    }).sorted
  }

  /** dtype-aware comparison of two stat-encoded values: Some(sign of
    * a <=> b), or None when the dtype has no defined order over the
    * string encoding (arrays, structs, binary… — conservatively
    * unprunable). Integral stats compare as longs, fractional as doubles,
    * decimal(p,s) as BigDecimal (string compare would rank "100.0" below
    * "20.0" and wrongly prune files), date/timestamp/string
    * lexicographically — valid because Spark renders date/timestamp
    * min/max in sortable ISO-8601 form and string min/max are their own
    * order. Shared with the SQL catalog's filter pushdown
    * ([[graft.sql.GraftCatalog]]), which prunes on one-sided predicates
    * zone-map ranges can't express. */
  private[graft] def statCompare(dtype: String, a: String, b: String): Option[Int] =
    dtype match {
      case "bigint" | "int" | "smallint" | "tinyint" =>
        Some(java.lang.Long.compare(a.toLong, b.toLong))
      case "double" | "float" =>
        Some(java.lang.Double.compare(a.toDouble, b.toDouble))
      case d if d.startsWith("decimal") => Some(BigDecimal(a).compare(BigDecimal(b)))
      case "string" | "date" | "timestamp" | "timestamp_ntz" => Some(a.compare(b))
      case d if d.startsWith("timestamp@") => Some(a.compare(b))
      case _ => None
    }

  /** Is this stat's string encoding comparable under `readZone`? Session-
    * zoned TIMESTAMP stats were rendered under the WRITE session's zone
    * (stamped as `timestamp@<zone>` by [[computeStats]]; legacy bare
    * "timestamp" means the documented UTC convention). A read session in
    * a different zone renders its filter literals differently, so the
    * lexicographic comparison would silently drop matching files — the
    * verdict sites drop the STAT instead (conservatively scanned, never
    * wrong). Every non-session-zoned dtype is always comparable. */
  private[graft] def statZoneOk(dtype: String, readZone: String): Boolean = {
    def same(a: String, b: String): Boolean = a == b ||
      (try java.time.ZoneId.of(a).normalized() == java.time.ZoneId.of(b).normalized()
       catch { case _: Exception => false })
    if (dtype == "timestamp") same("UTC", readZone)
    else if (dtype.startsWith("timestamp@")) same(dtype.drop("timestamp@".length), readZone)
    else true
  }

  /** The read-session zone the verdict sites gate session-zoned stats on. */
  private[graft] def sessionZone(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  /** Can a file whose recorded [min,max] for the stat's dtype intersect
    * [lo,hi]? Dtypes without a defined stat order are conservatively
    * unprunable: intersects = true, the file is scanned. */
  private def statIntersects(st: FileStat, lo: String, hi: String): Boolean =
    (statCompare(st.dtype, st.min, hi), statCompare(st.dtype, st.max, lo)) match {
      case (Some(minVsHi), Some(maxVsLo)) => !(minVsHi > 0 || maxVsLo < 0)
      case _                              => true
    }

  /** Partition the live set at `version` by the zone maps: `_1` = files a
    * `column BETWEEN lo AND hi` predicate must scan, `_2` = files it can
    * skip without opening. Files with no recorded stat for `column` are
    * conservatively scanned. */
  def pruneFiles(spark: SparkSession, table: String, column: String,
                 lo: String, hi: String,
                 version: Option[Long] = None): (Seq[String], Seq[String]) = {
    val zone = sessionZone(spark)
    val stats = fileStats(spark, table, version)
      .filter(st => st.column == column && statZoneOk(st.dtype, zone))
      .map(st => st.path -> st).toMap
    liveFiles(spark, table, version).partition { p =>
      stats.get(p).forall(statIntersects(_, lo, hi))
    }
  }

  /** Read only the files a `column BETWEEN lo AND hi` predicate can
    * match, resolved under the same schema rules as [[readAt]]. Pruning
    * is conservative (never drops a possibly-matching file); the caller
    * still applies the actual filter on top. */
  def readPruned(spark: SparkSession, table: String, column: String,
                 lo: String, hi: String,
                 version: Option[Long] = None): DataFrame =
    readLiveSubset(spark, table, version,
      pruneFiles(spark, table, column, lo, hi, version)._1)

  /** Dv-resolved, schema-resolved read of a SUBSET of the live files —
    * the shared tail of every pruned read (zone map, bloom, catalog
    * pushdown). The caller guarantees `files ⊆ liveFiles(version)`;
    * pruning must be conservative, so the actual predicate still applies
    * on top. */
  private[graft] def readLiveSubset(spark: SparkSession, table: String,
                                    version: Option[Long],
                                    files: Seq[String]): DataFrame = {
    val sc = tableSchema(spark, table, version)
    if (files.isEmpty) {
      val s = sc.getOrElse(throw new IllegalArgumentException(
        s"all files of $table pruned and no recorded schema; pass readAt instead"))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else applyDv(spark, table, version,
      schemaRead(spark, table, version, files))
  }

  /** Read only the live files whose zone maps can intersect EVERY
    * `(column, lo, hi)` range — the multi-predicate [[readPruned]]
    * (ranges AND together, the conjunctive-predicate shape). Columns
    * without a recorded stat on a file leave that file unprunable for
    * that range (conservative, never wrong); an empty `ranges` reads
    * everything. */
  def readPrunedRanges(spark: SparkSession, table: String,
                       ranges: Seq[(String, String, String)],
                       version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    val zone = sessionZone(spark)
    val stats = fileStats(spark, table, Some(v))
      .filter(st => statZoneOk(st.dtype, zone))
      .groupBy(_.column).map { case (c, xs) => c -> xs.map(st => st.path -> st).toMap }
    val scan = liveFiles(spark, table, Some(v)).filter { p =>
      ranges.forall { case (c, lo, hi) =>
        stats.get(c).flatMap(_.get(p)).forall(statIntersects(_, lo, hi))
      }
    }
    readLiveSubset(spark, table, Some(v), scan)
  }

  /** COPY-ON-WRITE row-level DELETE: remove every row matching `cond`,
    * rewriting ONLY the files that actually contain matching rows, as one
    * transactional commit (new files in, touched files out) against the
    * resolved version — a racing writer wins and this throws
    * [[ConcurrentCommitException]]. Untouched files stay byte-identical
    * (and every removed file stays referenced by its original commit, so
    * time travel across the delete keeps working and [[vacuum]] never
    * reclaims it).
    *
    * `prune` narrows the candidate set by zone maps BEFORE any data is
    * read: `(column, lo, hi)` asserts cond can only match rows with
    * `column BETWEEN lo AND hi` (the caller's contract — wrong bounds
    * delete too little). Candidate files are then checked for actual
    * matches (one column-pruned scan), so a zone-map false positive is
    * never rewritten. The rewrite scans only touched files — at 100 TB
    * a targeted delete costs O(files overlapping the predicate), not
    * O(table). */
  def deleteWhere(spark: SparkSession, table: String,
                  cond: org.apache.spark.sql.Column,
                  prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // SQL DELETE removes rows where cond IS TRUE; a NULL predicate keeps
    // the row. Without the coalesce, filter(not(cond)) would drop
    // NULL-cond rows from rewritten files while identical rows in
    // untouched files survive — file-dependent data loss.
    rewriteWhere(spark, table, cond, "delete",
      _.filter(not(coalesce(cond, lit(false)))), prune)
  }

  /** MERGE-ON-READ row-level DELETE: instead of rewriting every file that
    * holds a matching row ([[deleteWhere]]'s copy-on-write discipline), a
    * point delete commits ONE tombstone file — the distinct `keys` values
    * of the matching rows — and every read resolves it by anti-join
    * ([[applyDv]]). Write cost is O(matched keys), NEVER O(bytes of the
    * files touched): the CDC-heavy case (daily point deletes scattered
    * across thousands of large files) stops paying a full rewrite of
    * every grazed file.
    *
    * Semantics — key tombstones (the "equality delete" shape):
    *  - `keys` must identify rows uniquely (the [[mergeInto]] contract);
    *    every CURRENT AND FUTURE live row matching a tombstoned key is
    *    suppressed until the tombstone folds. Re-inserting a tombstoned
    *    key is [[mergeInto]]'s job (it folds the key out of the dv in the
    *    same commit); a plain [[commitAppend]] of a tombstoned key stays
    *    invisible — that's the algebra, not a bug.
    *  - Rows with a NULL key column cannot be matched by an equality
    *    tombstone; they are skipped here (use [[deleteWhere]] for those).
    *  - All live dvs of a table share one key set (enforced here).
    *  - Time travel: pre-delete versions carry no dv and read in full;
    *    [[vacuum]] never reclaims a referenced dv.
    *  - Folding: [[compact]] / [[optimizeZorder]] materialize the
    *    anti-join and retire the dvs; [[mergeInto]] folds its own keys.
    *
    * `prune` narrows the candidate files by zone maps exactly as in
    * [[deleteWhere]] — the scan that FINDS the matching keys is
    * O(overlapping files); the write is O(tombstone). */
  def deleteWhereMor(spark: SparkSession, table: String,
                     cond: org.apache.spark.sql.Column, keys: Seq[String],
                     prune: Option[(String, String, String)] = None): MorDeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(keys.nonEmpty, "deleteWhereMor needs at least one key column")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    if (live.isEmpty) return MorDeleteResult(v, 0L, None)
    dvKeys(spark, table, Some(v)).foreach { case (_, existing) =>
      require(existing.sorted == keys.sorted,
        s"live deletion vectors of $table are keyed on ${existing.mkString(",")}; " +
          s"a new MoR delete must use the same keys (got ${keys.mkString(",")})")
    }
    val candidates = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    if (candidates.isEmpty) return MorDeleteResult(v, 0L, None)
    val raw = schemaRead(spark, table, Some(v), candidates)
    // already-tombstoned rows don't re-tombstone (keeps the dv minimal and
    // the delete idempotent); null-keyed rows can't be equality-deleted
    val matched = applyDv(spark, table, Some(v), raw)
      .filter(coalesce(cond, lit(false)))
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(keys.map(col): _*).distinct()
    val dir = s"$table/data/dv-${java.util.UUID.randomUUID().toString}"
    // candidate + dv bytes are manifest-known: size-gated plan policy
    withSizedPlan(spark, knownBytesOf(spark, table, v,
      candidates ++ liveDvFiles(spark, table, Some(v)))) {
      writeData(matched.coalesce(1), dir)
    }
    val f = fs(spark, table)
    val parts = listParts(f, dir).map(_.getPath.toString)
    // tombstone count from the fresh files' FOOTERS — no re-read job
    val cnt = footerRowCount(spark, parts)
      .getOrElse(spark.read.parquet(parts: _*).count())
    if (cnt == 0) return MorDeleteResult(v, 0L, None) // orphan dir: vacuum food
    val version = commit(spark, table, adds = Nil, baseVersion = Some(v),
      dvAdds = parts)
    MorDeleteResult(version, cnt, parts.headOption)
  }

  /** COPY-ON-WRITE row-level UPDATE: apply `assignments` (column →
    * replacement expression) to every row matching `cond`, with exactly
    * [[deleteWhere]]'s file discipline — zone maps prune candidates
    * before any read, only files actually holding matches are rewritten
    * (non-matching rows in them pass through unchanged), untouched files
    * stay byte-identical, pre-update versions still time-travel, and the
    * rewritten files are re-stamped so later mutations keep pruning.
    * The MERGE-style "UPDATE WHERE" half of the mutation surface;
    * key-join upserts live in [[graft.ops.Upsert]]. */
  /** GENERATED-column generation expressions recorded in the schema
    * stamp: column → expression SQL. */
  private def generationExprs(schema: Option[StructType]): Map[String, String] =
    schema.map(_.fields.toSeq.flatMap(f =>
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .getGenerationExpression(f).map(f.name -> _)).toMap)
      .getOrElse(Map.empty)

  /** Re-derive a GENERATED column from the row's NEW values: the
    * generation expression parses eagerly and its source-column
    * references substitute with the post-update value expressions. */
  private def recomputeGenerated(spark: SparkSession, ge: String,
      newVal: Map[String, org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.DmlShim
    DmlShim.column(DmlShim.parseExpression(spark, ge).transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.size == 1 && newVal.contains(u.nameParts.head) =>
        DmlShim.expression(newVal(u.nameParts.head))
    })
  }

  /** The simultaneous UPDATE projection every rewrite shares, with
    * GENERATED RECOMPUTE (the Delta semantic — updating a source column
    * can never stale the derived one): non-generated columns take their
    * (optionally gated) assignment, generated columns re-derive from
    * the NEW values. Recomputation over unchanged rows is the identity:
    * every write path validates stored values against the expression. */
  private def updateProjection(spark: SparkSession,
      schema: Option[StructType], cols: Seq[String],
      am: Map[String, org.apache.spark.sql.Column],
      gated: (String, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    val gen = generationExprs(schema)
    val newVal = cols.filterNot(gen.contains)
      .map(c => c -> am.get(c).map(e => gated(c, e)).getOrElse(col(c))).toMap
    cols.map { c =>
      gen.get(c) match {
        case Some(ge) =>
          val e = recomputeGenerated(spark, ge, newVal)
          schema.map(s => e.cast(s(c).dataType)).getOrElse(e).as(c)
        case None => newVal(c).as(c)
      }
    }
  }

  def updateWhere(spark: SparkSession, table: String,
                  cond: org.apache.spark.sql.Column,
                  assignments: Seq[(String, org.apache.spark.sql.Column)],
                  prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{col, when}
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    // SQL rejects duplicate SET targets (`SET x = 1, x = 2`) — the toMap
    // below would silently keep only the last one
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"duplicate assignment targets: ${assignments.map(_._1)
        .groupBy(identity).collect { case (c, v) if v.size > 1 => c }
        .mkString(", ")}")
    // ONE simultaneous projection, not a withColumn fold: SQL UPDATE
    // evaluates every SET expression AND the WHERE against the OLD row,
    // so `SET x = y, y = x` swaps and a condition on an assigned column
    // gates the later assignments correctly (a fold would feed each
    // assignment the previous one's output)
    val am = assignments.toMap
    val sc = tableSchema(spark, table)
    rewriteWhere(spark, table, cond, "update",
      df => df.select(updateProjection(spark, sc, df.columns.toSeq, am,
        (c, e) => when(cond, e).otherwise(col(c))): _*), prune)
  }

  /** COPY-ON-WRITE ANTI-JOIN MUTATION — the `NOT IN (SELECT …)` /
    * `NOT EXISTS (…)` DML shape: delete (or, with `assignments`, update)
    * every live row whose key does NOT appear in `source`, optionally
    * gated by `extraCond` (the statement's plain outer conjuncts). The
    * inverse of the keyed-merge semi-join ([[mergeIntoWhen]] with a
    * matched clause): membership is decided by ONE distributed left
    * join against the DISTINCT source keys — never a per-row `isin`
    * literal, so a 100 TB table against a million-key subquery is one
    * shuffle (AQE broadcasts the key set when it is small).
    *
    * Null algebra is the caller's to pick, because SQL's two anti forms
    * disagree: under `NOT EXISTS` a null target key never equals any
    * source key, so the row is UNMATCHED and mutates
    * (`nullKeyMutates = true`); under `NOT IN` a null target key makes
    * the predicate UNKNOWN and the row survives
    * (`nullKeyMutates = false`). Null SOURCE keys are dropped here
    * (they can equality-match nothing); `NOT IN`'s stronger rule — any
    * null in the subquery voids the whole statement — is enforced by
    * the SQL command before calling ([[graft.sql.GraftDmlAntiCommand]]).
    *
    * Candidates cannot be pruned by the SOURCE's key bounds (a missing
    * key can be anywhere), but the `prune` bound from the plain
    * conjuncts still narrows the candidate files by zone maps before
    * any read; within them, only files actually holding a mutating row
    * are rewritten — same file discipline, stat inheritance, clustering
    * preservation, and optimistic-concurrency contract as
    * [[deleteWhere]]/[[updateWhere]]. */
  def mutateAnti(spark: SparkSession, table: String, source: DataFrame,
                 keys: Seq[String], nullKeyMutates: Boolean,
                 extraCond: Option[org.apache.spark.sql.Column],
                 assignments: Seq[(String, org.apache.spark.sql.Column)],
                 prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, when}
    require(keys.nonEmpty, "mutateAnti needs at least one key column")
    require(source.columns.length == keys.length,
      s"anti-join source returns ${source.columns.length} columns for " +
        s"${keys.length} key columns (${keys.mkString(", ")})")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val candidates = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    if (candidates.isEmpty) return DeleteResult(v, Nil, live.size)
    val sc = tableSchema(spark, table, Some(v))
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    // source keys land under reserved names so bare target-column
    // references in extraCond/assignments stay unambiguous after the join
    val keyCols = keys.indices.map(i => s"__graft_k$i")
    val keySet = source.toDF(keyCols: _*).na.drop("any").distinct()
      .withColumn("__graft_m", lit(1))
    def joined(df: DataFrame): DataFrame = {
      val jc = keys.zip(keyCols).map { case (k, kk) => col(k) === col(kk) }
        .reduce(_ && _)
      df.join(keySet, jc, "left_outer")
    }
    // the per-row mutation predicate AFTER the join: no source match,
    // the caller's null-key rule, and the (three-valued, null=false)
    // plain conjuncts. SQL edge: `k NOT IN (empty set)` is TRUE for
    // EVERY row including k IS NULL (FALSE-never-UNKNOWN over no
    // elements), so the null-key guard lifts when the key set is empty.
    val emptyKeySet = keySet.isEmpty
    def predOf: org.apache.spark.sql.Column = {
      val noMatch = col("__graft_m").isNull
      val nullGuard =
        if (nullKeyMutates || emptyKeySet) lit(true)
        else keys.map(col(_).isNotNull).reduce(_ && _)
      coalesce(extraCond.getOrElse(lit(true)), lit(false)) && noMatch && nullGuard
    }
    val byName = candidates.map(p => new Path(p).getName -> p).toMap
    val touched = joined(applyDv(spark, table, Some(v),
        read(candidates).withColumn("__f", input_file_name())))
      .filter(predOf)
      .groupBy(col("__f")).agg(count(lit(1)))
      .collect().toSeq
      .flatMap(r => byName.get(new Path(r.getString(0)).getName))
    if (touched.isEmpty) return DeleteResult(v, Nil, live.size)
    val cols = sc.map(_.fieldNames.toSeq).getOrElse(
      spark.read.parquet(live: _*).columns.toSeq)
    val j = joined(applyDv(spark, table, Some(v), read(touched)))
    // one simultaneous projection (the [[updateWhere]] rule): every
    // assignment and the predicate read the OLD row; generated columns
    // recompute from the NEW values
    val am = assignments.toMap
    val out =
      if (assignments.isEmpty) j.filter(!predOf).select(cols.map(col): _*)
      else j.select(updateProjection(spark, sc, cols, am,
        (c, e) => when(predOf, e).otherwise(col(c))): _*)
    commitCowRewrite(spark, table, v, out, touched,
      if (assignments.isEmpty) "delete" else "update", live.size)
  }

  /** One keyed gate of a [[mutateKeyed]] mutation — the decomposed form
    * of one subquery conjunct in a DML WHERE (or one correlated scalar in
    * an UPDATE SET). `keys` name TARGET columns; `source` provides the
    * key set positionally. */
  sealed trait KeyedGate {
    def source: DataFrame; def keys: Seq[String]
  }
  /** `k IN (SELECT …)` / correlated `EXISTS`: rows whose key appears in
    * the source may mutate. Null source keys drop (IN/= never holds on
    * null); an empty source means no row mutates. */
  final case class SemiGate(source: DataFrame, keys: Seq[String])
      extends KeyedGate
  /** `k NOT IN (SELECT …)` / `NOT EXISTS`: rows whose key does NOT appear
    * may mutate, with the caller's null-target-key rule (see
    * [[mutateAnti]]'s null algebra — `NOT IN`'s statement-voiding source
    * nulls are the SQL command's to enforce before calling). */
  final case class AntiGate(source: DataFrame, keys: Seq[String],
                            nullKeyMutates: Boolean) extends KeyedGate
  /** A correlated-scalar ENRICHMENT: left-join the key-unique source
    * (keys + ONE value column, positionally) and expose the per-row value
    * to the assignment expressions under `valueName` — unmatched keys see
    * `emptyValue` (the aggregate's empty-input value: NULL for max/min/
    * sum, 0 for count). Contributes no predicate. */
  final case class EnrichGate(source: DataFrame, keys: Seq[String],
                              valueName: String,
                              emptyValue: org.apache.spark.sql.Column,
                              what: String = "correlated scalar subquery")
      extends KeyedGate

  /** GENERALIZED KEYED COPY-ON-WRITE MUTATION — several keyed gates
    * composed by AND in ONE transactional commit: the multi-subquery DML
    * shape (`WHERE k IN (SELECT …) AND k2 NOT IN (SELECT …) AND plain`)
    * and the correlated-scalar UPDATE (`SET v = (SELECT agg FROM s WHERE
    * s.k = t.k)`). A row mutates iff `extraCond` holds AND every
    * [[SemiGate]] matches AND every [[AntiGate]] does not; [[EnrichGate]]
    * values feed the assignments. Empty `assignments` deletes.
    *
    * Scale shape: membership is decided by ONE distributed left join per
    * gate against its DISTINCT keys (AQE broadcasts small sets) — never
    * per-row `isin` literals. Candidates prune by zone maps twice over:
    * the plain conjuncts' `prune` bound AND the first semi gate's own key
    * range (its source bounds where a match can live — the
    * [[mergeIntoWhen]] `pruneOn` discipline; anti/enrich gates cannot
    * prune, a missing key can be anywhere). Only files actually holding a
    * mutating row rewrite; untouched files stay byte-identical. */
  def mutateKeyed(spark: SparkSession, table: String, gates: Seq[KeyedGate],
                  extraCond: Option[org.apache.spark.sql.Column],
                  assignments: Seq[(String, org.apache.spark.sql.Column)],
                  prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, max, min, when}
    require(gates.nonEmpty, "mutateKeyed needs at least one gate")
    gates.foreach { g =>
      require(g.keys.nonEmpty, "every gate needs at least one key column")
      val want = g.keys.length + (g match { case _: EnrichGate => 1; case _ => 0 })
      require(g.source.columns.length == want,
        s"gate source returns ${g.source.columns.length} columns for " +
          s"${g.keys.length} key columns (${g.keys.mkString(", ")})" +
          (g match { case _: EnrichGate => " + 1 value column"; case _ => "" }))
    }
    require(assignments.map(_._1).distinct.size == assignments.size,
      "duplicate assignment targets")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val candidates0 = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    // the first semi gate's source key range narrows candidates further:
    // a row can only mutate where that gate's keys can live
    val candidates = gates.collectFirst { case g: SemiGate => g } match {
      case Some(sg) =>
        val kc = sg.source.columns.head
        val b = sg.source.agg(min(col(kc)).cast("string"),
          max(col(kc)).cast("string")).first()
        if (b.isNullAt(0)) Nil // empty/all-null semi keys: nothing matches
        else {
          val keep = pruneFiles(spark, table, sg.keys.head,
            b.getString(0), b.getString(1), Some(v))._1.toSet
          candidates0.filter(keep)
        }
      case None => candidates0
    }
    if (candidates.isEmpty) return DeleteResult(v, Nil, live.size)
    val sc = tableSchema(spark, table, Some(v))
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    // per-gate reserved-named key sets so bare target-column references in
    // extraCond/assignments stay unambiguous after the joins
    val prepped = gates.zipWithIndex.map { case (g, i) =>
      val kCols = g.keys.indices.map(j => s"__graft_g${i}_k$j")
      val marker = s"__graft_g${i}_m"
      val vCol = s"__graft_g${i}_v"
      val ks = g match {
        case eg: EnrichGate =>
          // key-unique contract: a duplicated key would multiply target
          // rows through the join (and SQL's scalar subquery would error)
          val renamed = g.source.toDF(kCols :+ vCol: _*).na.drop("any", kCols)
          val dups = renamed.groupBy(kCols.map(col): _*)
            .count().filter(col("count") > 1).limit(1).collect()
          if (dups.nonEmpty) throw new IllegalArgumentException(
            s"${eg.what} returned more than one row for correlation key " +
              dups.head.toSeq.init.mkString(","))
          renamed.withColumn(marker, lit(1))
        case _ =>
          g.source.toDF(kCols: _*).na.drop("any").distinct()
            .withColumn(marker, lit(1))
      }
      (g, ks, kCols, marker, vCol)
    }
    // SQL edge (see [[mutateAnti]]): `k NOT IN (empty set)` is TRUE for
    // every row including k IS NULL, so the null-key guard lifts per-gate
    val emptySet = prepped.map { case (g, ks, _, _, _) =>
      g match { case _: AntiGate => ks.isEmpty; case _ => false }
    }
    def joined(df: DataFrame): DataFrame =
      prepped.foldLeft(df) { case (d, (g, ks, kCols, _, _)) =>
        val jc = g.keys.zip(kCols).map { case (k, kk) => col(k) === col(kk) }
          .reduce(_ && _)
        d.join(ks, jc, "left_outer")
      }
    def withValues(j: DataFrame): DataFrame =
      prepped.foldLeft(j) { case (d, (g, _, _, marker, vCol)) =>
        g match {
          case e: EnrichGate => d.withColumn(e.valueName,
            when(col(marker).isNotNull, col(vCol)).otherwise(e.emptyValue))
          case _ => d
        }
      }
    def predOf: org.apache.spark.sql.Column = {
      val gatePreds = prepped.zip(emptySet).map {
        case ((g, _, _, marker, _), empty) => g match {
          case _: SemiGate => col(marker).isNotNull
          case AntiGate(_, keys, nullMut) =>
            val nullGuard =
              if (nullMut || empty) lit(true)
              else keys.map(col(_).isNotNull).reduce(_ && _)
            col(marker).isNull && nullGuard
          case _: EnrichGate => lit(true)
        }
      }
      (coalesce(extraCond.getOrElse(lit(true)), lit(false)) +: gatePreds)
        .reduce(_ && _)
    }
    val byName = candidates.map(p => new Path(p).getName -> p).toMap
    val touched = joined(applyDv(spark, table, Some(v),
        read(candidates).withColumn("__f", input_file_name())))
      .filter(predOf)
      .groupBy(col("__f")).agg(count(lit(1)))
      .collect().toSeq
      .flatMap(r => byName.get(new Path(r.getString(0)).getName))
    if (touched.isEmpty) return DeleteResult(v, Nil, live.size)
    val cols = sc.map(_.fieldNames.toSeq).getOrElse(
      spark.read.parquet(live: _*).columns.toSeq)
    val j = withValues(joined(applyDv(spark, table, Some(v), read(touched))))
    // one simultaneous projection (the [[updateWhere]] rule): every
    // assignment and the predicate read the OLD row; generated columns
    // recompute from the NEW values
    val am = assignments.toMap
    val out =
      if (assignments.isEmpty) j.filter(!predOf).select(cols.map(col): _*)
      else j.select(updateProjection(spark, sc, cols, am,
        (c, e) => when(predOf, e).otherwise(col(c))): _*)
    commitCowRewrite(spark, table, v, out, touched,
      if (assignments.isEmpty) "delete" else "update", live.size)
  }

  /** STAGED-PREDICATE COPY-ON-WRITE MUTATION — the materialize fallback
    * for DML predicates carrying uncorrelated subqueries with no keyed
    * decomposition (tuple `NOT IN`, subqueries under `OR`): the caller
    * stages each subquery plan (so `cond` is self-contained and stable),
    * and the predicate evaluates IN PLACE inside the candidate reads —
    * Spark's own subquery planning turns each membership test into a
    * distributed join (null-aware anti join for NOT IN), so a million-key
    * subquery is one shuffle, never a literal list.
    *
    * File discipline as everywhere: zone maps prune candidates by the
    * plain conjuncts' `prune` bound, only files actually holding a
    * matching row rewrite. The rewrite tags candidate rows with a row id
    * over an EAGER local checkpoint: the passthrough side anti-joins the
    * matched ids instead of negating the predicate (SQL's
    * NULL-condition-keeps-the-row rule without nesting a predicate
    * subquery under NOT/COALESCE, which Spark cannot plan). */
  def mutateStaged(spark: SparkSession, table: String,
                   cond: org.apache.spark.sql.Column,
                   assignments: Seq[(String, org.apache.spark.sql.Column)],
                   prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit, monotonically_increasing_id}
    require(assignments.map(_._1).distinct.size == assignments.size,
      "duplicate assignment targets")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val candidates = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    if (candidates.isEmpty) return DeleteResult(v, Nil, live.size)
    val sc = tableSchema(spark, table, Some(v))
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    val byName = candidates.map(p => new Path(p).getName -> p).toMap
    val touched = applyDv(spark, table, Some(v),
        read(candidates).withColumn("__f", input_file_name()))
      .filter(cond) // Filter keeps TRUE only — SQL's null-is-false rule
      .groupBy(col("__f")).agg(count(lit(1)))
      .collect().toSeq
      .flatMap(r => byName.get(new Path(r.getString(0)).getName))
    if (touched.isEmpty) return DeleteResult(v, Nil, live.size)
    val cols = sc.map(_.fieldNames.toSeq).getOrElse(
      spark.read.parquet(live: _*).columns.toSeq)
    val tagged = applyDv(spark, table, Some(v), read(touched))
      .withColumn("__graft_rid", monotonically_increasing_id())
      .localCheckpoint()
    val matched = tagged.filter(cond)
    def keep = tagged.join(matched.select("__graft_rid"),
      Seq("__graft_rid"), "left_anti").select(cols.map(col): _*)
    val out =
      if (assignments.isEmpty) keep
      else {
        val am = assignments.toMap
        // SQL UPDATE evaluates every SET expression against the OLD row;
        // matched and passthrough rows rewrite as separate branches so
        // the predicate never has to evaluate inside a projection;
        // generated columns recompute from the matched rows' NEW values
        matched.select(updateProjection(spark, sc, cols, am,
          (_, e) => e): _*).unionByName(keep)
      }
    commitCowRewrite(spark, table, v, out, touched,
      if (assignments.isEmpty) "delete" else "update", live.size)
  }

  /** Schema-evolution ADD COLUMNS as a library call (the `ALTER TABLE
    * ADD COLUMNS` core, shared with MERGE WITH SCHEMA EVOLUTION): append
    * nullable fields to the schema stamp in one metadata commit, with
    * the same resurrection guards as the SQL surface — a name an earlier
    * DROP quarantined (or that still backs a renamed logical column)
    * refuses, or old files would silently serve the dead data under the
    * new column. */
  def addColumns(spark: SparkSession, table: String,
                 fields: Seq[org.apache.spark.sql.types.StructField]): Long = {
    require(fields.nonEmpty, "addColumns needs at least one field")
    val sc = tableSchema(spark, table).getOrElse(
      throw new UnsupportedOperationException(
        s"$table records no schema; schema evolution needs a schema-stamped table"))
    val props = tableProperties(spark, table)
    val dropped = props.get(DroppedProp)
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    val mapping = columnMapping(spark, table)
    fields.foreach { f =>
      require(!sc.fieldNames.contains(f.name), s"column ${f.name} already exists")
      require(!dropped.contains(f.name) && !mapping.valuesIterator.contains(f.name),
        s"cannot add '${f.name}': old files still carry data under that " +
          "physical name and would resurrect it (OPTIMIZE to purge, or " +
          "pick another name)")
    }
    commit(spark, table, adds = Nil,
      schemaJson = Some(StructType(
        sc.fields ++ fields.map(_.copy(nullable = true))).json),
      notes = Seq(s"evolve-add:${fields.map(_.name).mkString(",")}"))
  }

  /** PREDICATE OVERWRITE — the Delta `replaceWhere` / Iceberg
    * overwrite-filter shape: atomically replace exactly the rows
    * matching `cond` with `df`, as ONE transactional commit. The
    * backfill primitive (recompute one day/source/band and swap it in):
    * zone maps prune candidate files before any read, only files
    * actually holding matching rows rewrite (their non-matching rows
    * pass through), untouched files stay byte-identical, and the new
    * data lands in the same commit — readers see the old slice or the
    * new slice, never neither. The caller asserts `df`'s rows belong
    * inside the predicate (checked: rows of `df` violating `cond`
    * refuse — a backfill that leaks outside its slice would silently
    * double rows on the next backfill). */
  def replaceWhere(spark: SparkSession, table: String,
                   cond: org.apache.spark.sql.Column, df: DataFrame,
                   prune: Option[(String, String, String)] = None): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit, not}
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    val cols = sc.map(_.fieldNames.toSeq).getOrElse(
      if (live.nonEmpty) spark.read.parquet(live: _*).columns.toSeq
      else df.columns.toSeq)
    require(df.columns.sorted.sameElements(cols.sorted),
      s"replaceWhere data must match the table schema " +
        s"(${cols.sorted.mkString(",")}), got ${df.columns.sorted.mkString(",")}")
    val in = df.select(cols.map(col): _*)
    val candidates = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    val byName = candidates.map(p => new Path(p).getName -> p).toMap
    val touched =
      if (candidates.isEmpty) Nil
      else applyDv(spark, table, Some(v),
          read(candidates).withColumn("__f", input_file_name()))
        .filter(coalesce(cond, lit(false)))
        .groupBy(col("__f")).agg(count(lit(1)))
        .collect().toSeq
        .flatMap(r => byName.get(new Path(r.getString(0)).getName))
    // the NEW data writes to its own dir FIRST, so the leak check (rows
    // outside the predicate would double on the next backfill) and the
    // CHECK-constraint gate both read the WRITTEN files — the producing
    // plan is computed exactly once; a refused write's files are
    // unreferenced vacuum food, exactly like a lost optimistic writer
    val f = fs(spark, table)
    val newDir = s"$table/data/replace-${java.util.UUID.randomUUID().toString}"
    val (inClustered, clusterCols0) = Clustering.forWrite(spark, table, in)
    // leak check AND CHECK constraints ride the write job as observed
    // metrics (two read-back jobs per replaceWhere fused away); both
    // still gate BEFORE the manifest commit — a refusal leaves the fresh
    // files unreferenced, exactly as before
    import org.apache.spark.sql.functions.{max, when}
    val (inst, check) = Constraints.observed(spark, table, inClustered,
      "replaced", extraAggs = Seq(
        max(when(not(coalesce(cond, lit(false))), 1L).otherwise(0L)).as("__leak")))
    writeData(inst, newDir)
    val observed = check()
    require(!observed.get("__leak").exists(v => v != null && v == 1L),
      "replaceWhere data contains rows OUTSIDE the replace predicate — " +
        "a leaking backfill would double those rows on the next run; " +
        "nothing was committed")
    val newPartsSt = listParts(f, newDir)
    val newParts = newPartsSt.map(_.getPath.toString)
    // survivors of the touched files rewrite separately (already-valid
    // rows — no re-validation), inheriting the touched stat coverage
    val touchedStats = fileStats(spark, table, Some(v))
      .filter(st => touched.contains(st.path))
    val statCols = (touchedStats.map(_.column)
      .filterNot(reservedStat) ++ clusterCols0).distinct
    val keepRowCounts = touchedStats.exists(_.column == RowsStat) ||
      clusterCols0.nonEmpty
    val survDir = s"$table/data/replace-${java.util.UUID.randomUUID().toString}"
    val survPartsSt =
      if (touched.isEmpty) Nil
      else {
        val (survClustered, _) = Clustering.forWrite(spark, table,
          applyDv(spark, table, Some(v), read(touched))
            .filter(not(coalesce(cond, lit(false)))).select(cols.map(col): _*))
        writeData(survClustered, survDir)
        listParts(f, survDir)
      }
    val survParts = survPartsSt.map(_.getPath.toString)
    val version = commit(spark, table, adds = newParts ++ survParts,
      removes = touched, baseVersion = Some(v),
      stats = computeStats(spark, newDir, newParts, statCols,
          withRowCounts = keepRowCounts) ++
        computeStats(spark, survDir, survParts, statCols,
          withRowCounts = keepRowCounts),
      addLens = lensOf(newPartsSt ++ survPartsSt))
    DeleteResult(version, touched, live.size - touched.size)
  }

  /** COPY-ON-WRITE keyed MERGE (SCD1 upsert) — `MERGE INTO table USING
    * updates ON keys WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    * INSERT *` as one transactional commit: every live row whose key
    * appears in `updates` is replaced by the update row, new keys are
    * inserted, and ONLY the files actually holding matched keys are
    * rewritten (their non-matching rows pass through; all other files
    * stay byte-identical and pre-merge versions still time-travel).
    * Same file discipline as [[deleteWhere]]/[[updateWhere]], same
    * contract as [[graft.ops.Upsert.merge]] (schemas match up to column
    * order; `updates` is key-unique; null update keys match nothing and
    * arrive as inserts).
    *
    * `pruneOn` names a zone-mapped KEY column: the candidate set is first
    * narrowed to files whose recorded [min,max] intersects the updates'
    * own [min,max] of that column — a CDC batch touching a narrow key
    * range rewrites O(overlapping files), not O(table). The semi-join
    * match check then keeps zone-map false positives unrewritten. At
    * 100 TB this is the difference between a merge that reads the whole
    * table and one that reads the files the batch can actually hit.
    *
    * Returns the committed version, the rewritten files, and the count
    * left untouched ([[DeleteResult]] shape). Concurrency: committed
    * against the version the reads resolved at — a racing writer wins
    * and this throws [[ConcurrentCommitException]] (re-derive, retry). */
  def mergeInto(spark: SparkSession, table: String, updates: DataFrame,
                keys: Seq[String], pruneOn: Option[String] = None,
                statsCols: Seq[String] = Nil,
                note: Option[String] = None,
                extraNotes: Seq[String] = Nil): DeleteResult = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    // live deletion vectors ([[deleteWhereMor]]): the merge folds its own
    // keys out of them in the same commit, so an upsert of a tombstoned
    // key really re-inserts it. Requires the dv key set == merge keys
    // (fold on different keys has no defined row mapping).
    val dvLive = liveDvFiles(spark, table, Some(v))
    val dv = dvKeys(spark, table, Some(v))
    dv.foreach { case (_, dvCols) =>
      require(dvCols.sorted == keys.sorted,
        s"live deletion vectors of $table are keyed on ${dvCols.mkString(",")}; " +
          s"mergeInto must use the same keys to fold them (got ${keys.mkString(",")})")
    }
    if (live.isEmpty && dvLive.isEmpty) {
      // empty table: MERGE degenerates to the insert branch
      val version = commitAppend(updates, table,
        recordSchema = sc.isEmpty, statsCols = statsCols,
        notes = note.toSeq ++ extraNotes)
      return DeleteResult(version, Nil, 0)
    }
    val cols = sc.map(_.fieldNames.toSeq).getOrElse {
      if (live.isEmpty) updates.columns.toSeq
      else spark.read.parquet(live: _*).columns.toSeq
    }
    require(updates.columns.sorted.sameElements(cols.sorted),
      s"schema mismatch: table ${cols.sorted.mkString(",")} vs " +
        s"updates ${updates.columns.sorted.mkString(",")}")
    val up = updates.select(cols.map(col): _*)
    val candidates = pruneOn match {
      case Some(c) =>
        val b = up.agg(min(col(c)).cast("string"), max(col(c)).cast("string")).first()
        if (b.isNullAt(0)) Nil // all-null prune keys: no row can match
        else pruneFiles(spark, table, c, b.getString(0), b.getString(1), Some(v))._1
      case None => live
    }
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    val keySet = up.select(keys.map(col): _*).distinct()
    val touched =
      if (candidates.isEmpty) Nil
      else {
        val byName = candidates.map(p => new Path(p).getName -> p).toMap
        read(candidates).withColumn("__f", input_file_name())
          .join(keySet, keys, "left_semi")
          .select("__f").distinct().collect().toSeq
          .flatMap(r => byName.get(new Path(r.getString(0)).getName))
      }
    // rewrite output: the whole update batch (replacements + inserts) plus
    // the touched files' unmatched LIVE rows — tombstoned ghosts drop here
    // (the touched check above reads RAW on purpose: a file whose only
    // matching rows are tombstoned must still be rewritten, or folding the
    // dv below would resurrect the physical ghost row); untouched files
    // keep every row (by construction they hold no matching key)
    val out =
      if (touched.isEmpty) up
      else up.unionByName(
        applyDv(spark, table, Some(v), read(touched)).join(keySet, keys, "left_anti"))
    // reserved pseudo-columns (__rows/__bytes) are not schema columns:
    // bytes re-record inside commit() itself; row counts recompute below
    // iff the touched files carried them (fastCount stays metadata-only
    // across upserts)
    val touchedStats = fileStats(spark, table, Some(v))
      .filter(st => touched.contains(st.path))
    // clustered tables keep their layout across merges (and insert-only
    // merges stamp the cluster columns even with no touched stats to
    // inherit) — see [[Clustering.forWrite]]
    val (outClustered, clusterCols) = Clustering.forWrite(spark, table, out)
    val statCols = (touchedStats.map(_.column)
      .filterNot(reservedStat) ++ statsCols ++ clusterCols).distinct
    val keepRowCounts = touchedStats.exists(_.column == RowsStat) ||
      clusterCols.nonEmpty
    val dir = s"$table/data/merge-${java.util.UUID.randomUUID().toString}"
    // CHECK constraints ride the write; the gate still sits before commit
    val (inst, check) = Constraints.observed(spark, table, outClustered, "merged")
    writeData(inst, dir)
    check()
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    // fold: tombstones for keys this batch re-upserts retire with the old
    // dv files; survivors are rewritten into ONE fresh dv (O(tombstones))
    val dvParts =
      if (dvLive.isEmpty) Nil
      else {
        val survivors = dv.get._1.dropDuplicates(keys).join(keySet, keys, "left_anti")
        val dvDir = s"$table/data/dv-${java.util.UUID.randomUUID().toString}"
        writeData(survivors.coalesce(1), dvDir)
        val ps = listParts(f, dvDir).map(_.getPath.toString)
        // emptiness from the fresh files' footers — no re-read job
        if (footerRowCount(spark, ps)
              .map(_ == 0L)
              .getOrElse(spark.read.parquet(ps: _*).isEmpty)) Nil
        else ps
      }
    val version = commit(spark, table, adds = parts,
      removes = touched ++ dvLive, baseVersion = Some(v),
      stats = computeStats(spark, dir, parts, statCols,
        withRowCounts = keepRowCounts),
      notes = note.toSeq ++ extraNotes, dvAdds = dvParts,
      addLens = lensOf(partsSt))
    DeleteResult(version, touched, live.size - touched.size)
  }

  /** One clause of a generalized MERGE's WHEN MATCHED list, applied in
    * declaration order: the FIRST clause whose condition holds claims a
    * matched target row; a matched row no clause claims passes through
    * unchanged. Conditions and update expressions are Columns over the
    * aliased merge namespace — `t.<col>` reads the target row, `s.<col>`
    * the source row (`functions.col("t.x")` / a SQL rule's re-qualified
    * reference). A null condition counts as not-held (SQL three-valued
    * WHEN ... AND). */
  sealed trait MatchedClause {
    def condition: Option[org.apache.spark.sql.Column]
  }

  /** `WHEN MATCHED [AND cond] THEN UPDATE SET c = expr, …` — PARTIAL-ROW:
    * columns absent from `set` keep their target value. Key columns may
    * not be assigned (a key rewrite is a delete + insert, not an update —
    * the keyed-merge algebra has no defined mapping for it). */
  final case class MatchedUpdate(condition: Option[org.apache.spark.sql.Column],
                                 set: Map[String, org.apache.spark.sql.Column])
      extends MatchedClause

  /** `WHEN MATCHED [AND cond] THEN DELETE`. */
  final case class MatchedDelete(
      condition: Option[org.apache.spark.sql.Column] = None) extends MatchedClause

  /** `WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs)` —
    * table columns absent from `values` insert NULL (the SQL
    * unlisted-column rule). Conditions and values see `s.<col>` only
    * (there is no target row to reference). Source rows no insert clause
    * claims are dropped. */
  final case class NotMatchedInsert(condition: Option[org.apache.spark.sql.Column],
                                    values: Map[String, org.apache.spark.sql.Column])

  /** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE` clauses
    * reuse [[MatchedUpdate]]/[[MatchedDelete]] with the gate inverted:
    * they apply to LIVE TARGET rows whose key has no source match, and
    * their conditions/update expressions may reference `t.<col>` only
    * (there is no source row — Spark's analyzer enforces the same). */

  /** Generalized COPY-ON-WRITE MERGE — the full SQL clause algebra
    * ([[mergeInto]] is the unconditioned full-row special case):
    *
    * {{{
    *   MERGE INTO t USING s ON keys
    *     WHEN MATCHED AND s.op = 'D' THEN DELETE
    *     WHEN MATCHED THEN UPDATE SET m = t.m + s.delta
    *     WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (id, m) VALUES (s.id, s.delta)
    * }}}
    *
    * Matched rows take the FIRST applicable matched clause; unmatched
    * source rows take the first applicable insert clause; live target
    * rows with NO source match take the first applicable `bySource`
    * clause (`WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE/DELETE`
    * — the target-side sweep of an incremental sync); everything else
    * passes through. One transactional commit with the same file
    * discipline as [[mergeInto]]: `pruneOn` zone-maps the candidate set
    * to the source's own key bounds, only files actually holding matched
    * keys rewrite (a CDC batch touching a narrow key range rewrites
    * O(overlapping files), not O(table)), untouched files stay
    * byte-identical, live deletion vectors fold exactly as in
    * [[mergeInto]] (tombstoned keys count as NOT matched — their ghost
    * rows drop physically from any rewritten file, never resurrect).
    *
    * `bySource` detection is necessarily one dv-resolved anti-join pass
    * over ALL live files (key ABSENCE has no zone-map bound — any file
    * may hold an unmatched row), but only files holding a row some
    * bySource clause CLAIMS (key unmatched AND a condition holds)
    * rewrite — a conditioned sweep still rewrites O(claimed files).
    *
    * The source must be key-unique (the standard SQL MERGE cardinality
    * rule — checked with one aggregation over the CHANGE-sized source)
    * and must carry the key columns; other source columns are free (a CDC
    * `op` column need not exist in the table). Concurrency: committed
    * against the version the reads resolved at — a racing writer wins and
    * this throws [[ConcurrentCommitException]] (re-derive, retry). */
  def mergeIntoWhen(spark: SparkSession, table: String, source: DataFrame,
                    keys: Seq[String],
                    matched: Seq[MatchedClause],
                    notMatched: Seq[NotMatchedInsert],
                    pruneOn: Option[String] = None,
                    note: Option[String] = None,
                    prune: Option[(String, String, String)] = None,
                    bySource: Seq[MatchedClause] = Nil): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, input_file_name, lit, max, min, monotonically_increasing_id, raise_error, when}
    import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
    require(keys.nonEmpty, "mergeIntoWhen needs at least one key column")
    require(matched.nonEmpty || notMatched.nonEmpty || bySource.nonEmpty,
      "MERGE needs at least one WHEN clause")
    (matched ++ bySource).foreach {
      case MatchedUpdate(_, set) => keys.foreach(k => require(!set.contains(k),
        s"MERGE may not assign key column '$k' — delete + insert instead"))
      case _ =>
    }
    require(keys.forall(source.columns.contains),
      s"MERGE source must carry the key columns (${keys.mkString(", ")})")
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    val dvLive = liveDvFiles(spark, table, Some(v))
    val dv = dvKeys(spark, table, Some(v))
    dv.foreach { case (_, dvCols) =>
      require(dvCols.sorted == keys.sorted,
        s"live deletion vectors of $table are keyed on ${dvCols.mkString(",")}; " +
          s"mergeIntoWhen must use the same keys to fold them (got ${keys.mkString(",")})")
    }
    val schemaOf: StructType = sc.getOrElse {
      if (live.nonEmpty) spark.read.parquet(live: _*).schema else source.schema
    }
    val cols = schemaOf.fieldNames.toSeq
    // ENGINE-GOVERNED columns (IDENTITY / GENERATED) participate in
    // MERGE the way they do in INSERT: insert-arm rows mint identities
    // against the transactional high watermark (advanced in the SAME
    // commit — racing writers hit the optimistic gate and re-derive) and
    // compute/validate generated values; update arms may not assign
    // them, nor a column a generation expression reads (the value would
    // go stale relative to its expression)
    val idSpecs = schemaOf.fields.toSeq
      .filter(IdentityColumn.isIdentityColumn)
      .map(f => f -> IdentityColumn.getIdentityInfo(f).get)
    val genExprs = schemaOf.fields.toSeq.flatMap(f =>
      GeneratedColumn.getGenerationExpression(f).map(f.name -> _))
    val governedNames = idSpecs.map(_._1.name).toSet ++ genExprs.map(_._1)
    (matched ++ bySource).foreach {
      case MatchedUpdate(_, set) =>
        set.keys.find(governedNames).foreach(c =>
          throw new UnsupportedOperationException(
            s"MERGE may not assign engine-governed column '$c' (IDENTITY " +
              "values mint at insert; GENERATED values derive — update " +
              "their source columns and the engine recomputes)"))
      case _ =>
    }
    val genNames = genExprs.map(_._1).toSet
    val propsV =
      if (idSpecs.isEmpty) Map.empty[String, String]
      else tableProperties(spark, table, Some(v))
    def identityProp(c: String) = s"graft.identity.$c.next"
    // insert-arm governed fill: identical algebra to the INSERT path
    // (GraftWriteBuilder.insertWithIdentity) — ALWAYS refuses explicit
    // values per row in-plan, BY DEFAULT coalesces, generated columns
    // compute after identity (they may reference the minted ids)
    def governFill(ins: DataFrame): DataFrame = {
      val filled0 = idSpecs.foldLeft(ins) { case (d, (f, is)) =>
        val next = propsV.get(identityProp(f.name)).map(_.toLong)
          .getOrElse(is.getStart)
        val minted = (lit(next) + lit(is.getStep) * monotonically_increasing_id())
          .cast(f.dataType)
        val e =
          if (is.isAllowExplicitInsert) coalesce(col(f.name), minted)
          else when(col(f.name).isNotNull, raise_error(lit(
            s"GENERATED ALWAYS AS IDENTITY column '${f.name}' cannot be " +
              "assigned an explicit value")).cast(f.dataType)).otherwise(minted)
        d.withColumn(f.name, e)
      }
      genExprs.foldLeft(filled0) { case (d, (name, ge)) =>
        val e = expr(ge).cast(schemaOf(name).dataType)
        d.withColumn(name,
          when(col(name).isNotNull && !(col(name) <=> e),
            raise_error(lit(s"GENERATED column '$name' value does not " +
              s"match its expression ($ge)")).cast(schemaOf(name).dataType))
            .otherwise(coalesce(col(name), e)))
      }
    }
    // monotonic watermark advance from the WRITTEN files, folded into the
    // same commit (one column-pruned agg; rewritten rows carry ids at or
    // below the watermark, so max/min over everything is safe)
    def identityProps(parts: Seq[String]): Seq[(String, Option[String])] =
      if (idSpecs.isEmpty || parts.isEmpty) Nil
      else {
        val rb = spark.read.parquet(parts: _*)
        val aggs = idSpecs.map { case (f, is) =>
          (if (is.getStep >= 0) max(col(f.name)) else min(col(f.name)))
            .as(f.name) }
        val row = rb.agg(aggs.head, aggs.tail: _*).first()
        idSpecs.zipWithIndex.collect {
          case ((f, is), i) if !row.isNullAt(i) =>
            val cur = propsV.get(identityProp(f.name)).map(_.toLong)
              .getOrElse(is.getStart)
            val written = row.getAs[Number](i).longValue + is.getStep
            val mono =
              if (is.getStep >= 0) math.max(cur, written)
              else math.min(cur, written)
            identityProp(f.name) -> Some(mono.toString)
        }
      }
    // standard SQL MERGE cardinality rule: a key-duplicated source would
    // claim one target row twice
    val dups = source.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    if (dups.nonEmpty) throw new IllegalArgumentException(
      s"MERGE source has duplicate keys (${keys.mkString(", ")} = " +
        s"${dups.head.toSeq.init.mkString(",")}): a target row would be " +
        "claimed twice (standard SQL MERGE cardinality violation)")

    def typed(c: String, e: org.apache.spark.sql.Column) =
      e.cast(schemaOf(c).dataType).as(c)
    // first-applicable-clause algebra over an ordered clause list:
    // applicable_i = gate AND cond_i AND NOT (cond_1 OR … OR cond_{i-1});
    // null conditions coalesce to false (SQL three-valued WHEN ... AND)
    def applicability(gate: org.apache.spark.sql.Column,
                      conds: Seq[Option[org.apache.spark.sql.Column]])
        : Seq[org.apache.spark.sql.Column] = {
      var prior: org.apache.spark.sql.Column = lit(false)
      conds.map { c =>
        val ci = coalesce(c.getOrElse(lit(true)), lit(false))
        val a = gate && ci && !prior
        prior = prior || ci
        a
      }
    }
    // the not-matched source rows mapped through the first applicable
    // insert clause (rows no clause claims drop); output in table schema
    def insertsOf(unmatched: DataFrame): DataFrame =
      if (notMatched.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf)
      else {
        val s = unmatched.alias("s")
        val apps = applicability(lit(true), notMatched.map(_.condition))
        val outCols = cols.map { c =>
          val pairs = notMatched.zip(apps).map { case (cl, a) =>
            (a, cl.values.getOrElse(c, lit(null)))
          }
          typed(c, pairs.tail.foldLeft(when(pairs.head._1, pairs.head._2)) {
            case (acc, (a, e)) => acc.when(a, e)
          }) // no otherwise: unclaimed rows are filtered out below anyway
        }
        s.filter(apps.reduce(_ || _)).select(outCols: _*)
      }

    if (live.isEmpty && dvLive.isEmpty) {
      // empty table: every source row is NOT matched
      val ins = governFill(insertsOf(source))
      if (ins.isEmpty) return DeleteResult(v, Nil, 0)
      val version = commitAppend(ins, table,
        recordSchema = sc.isEmpty, notes = note.toSeq,
        propsOf = identityProps,
        // identity watermarks must advance against the version the fill
        // read, or a racing insert could double-mint
        baseVersion = if (idSpecs.nonEmpty) Some(v) else None)
      return DeleteResult(version, Nil, 0)
    }
    val candidates0 = pruneOn match {
      case Some(c) =>
        val b = source.agg(min(col(c)).cast("string"), max(col(c)).cast("string")).first()
        if (b.isNullAt(0)) Nil // all-null prune keys: no row can match
        else pruneFiles(spark, table, c, b.getString(0), b.getString(1), Some(v))._1
      case None => live
    }
    // an extra caller-asserted bound (e.g. the plain outer conjuncts of a
    // subquery DELETE) intersects the candidate set: a matched row can
    // only change where BOTH bounds can hold
    val candidates = prune match {
      case Some((c, lo, hi)) =>
        val keep = pruneFiles(spark, table, c, lo, hi, Some(v))._1.toSet
        candidates0.filter(keep)
      case None => candidates0
    }
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    val keySet = source.select(keys.map(col): _*).distinct()
    // touched detection reads RAW on purpose (see [[mergeInto]]): a file
    // whose only matching rows are tombstoned ghosts must still rewrite,
    // or folding the dv below would resurrect the ghost
    val touched =
      if (candidates.isEmpty || (matched.isEmpty && dvLive.isEmpty)) Nil
      else {
        val byName = candidates.map(p => new Path(p).getName -> p).toMap
        read(candidates).withColumn("__f", input_file_name())
          .join(keySet, keys, "left_semi")
          .select("__f").distinct().collect().toSeq
          .flatMap(r => byName.get(new Path(r.getString(0)).getName))
      }
    // bySource detection: key ABSENCE has no zone-map bound, so every
    // live file is a candidate — but detection is dv-resolved (a
    // tombstoned ghost is not a live unmatched row) and only files
    // holding a row some clause CLAIMS rewrite
    val bySourceTouched =
      if (bySource.isEmpty || live.isEmpty) Nil
      else {
        val claim = bySource
          .map(cl => coalesce(cl.condition.getOrElse(lit(true)), lit(false)))
          .reduce(_ || _)
        val byName = live.map(p => new Path(p).getName -> p).toMap
        applyDv(spark, table, Some(v),
            read(live).withColumn("__f", input_file_name())).alias("t")
          .join(keySet, keys, "left_anti")
          .filter(claim)
          .select("__f").distinct().collect().toSeq
          .flatMap(r => byName.get(new Path(r.getString(0)).getName))
      }
    val touchedAll = (touched ++ bySourceTouched).distinct
    val matchedOut: Option[DataFrame] =
      if (touchedAll.isEmpty) None
      else {
        val tgt = applyDv(spark, table, Some(v), read(touchedAll)).alias("t")
        val s = source.withColumn("__graft_m", lit(1)).alias("s")
        val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
        val j = tgt.join(s, joinCond, "left_outer")
        val gate = col("s.__graft_m").isNotNull
        val apps = applicability(gate, matched.map(_.condition))
        val appsBs = applicability(!gate, bySource.map(_.condition))
        val deleted = (matched.zip(apps) ++ bySource.zip(appsBs))
          .collect { case (_: MatchedDelete, a) => a }
          .foldLeft(lit(false))(_ || _)
        val newVal: Map[String, org.apache.spark.sql.Column] =
          cols.filterNot(genNames).map { c =>
            val base = col(s"t.$c")
            val updates = (matched.zip(apps) ++ bySource.zip(appsBs))
              .collect { case (u: MatchedUpdate, a) => (a, u.set.getOrElse(c, base)) }
            c -> updates.foldRight(base) { case ((a, ue), rest) =>
              when(a, ue).otherwise(rest) }
          }.toMap
        val genOf = genExprs.toMap
        val outCols = cols.map { c =>
          if (genNames(c)) typed(c, recomputeGenerated(spark, genOf(c), newVal))
          else typed(c, newVal(c))
        }
        Some(j.filter(!deleted).select(outCols: _*))
      }
    // NOT matched = key absent from the LIVE (dv-resolved) view; the
    // pruneOn candidate set covers every file the source's key range can
    // reach, so ITS keys decide membership completely (the extra `prune`
    // bound above only narrows which matched rows can CHANGE — a key in a
    // file it excludes is still matched, never an insert)
    val unmatchedSrc =
      if (candidates0.isEmpty) source
      else source.join(
        applyDv(spark, table, Some(v), read(candidates0))
          .select(keys.map(col): _*).distinct(),
        keys, "left_anti")
    val inserts = governFill(insertsOf(unmatchedSrc))
    val out = matchedOut.map(_.unionByName(inserts)).getOrElse(inserts)
    if (touchedAll.isEmpty && inserts.isEmpty)
      return DeleteResult(v, Nil, live.size) // nothing claimed: no commit
    // stat/clustering inheritance: identical to [[mergeInto]]
    val touchedSet = touchedAll.toSet
    val touchedStats = fileStats(spark, table, Some(v))
      .filter(st => touchedSet(st.path))
    val (outClustered, clusterCols) = Clustering.forWrite(spark, table, out)
    val statCols = (touchedStats.map(_.column)
      .filterNot(reservedStat) ++ clusterCols).distinct
    val keepRowCounts = touchedStats.exists(_.column == RowsStat) ||
      clusterCols.nonEmpty
    val dir = s"$table/data/mergew-${java.util.UUID.randomUUID().toString}"
    // CHECK constraints ride the write; the gate still sits before commit
    val (inst, check) = Constraints.observed(spark, table, outClustered, "merged")
    writeData(inst, dir)
    check()
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    // dv fold: tombstones for source keys retire (their ghosts dropped in
    // the rewrite above); survivors rewrite into one fresh dv. When no
    // file was touched, no source key appears in any candidate file, so
    // the fold would be the identity — skip it and keep the dv as-is.
    val dvParts =
      if (dvLive.isEmpty || touched.isEmpty) Nil
      else {
        val survivors = dv.get._1.dropDuplicates(keys).join(keySet, keys, "left_anti")
        val dvDir = s"$table/data/dv-${java.util.UUID.randomUUID().toString}"
        writeData(survivors.coalesce(1), dvDir)
        val ps = listParts(f, dvDir).map(_.getPath.toString)
        // emptiness from the fresh files' footers — no re-read job
        if (footerRowCount(spark, ps)
              .map(_ == 0L)
              .getOrElse(spark.read.parquet(ps: _*).isEmpty)) Nil
        else ps
      }
    val version = commit(spark, table, adds = parts,
      removes = touchedAll ++ (if (dvParts.nonEmpty || (dvLive.nonEmpty && touched.nonEmpty)) dvLive else Nil),
      baseVersion = Some(v), props = identityProps(parts),
      stats = computeStats(spark, dir, parts, statCols,
        withRowCounts = keepRowCounts),
      notes = note.toSeq, dvAdds = dvParts,
      addLens = lensOf(partsSt))
    DeleteResult(version, touchedAll, live.size - touchedAll.size)
  }

  /** Exact on-disk byte total of `files` from the manifest's recorded
    * `__bytes` stats at `version` — None when any file lacks one (caller
    * keeps the session plan policy). Metadata-only: the stats replay is
    * served by the parsed-manifest cache. */
  private def knownBytesOf(spark: SparkSession, table: String, v: Long,
                           files: Seq[String]): Option[Long] = {
    if (files.isEmpty) return Some(0L)
    val sizes = fileStats(spark, table, Some(v))
      .filter(st => st.column == BytesStat)
      .map(st => st.path -> st.min.toLong).toMap
    val known = files.flatMap(sizes.get)
    if (known.size == files.size) Some(known.sum) else None
  }

  /** Run `body` under a plan policy sized for a KNOWN-small input: when
    * `knownBytes` — the exact on-disk size of every file the body reads,
    * from the manifest — fits inside ONE AQE advisory partition, adaptive
    * re-planning has nothing to coalesce and no skew to split; it only
    * adds a planning round and an extra job per exchange to a statement
    * whose whole input is one partition's worth of bytes. Such bodies run
    * with AQE off and a byte-derived shuffle width. Anything larger (or
    * of unknown size: None) keeps the session policy untouched — the gate
    * is the data's real byte size, never a constant tuned to a host.
    * (Same data-conditional pattern as the pagerank/CC iteration width
    * and the classifier's broadcast regime.) */
  private def withSizedPlan[A](spark: SparkSession,
                               knownBytes: Option[Long])(body: => A): A = {
    val advisory = scala.util.Try(spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
      .getOrElse(64L * 1024 * 1024)
    knownBytes match {
      case Some(b) if b <= advisory =>
        val conf = spark.conf
        val prevAqe = conf.get("spark.sql.adaptive.enabled")
        val prevParts = conf.get("spark.sql.shuffle.partitions")
        val width = math.min(b / (4L * 1024 * 1024) + 1L,
          scala.util.Try(prevParts.toLong).getOrElse(200L))
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", width)
        try body finally {
          conf.set("spark.sql.adaptive.enabled", prevAqe)
          conf.set("spark.sql.shuffle.partitions", prevParts)
        }
      case _ => body
    }
  }

  /** Shared copy-on-write core of [[deleteWhere]]/[[updateWhere]]: find
    * the files `cond` actually touches (zone-map pruned, then a match
    * check so stat false positives are never rewritten), rewrite them
    * through `rewrite`, and swap old-for-new in ONE commit against the
    * resolved version. */
  private def rewriteWhere(spark: SparkSession, table: String,
                           cond: org.apache.spark.sql.Column, kind: String,
                           rewrite: DataFrame => DataFrame,
                           prune: Option[(String, String, String)]): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, count, input_file_name, lit}
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val candidates = prune match {
      case Some((c, lo, hi)) => pruneFiles(spark, table, c, lo, hi, Some(v))._1
      case None              => live
    }
    if (candidates.isEmpty) return DeleteResult(v, Nil, live.size)
    val sc = tableSchema(spark, table, Some(v))
    def read(files: Seq[String]) = schemaRead(spark, table, Some(v), files)
    val byName = candidates.map(p => new Path(p).getName -> p).toMap
    // every byte this statement reads is manifest-known (candidate files +
    // their dvs), so both the match check and the rewrite run under the
    // size-gated plan policy ([[withSizedPlan]])
    val kb = knownBytesOf(spark, table, v,
      candidates ++ liveDvFiles(spark, table, Some(v)))
    withSizedPlan(spark, kb) {
      // the match check ignores tombstoned rows (a file whose only matches
      // are MoR-deleted ghosts has nothing live to rewrite); __f binds to
      // the scan BEFORE the dv anti-join so the file attribution is exact
      val touched = applyDv(spark, table, Some(v),
          read(candidates).withColumn("__f", input_file_name()))
        .filter(coalesce(cond, lit(false)))
        .groupBy(col("__f")).agg(count(lit(1)))
        .collect().toSeq
        .flatMap(r => byName.get(new Path(r.getString(0)).getName))
      if (touched.isEmpty) DeleteResult(v, Nil, live.size)
      else commitCowRewrite(spark, table, v,
        rewrite(applyDv(spark, table, Some(v), read(touched))),
        touched, kind, live.size)
    }
  }

  /** Shared tail of every copy-on-write row mutation
    * ([[rewriteWhere]]/[[mutateAnti]]): write the rewritten rows of the
    * touched files and commit them in (removes = touched), inheriting
    * the touched files' zone-map coverage so future mutations keep
    * pruning (reserved pseudo-stats excluded: bytes re-record in
    * commit(), row counts recompute iff the touched files carried
    * them); clustered tables re-cluster the rewritten rows so layout
    * never decays. Ghosts drop from the rewritten files too (the dv
    * stays live for the untouched files — suppressing an already-absent
    * key is a no-op). */
  private def commitCowRewrite(spark: SparkSession, table: String, v: Long,
                               out: DataFrame, touched: Seq[String],
                               kind: String, liveSize: Int): DeleteResult = {
    val touchedStats = fileStats(spark, table, Some(v))
      .filter(st => touched.contains(st.path))
    val (rewritten, clusterCols) = Clustering.forWrite(spark, table, out)
    val statCols = (touchedStats.map(_.column)
      .filterNot(reservedStat) ++ clusterCols).distinct
    val keepRowCounts = touchedStats.exists(_.column == RowsStat) ||
      clusterCols.nonEmpty
    val dir = s"$table/data/$kind-${java.util.UUID.randomUUID().toString}"
    // UPDATE-shaped rewrites can introduce new row content: CHECK
    // constraints ride the write and gate before anything commits
    val (inst, check) =
      if (kind != "delete") Constraints.observed(spark, table, rewritten, kind)
      else (rewritten, () => Map.empty[String, Any])
    writeData(inst, dir)
    check()
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    val version = commit(spark, table, adds = parts, removes = touched,
      baseVersion = Some(v),
      stats = computeStats(spark, dir, parts, statCols,
        withRowCounts = keepRowCounts),
      addLens = lensOf(partsSt))
    DeleteResult(version, touched, liveSize - touched.size)
  }

  /** Exactly-once micro-batch append: write `df` under the DETERMINISTIC
    * per-batch directory and commit it — unless the manifest already
    * references that directory (the manifest is the idempotence ledger; a
    * checkpoint replay of a committed batch is a no-op, a crash between
    * data write and commit overwrites its own directory and commits the
    * fresh listing — the orphan is [[vacuum]] food). Shared by every
    * streaming maintenance gate (snapshot/BM25/sketch ingest). */
  def commitBatchOnce(spark: SparkSession, table: String, batchId: Long,
                      df: DataFrame): Unit = {
    val dir = s"$table/data/batch$batchId"
    val already = referencedFiles(spark, table).exists(_.contains(s"$dir/"))
    if (!already) {
      // clustered tables: micro-batches land range-clustered and zone-
      // mapped like any other write — streaming ingest must not be the
      // path that quietly erodes pruning
      val (clustered, clusterCols) = Clustering.forWrite(spark, table, df)
      // streaming ingest honors CHECK constraints like any other writer —
      // observed on the write, gated before the commit
      val (inst, check) = Constraints.observed(spark, table, clustered, "ingested")
      writeData(inst, dir, overwrite = true)
      check()
      val f = fs(spark, table)
      val partsSt = listParts(f, dir)
      val parts = partsSt.map(_.getPath.toString)
      val stats =
        if (clusterCols.isEmpty) Nil
        else computeStats(spark, dir, parts, clusterCols, withRowCounts = true)
      // an append is derivation-free, so losing a version race to a
      // concurrent writer (the ingest-vs-compaction pair every real
      // pipeline runs) just means re-resolving the next version — the
      // data dir is already on disk and unchanged
      var attempts = 0
      var committed = parts.isEmpty
      while (!committed)
        try {
          commit(spark, table, adds = parts, stats = stats,
            addLens = lensOf(partsSt))
          committed = true
        }
        catch {
          case _: ConcurrentCommitException if attempts < 50 => attempts += 1
        }
    }
  }

  /** Property key recording LOGICAL→PHYSICAL column renames
    * (`new=old,new2=old2`): `ALTER TABLE RENAME COLUMN` is metadata-only,
    * so files written before the rename keep the old physical name —
    * the mapping lets one scan serve both generations
    * ([[schemaRead]]) and keeps their zone maps pruning under the new
    * name ([[fileStats]] translates). */
  val MappingProp = "graft.column.mapping"

  /** Property key accumulating PHYSICAL names of dropped columns still
    * potentially present in live files — re-adding such a name would
    * silently resurrect the dropped data from old files, so ALTER ADD
    * refuses it ([[graft.sql.GraftCatalog]]). */
  val DroppedProp = "graft.columns.dropped"

  /** logical→physical rename mapping as of `version` (identity entries
    * never recorded). Immutable per (table, version) — memoized, because
    * every read/stat path consults it. */
  def columnMapping(spark: SparkSession, table: String,
                    version: Option[Long] = None): Map[String, String] = {
    val v = version.getOrElse(currentVersion(spark, table))
    val key = (table, v)
    val cached = mappingCache.get(key)
    if (cached != null) cached
    else {
      val m = tableProperties(spark, table, Some(v)).get(MappingProp)
        .map(_.split(',').toSeq.map(_.trim).filter(_.contains("="))
          .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }
          .toMap).getOrElse(Map.empty)
      if (mappingCache.size > 65536) mappingCache.clear()
      mappingCache.put(key, m)
      m
    }
  }

  private val mappingCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Map[String, String]]()

  /** Mapping-aware schema read of table data `files` — the shared tail
    * of every pruned/full read. With no rename mapping this is the plain
    * recorded-schema read. With one, the schema widens with each renamed
    * column's PHYSICAL name so files from BOTH sides of the metadata-only
    * rename resolve in ONE parquet scan: old files populate the physical
    * field (the logical is absent → null), new files the logical, and the
    * logical value is `coalesce(logical, physical)`. Dropped columns are
    * simply absent from the schema — files unrewritten, reads project
    * them away. */
  private[graft] def schemaRead(spark: SparkSession, table: String,
                                version: Option[Long],
                                files: Seq[String]): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, table))
    schemaReadWith(spark, tableSchema(spark, table, Some(v)),
      columnMapping(spark, table, Some(v)), files)
  }

  private[graft] def schemaReadWith(spark: SparkSession,
                                    sc: Option[StructType],
                                    mapping: Map[String, String],
                                    files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    sc match {
      case None => spark.read.parquet(files: _*)
      case Some(s) if mapping.forall { case (l, p) =>
          p == l || !s.fieldNames.contains(l) } =>
        spark.read.schema(s).parquet(files: _*)
      case Some(s) =>
        val extra = mapping.collect {
          case (lg, ph) if s.fieldNames.contains(lg) && ph != lg =>
            org.apache.spark.sql.types.StructField(ph, s(lg).dataType, nullable = true)
        }
        val wide = StructType(s.fields.map(_.copy(nullable = true)) ++ extra)
        spark.read.schema(wide).parquet(files: _*).select(s.fields.map { f =>
          mapping.get(f.name).filter(_ != f.name) match {
            case Some(ph) => coalesce(col(f.name), col(ph)).as(f.name)
            case None     => col(f.name)
          }
        }: _*)
    }
  }

  /** The recorded table schema as of `version` (default current): the
    * newest schema stamp at or before it. None for tables that never
    * recorded one (pre-evolution manifests read file-inferred, as ever).
    * Commit manifests are never deleted (vacuum reclaims only data
    * files), so the scan always sees the full stamp history. */
  def tableSchema(spark: SparkSession, table: String,
                  version: Option[Long] = None): Option[StructType] = {
    val f = fs(spark, table)
    val v = version.getOrElse(currentVersion(spark, table))
    versions(spark, table).filter(_ <= v).sorted.reverse.view.flatMap { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json"))
        .collectFirst { case ("schema", s) =>
          org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[StructType]
        }
    }.headOption.orElse {
      // stamps committed before an [[expireVersions]] horizon survive in
      // the full-state checkpoint (the commits that carried them are gone)
      checkpointVersions(spark, table).filter(_ <= v).sorted.reverse.view.flatMap { c =>
        parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
          .collectFirst { case ("schema", s) =>
            org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[StructType]
          }
      }.headOption
    }
  }

  /** TABLE PROPERTIES as of `version` (default current): replay the
    * newest checkpoint ≤ version (it carries the resolved map), then the
    * commit tail's "prop" lines, last-wins per key — so properties time
    * travel with the data (`AS OF` a version sees the knobs that governed
    * it) and survive [[expireVersions]] like every other metadata stream.
    * Engine-recognized keys: `write.delete.mode` (`cow` default | `mor`)
    * and `write.merge.keys` (the MoR tombstone key columns) — see
    * [[graft.sql.GraftCatalog]]; everything else is user-opaque. */
  def tableProperties(spark: SparkSession, table: String,
                      version: Option[Long] = None): Map[String, String] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    val v = version.getOrElse(currentVersion(spark, table))
    if (!f.exists(dir)) return Map.empty
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    val ckpt = names.flatMap {
      case CheckpointFile(c) if c.toLong <= v => Some(c.toLong)
      case _ => None
    }.sorted.lastOption
    val known = names.flatMap { case CommitFile(c) => Some(c.toLong); case _ => None }.toSet
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def fold(lines: Seq[(String, String)]): Unit =
      lines.foreach {
        case ("prop", payload) => payload.split(StatSep, 2) match {
          case Array(k, value) => out(k) = value
          case Array(k)        => out.remove(k)
          case _               =>
        }
        case _ =>
      }
    ckpt.foreach(c => fold(parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))))
    (ckpt.getOrElse(0L) + 1 to v).filter(known).foreach(c =>
      fold(parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json"))))
    out.toMap
  }

  /** The live data-file set at `version` (default: current): start from
    * the newest checkpoint ≤ version, replay the commit tail. */
  def liveFiles(spark: SparkSession, table: String,
                version: Option[Long] = None): Seq[String] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    val v = version.getOrElse(currentVersion(spark, table))
    if (!f.exists(dir)) return Seq.empty
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    val ckpt = names.flatMap {
      case CheckpointFile(c) if c.toLong <= v => Some(c.toLong)
      case _ => None
    }.sorted.lastOption
    val known = names.flatMap { case CommitFile(c) => Some(c.toLong); case _ => None }.toSet
    require(v == 0 || known.contains(v) || ckpt.contains(v),
      s"version $v of $table does not exist")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    ckpt.foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
        .foreach {
          // checkpoints carry "add" (data) and "dv" (tombstone) lines;
          // only the data files belong to the live set
          case ("add", p) => live += p
          case _          =>
        }
    }
    val from = ckpt.getOrElse(0L) + 1
    (from to v).filter(known).foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json"))
        .foreach {
          case ("add", p)    => live += p
          case ("remove", p) => live -= p
          case _             =>
        }
    }
    live.toSeq
  }

  /** The live DELETION-VECTOR file set at `version` (default current) —
    * the merge-on-read side of the mutation surface ([[deleteWhereMor]]).
    * Same checkpoint + commit-tail replay as [[liveFiles]]: "dv" adds a
    * tombstone file, "remove" retires it (fold by [[mergeInto]]/
    * [[compact]]/[[optimizeZorder]]). */
  def liveDvFiles(spark: SparkSession, table: String,
                  version: Option[Long] = None): Seq[String] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    val v = version.getOrElse(currentVersion(spark, table))
    if (!f.exists(dir)) return Seq.empty
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    val ckpt = names.flatMap {
      case CheckpointFile(c) if c.toLong <= v => Some(c.toLong)
      case _ => None
    }.sorted.lastOption
    val known = names.flatMap { case CommitFile(c) => Some(c.toLong); case _ => None }.toSet
    val dv = scala.collection.mutable.LinkedHashSet.empty[String]
    ckpt.foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
        .foreach { case ("dv", p) => dv += p; case _ => }
    }
    val from = ckpt.getOrElse(0L) + 1
    (from to v).filter(known).foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json"))
        .foreach {
          case ("dv", p)     => dv += p
          case ("remove", p) => dv -= p
          case _             =>
        }
    }
    dv.toSeq
  }

  /** The live BLOOM-INDEX sidecar files at `version` (default current) —
    * [[buildBloomIndex]]'s per-data-file membership filters. Same replay
    * as [[liveDvFiles]]: "bloom" adds a sidecar, "remove" retires it
    * (index rebuilds), full-state checkpoints carry live sidecars across
    * [[expireVersions]]. */
  def liveBloomFiles(spark: SparkSession, table: String,
                     version: Option[Long] = None): Seq[String] = {
    val f = fs(spark, table)
    val dir = new Path(manifestDir(table))
    val v = version.getOrElse(currentVersion(spark, table))
    if (!f.exists(dir)) return Seq.empty
    val names = f.listStatus(dir).toSeq.map(_.getPath.getName)
    val ckpt = names.flatMap {
      case CheckpointFile(c) if c.toLong <= v => Some(c.toLong)
      case _ => None
    }.sorted.lastOption
    val known = names.flatMap { case CommitFile(c) => Some(c.toLong); case _ => None }.toSet
    val bl = scala.collection.mutable.LinkedHashSet.empty[String]
    ckpt.foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
        .foreach { case ("bloom", p) => bl += p; case _ => }
    }
    val from = ckpt.getOrElse(0L) + 1
    (from to v).filter(known).foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$c%010d.json"))
        .foreach {
          case ("bloom", p)  => bl += p
          case ("remove", p) => bl -= p
          case _             =>
        }
    }
    bl.toSeq
  }

  /** The live tombstone keys at `version`, with their key column names —
    * None when no deletion vectors are live. All live dv files share one
    * key schema ([[deleteWhereMor]] enforces it at write). */
  private def dvKeys(spark: SparkSession, table: String,
                     version: Option[Long]): Option[(DataFrame, Seq[String])] = {
    val files = liveDvFiles(spark, table, version)
    if (files.isEmpty) None
    else {
      val df = spark.read.parquet(files: _*)
      Some((df, df.columns.toSeq))
    }
  }

  /** Merge-on-read resolution: drop every row whose key is tombstoned by
    * a live deletion vector. No-op without live dvs. The anti-join is the
    * read-side cost of MoR, and its SHAPE is the 100 TB concern: the
    * tombstone side is point-delete-sized by contract (a predicate
    * expected to match a large fraction of the table belongs to
    * [[deleteWhere]], and [[compact]] folds dvs on schedule), so it is
    * BROADCAST — the corpus never shuffles for the suppression. The hint
    * is guarded by the dvs' on-disk size (metadata already in hand), so a
    * pathologically large tombstone set degrades to a plan AQE can still
    * pick the join for, instead of an executor OOM. A left-anti join is
    * insensitive to right-side duplicates, so no dedup runs here. */
  private val DvBroadcastMaxBytes = 256L * 1024 * 1024

  private def applyDv(spark: SparkSession, table: String,
                      version: Option[Long], df: DataFrame): DataFrame = {
    val files = liveDvFiles(spark, table, version)
    if (files.isEmpty) df
    else {
      val dv = spark.read.parquet(files: _*)
      val keys = dv.columns.toSeq
      val f = fs(spark, table)
      val bytes = files.map(p => f.getFileStatus(new Path(p)).getLen).sum
      val right =
        if (bytes <= DvBroadcastMaxBytes) org.apache.spark.sql.functions.broadcast(dv)
        else dv
      df.join(right, keys, "left_anti")
    }
  }

  /** Time-travel read: the table as of `version` (default current). An
    * empty live set needs a schema (passed or recorded) to produce a
    * typed empty frame. With no explicit `schema`, the schema RECORDED as
    * of `version` (see [[commitAppend]] `recordSchema`) governs the read:
    * files committed under an older, narrower schema come back
    * null-padded in the evolved columns, and time travel to a
    * pre-evolution version sees the pre-evolution shape. */
  def readAt(spark: SparkSession, table: String, version: Option[Long] = None,
             schema: Option[StructType] = None): DataFrame = {
    val files = liveFiles(spark, table, version)
    val sc = schema.orElse(tableSchema(spark, table, version))
    if (files.isEmpty) {
      val s = sc.getOrElse(throw new IllegalArgumentException(
        s"version ${version.getOrElse(0L)} of $table is empty; pass a schema"))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    } else {
      // merge-on-read: live deletion vectors resolve at read time — time
      // travel to a pre-delete version sees no dv and reads the full set
      applyDv(spark, table, version, schemaReadWith(spark, sc,
        columnMapping(spark, table, version), files))
    }
  }

  /** ROW-level change-data feed between two versions — the CDC-read shape
    * (what lakehouse "change data feed" serves): every key that was
    * inserted, deleted, or updated between `v1` and `v2`, with before and
    * after values for the non-key columns. `keys` must identify a row
    * uniquely within a version (the [[mergeInto]]/[[updateWhere]]
    * contract).
    *
    * Scale posture — O(changed files), not O(table): under copy-on-write
    * every live file is immutable, so a file referenced by BOTH manifests
    * contributes the same rows to both sides and cannot produce a change.
    * Only `files(v1) Δ files(v2)` are read (a CoW rewrite copies a
    * touched file's unmodified rows into a new file — those keys land on
    * both sides of the join with equal values and are dropped by the
    * change filter). The join shuffles just the symmetric difference on
    * the key columns; a narrow merge's CDC read costs the files that
    * merge rewrote, never the table.
    *
    * Returns `keys…, change ∈ insert|delete|update, <col>_before,
    * <col>_after …` for every non-key column, null on the absent side. */
  def rowDiff(spark: SparkSession, table: String, v1: Long, v2: Long,
              keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when, coalesce}
    val f1 = liveFiles(spark, table, Some(v1)).toSet
    val f2 = liveFiles(spark, table, Some(v2)).toSet
    // both sides resolve under the NEWER version's recorded schema (the
    // CDC convention across widening commits: old rows null-padded)
    val sc = tableSchema(spark, table, Some(math.max(v1, v2)))
    def read(files: Set[String], v: Long): DataFrame =
      if (files.isEmpty) readAt(spark, table, Some(v), schema = sc).limit(0)
      else schemaReadWith(spark, sc,
        columnMapping(spark, table, Some(math.max(v1, v2))), files.toSeq)
    // each side resolves its own deletion vectors (merge-on-read: a
    // tombstoned row is not part of that version)
    val dvF1 = liveDvFiles(spark, table, Some(v1)).toSet
    val dvF2 = liveDvFiles(spark, table, Some(v2)).toSet
    val before0 = applyDv(spark, table, Some(v1), read(f1 -- f2, v1))
    val after0 = applyDv(spark, table, Some(v2), read(f2 -- f1, v2))
    // When the dv sets differ, SHARED files can hide changes: a MoR
    // delete removes rows without touching any data file. The tombstone
    // DELTA names exactly the affected keys, so one semi-joined scan of
    // the shared files recovers them — row output stays O(changed keys),
    // the file-Δ posture holds for everything else.
    val (before, after) =
      if (dvF1 == dvF2) (before0, after0)
      else {
        val kA = dvKeys(spark, table, Some(v1))
        val kB = dvKeys(spark, table, Some(v2))
        for { (_, ca) <- kA; (_, cb) <- kB } require(ca.sorted == cb.sorted,
          s"deletion vectors of $table changed key columns between v$v1 and v$v2")
        val dcols = kB.map(_._2).orElse(kA.map(_._2)).get
        val shared = f1 intersect f2
        if (shared.isEmpty) (before0, after0)
        else {
          def dedup(o: Option[(DataFrame, Seq[String])]) =
            o.map(_._1.dropDuplicates(dcols))
          val sharedDf = read(shared, v1)
          def delta(x: Option[DataFrame], y: Option[DataFrame]): Option[DataFrame] =
            (x, y) match {
              case (Some(a), Some(b)) => Some(a.join(b, dcols, "left_anti"))
              case (Some(a), None)    => Some(a)
              case _                  => None
            }
          val deleted = delta(dedup(kB), dedup(kA))   // tombstoned v1→v2
          val restored = delta(dedup(kA), dedup(kB))  // un-tombstoned (fold + re-insert)
          val bx = deleted.map(d => before0.unionByName(
            sharedDf.join(d, dcols, "left_semi"), allowMissingColumns = true))
            .getOrElse(before0)
          val ax = restored.map(r => after0.unionByName(
            sharedDf.join(r, dcols, "left_semi"), allowMissingColumns = true))
            .getOrElse(after0)
          (bx, ax)
        }
      }
    // With a recorded schema both sides already share it. Without one, the
    // two file sets may have diverged shapes (files written before/after a
    // widening); selecting after's columns from before would then throw
    // AnalysisException instead of the documented null-padded CDC read —
    // so the column set is the UNION (after's order first) and each side
    // null-pads what it lacks.
    val cols =
      if (sc.isDefined) after.columns.toSeq
      else (after.columns ++ before.columns.filterNot(after.columns.contains)).toSeq
    def side(df: DataFrame, c: String): org.apache.spark.sql.Column =
      if (df.columns.contains(c)) col(c) else lit(null)
    val nonKeys = cols.filterNot(keys.contains)
    val b = before.select(lit(1).as("__in_b") +: cols.map(c => side(before, c).as(s"__b_$c")): _*)
    val a = after.select(lit(1).as("__in_a") +: cols.map(c => side(after, c).as(s"__a_$c")): _*)
    val joined = b.join(a,
      keys.map(k => col(s"__b_$k") <=> col(s"__a_$k")).reduce(_ && _), "full_outer")
    val changed = nonKeys.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change",
        when(col("__in_b").isNull, "insert")
          .when(col("__in_a").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"__b_$k"), col(s"__a_$k")).as(k)) ++
          Seq(col("change")) ++
          nonKeys.flatMap(c => Seq(col(s"__b_$c").as(s"${c}_before"),
            col(s"__a_$c").as(s"${c}_after"))): _*)
  }

  /** File-level diff between two versions: (path, change ∈ added|removed),
    * ordered. */
  def diff(spark: SparkSession, table: String, v1: Long, v2: Long): DataFrame = {
    import spark.implicits._
    val a = liveFiles(spark, table, Some(v1)).toSet
    val b = liveFiles(spark, table, Some(v2)).toSet
    ((b -- a).toSeq.sorted.map(p => (p, "added")) ++
      (a -- b).toSeq.sorted.map(p => (p, "removed")))
      .toDF("path", "change")
  }

  /** Write a checkpoint of the live set at the current version — readers
    * then replay only the tail. Create-once like commits; checkpointing
    * an already-checkpointed version is a no-op. */
  /** Write a FULL-STATE checkpoint at `version` (default current): the
    * live data/dv sets plus everything resolution otherwise replays from
    * the commit history — the newest schema stamp, the live files' zone-map
    * stats, and the complete note ledger as of that version. Pre-expiry a
    * checkpoint merely shortens replay; after [[expireVersions]] it IS the
    * history for everything at or below it. */
  def checkpoint(spark: SparkSession, table: String): Long =
    checkpointAt(spark, table, currentVersion(spark, table))

  def checkpointAt(spark: SparkSession, table: String, version: Long): Long = {
    if (version == 0) return 0
    val f = fs(spark, table)
    val p = new Path(f"${manifestDir(table)}/c$version%010d.json")
    val lines = checkpointLines(spark, table, version)
    writeExclusive(f, p, lines)
    // verified regardless of which writer won the create race: the file
    // now on disk must carry the full state this version resolves to, or
    // the caller must not treat the checkpoint as an anchor (see
    // [[expireVersions]] — deleting history against a partial or
    // stale-format checkpoint silently truncates schema/stats/notes)
    try verifyCheckpoint(spark, table, version, lines)
    catch {
      case e: IllegalStateException =>
        // a stale (pre-full-state) or partial checkpoint squats at this
        // version. REPAIR only when it is not LOAD-BEARING: resolution
        // must be complete without it — full commit history survives, or
        // an earlier checkpoint (the expiry anchor at versions.head)
        // carries the truncated prefix. Then DELETE the squatter FIRST
        // (checkpointLines itself resolves through the newest checkpoint
        // at or below `version` — regenerating while the squatter exists
        // would bake its stale live set into the "repair"), re-derive the
        // full state from the intact history, republish, and re-verify.
        // Without the repair, the squatter would permanently block both
        // checkpoint() and expireVersions() at this version: vacuum only
        // sweeps data/ and _index/, never _manifest/c*.json.
        val known = versions(spark, table)
        val anchored = known.headOption.exists(_ > 1L) // truncated history
        if (anchored && version <= known.head) throw e // the anchor itself
        f.delete(p, false)
        // the repair REWRITES this path in place — drop the parsed-cache
        // entry explicitly: a fresh file of identical byte length landing
        // within the same mtime granule (1 s local fs, PUT-time on object
        // stores) would otherwise validate against the squatter's entry
        // and serve the stale parse
        manifestCache.remove(p.toString)
        val fresh = checkpointLines(spark, table, version)
        // lost create races here are benign: any winner also derived from
        // the squatter-free history, so the content verifies either way
        writeExclusive(f, p, fresh)
        verifyCheckpoint(spark, table, version, fresh)
    }
    version
  }

  /** The full-state checkpoint content at `version`: live data/dv/bloom
    * sets, newest schema stamp, live files' zone-map stats, and the exact
    * note ledger up to `version`. */
  private def checkpointLines(spark: SparkSession, table: String,
                              version: Long): Seq[String] =
    tableSchema(spark, table, Some(version)).map(s =>
      s"""{"a":"schema","p":${jq(s.json)}}""").toSeq ++
    liveFiles(spark, table, Some(version))
      .map(p => s"""{"a":"add","p":${jq(p)}}""") ++
    liveDvFiles(spark, table, Some(version))
      .map(p => s"""{"a":"dv","p":${jq(p)}}""") ++
    liveBloomFiles(spark, table, Some(version))
      .map(p => s"""{"a":"bloom","p":${jq(p)}}""") ++
    fileStats(spark, table, Some(version)).map(st =>
      s"""{"a":"stat","p":${jq(
        Seq(st.path, st.column, st.dtype, st.min, st.max).mkString(StatSep))}}""") ++
    tableProperties(spark, table, Some(version)).toSeq.sortBy(_._1).map {
      case (k, v) => s"""{"a":"prop","p":${jq(s"$k$StatSep$v")}}"""
    } ++
    notesUpTo(spark, table, version).map(s => s"""{"a":"note","p":${jq(s)}}""")

  /** Assert the checkpoint file at `version` exists and carries exactly
    * the state `version` resolves to right now (order-insensitive, per
    * action). Throws IllegalStateException otherwise — the caller was
    * about to anchor on a checkpoint that never landed, landed partially
    * (non-atomic filesystem), or predates full-state checkpoints. */
  private def verifyCheckpoint(spark: SparkSession, table: String,
                               version: Long, expected: Seq[String]): Unit = {
    val f = fs(spark, table)
    val p = new Path(f"${manifestDir(table)}/c$version%010d.json")
    if (!f.exists(p)) throw new IllegalStateException(
      s"checkpoint at version $version of $table was not published")
    def byAction(lines: Seq[String]): Map[String, Set[String]] =
      lines.flatMap(parseLine).groupBy(_._1).map { case (a, xs) =>
        a -> xs.map(_._2).toSet
      }
    val got = parsedManifest(f, p).groupBy(_._1).map { case (a, xs) =>
      a -> xs.map(_._2).toSet
    }
    val want = byAction(expected)
    // notes compare as sets here (duplicate ledger entries collapse under
    // Set, but the ledger is append-only strings — a stale checkpoint is
    // missing entries, which the subset check catches)
    val bad = (want.keySet ++ got.keySet).filter { a =>
      if (a == "note") !want.getOrElse(a, Set.empty).subsetOf(got.getOrElse(a, Set.empty))
      else want.getOrElse(a, Set.empty) != got.getOrElse(a, Set.empty)
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"checkpoint at version $version of $table is stale or partial " +
        s"(mismatched sections: ${bad.toSeq.sorted.mkString(", ")}); " +
        "it cannot anchor expiry — [[checkpointAt]] rewrites damaged " +
        "checkpoints in place, so seeing this AFTER its repair pass means " +
        "the manifest history itself no longer resolves this version's " +
        "full state")
  }

  /** The committed note ledger up to `version`, ascending commit order,
    * DUPLICATES PRESERVED. Pre-expiry this is the commit manifests' own
    * note lines; once [[expireVersions]] has truncated history, the
    * newest surviving checkpoint's recorded ledger is the prefix and the
    * surviving commits' lines follow. */
  private def notesUpTo(spark: SparkSession, table: String,
                        version: Long): Seq[String] = {
    val f = fs(spark, table)
    val known = versions(spark, table)
    def commitNotes(vs: Seq[Long]): Seq[String] = vs.flatMap { v =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$v%010d.json"))
        .collect { case ("note", s) => s }
    }
    // commits are numbered from 1 and only expiry deletes manifests, so a
    // missing v1 is THE signal that history was truncated below a
    // checkpoint; everywhere else the commits alone are the exact ledger
    val truncated = known.headOption.exists(_ > 1L)
    val ckpt = checkpointVersions(spark, table).filter(_ <= version).lastOption
    (truncated, ckpt) match {
      case (false, _) | (true, None) => commitNotes(known.filter(_ <= version))
      case (true, Some(c)) =>
        val prefix = parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
          .collect { case ("note", s) => s }
        prefix ++ commitNotes(known.filter(v => v > c && v <= version))
    }
  }

  /** All note strings ever committed, ascending version order with
    * duplicates preserved — the exactly-once ledger a streaming MERGE
    * replays against (its data dirs are non-deterministic, so the
    * path-based [[commitBatchOnce]] check can't serve it). Entries whose
    * commits were expired survive via the newest full-state checkpoint's
    * recorded ledger (exact from checkpoints written at or after this
    * version of the code; older checkpoints recorded a deduplicated set). */
  def notes(spark: SparkSession, table: String): Seq[String] =
    notesUpTo(spark, table, currentVersion(spark, table))

  /** One row of [[history]]: what a commit did, at metadata granularity. */
  final case class CommitInfo(version: Long, adds: Int, removes: Int,
                              dvAdds: Int, schemaStamped: Boolean,
                              notes: Seq[String], tsMillis: Long = 0L)

  /** DESCRIBE HISTORY: every commit's action summary, ascending — the
    * operational audit surface ("what landed in v7?", "which commits
    * were merges?", "when did tombstones fold?"). Pure manifest
    * metadata: O(commits) driver work, no data file is opened. Notes
    * identify streaming batches ([[graft.streaming.MergeGate]] tags);
    * dvAdds > 0 marks merge-on-read deletes; adds+removes > 0 with one
    * note is a CDC merge; removes without adds is impossible by
    * construction (every mutator swaps, never bare-drops). */
  def history(spark: SparkSession, table: String): Seq[CommitInfo] = {
    val f = fs(spark, table)
    versions(spark, table).map { v =>
      var adds = 0; var removes = 0; var dvs = 0; var schema = false
      var ts = 0L
      val notes = scala.collection.mutable.ArrayBuffer.empty[String]
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$v%010d.json"))
        .foreach {
          case ("add", _)    => adds += 1
          case ("remove", _) => removes += 1
          case ("dv", _)     => dvs += 1
          case ("schema", _) => schema = true
          case ("note", s)   => notes += s
          case ("ts", s)     => ts = s.toLong
          case _             =>
        }
      CommitInfo(v, adds, removes, dvs, schema, notes.toSeq,
        if (ts != 0L) ts
        else f.getFileStatus(new Path(f"${manifestDir(table)}/v$v%010d.json"))
          .getModificationTime)
    }
  }

  /** Every path any commit EVER added or removed — the full referenced
    * set across history (what [[vacuum]] must preserve, and the
    * idempotence token streaming ingest replays against). */
  def referencedFiles(spark: SparkSession, table: String): Set[String] = {
    val f = fs(spark, table)
    val referenced = scala.collection.mutable.HashSet.empty[String]
    // a file is referenced iff some EXISTING manifest ADDS it (a version
    // that resolves to it must replay an add — commits hold post-horizon
    // adds, full-state checkpoints carry the horizon's live sets across
    // [[expireVersions]]). Remove-only mentions protect nothing: their
    // adding commit either still exists (pre-expiry, always) or every
    // version that could include the file is itself expired — that
    // distinction is what lets expiry actually free storage.
    versions(spark, table).foreach { v =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/v$v%010d.json"))
        .foreach {
          case ("add", p)   => referenced += p
          case ("dv", p)    => referenced += p
          case ("bloom", p) => referenced += p
          case _            =>
        }
    }
    checkpointVersions(spark, table).foreach { c =>
      parsedManifest(f, new Path(f"${manifestDir(table)}/c$c%010d.json"))
        .foreach {
          case ("add", p)   => referenced += p
          case ("dv", p)    => referenced += p
          case ("bloom", p) => referenced += p
          case _            =>
        }
    }
    referenced.toSet
  }

  /** Outcome of an [[expireVersions]]: the versions whose manifests were
    * expired and the full-state checkpoint now anchoring the horizon. */
  final case class ExpireResult(expired: Seq[Long], checkpointAt: Long)

  /** EXPIRE history below `keepFrom` — the retention pass that BOUNDS
    * STORAGE (Iceberg `expire_snapshots` / Delta retention shape). Time
    * travel forever is the default here, but at 100 TB under copy-on-write
    * churn every rewrite's old files stay referenced and storage grows
    * without bound; this is the deliberate forgetting step:
    *
    *  1. write a FULL-STATE checkpoint at `keepFrom` (live sets + schema +
    *     stats + note ledger — everything resolution would have replayed
    *     from the doomed commits; see [[checkpointAt]]);
    *  2. delete commit and checkpoint manifests strictly below `keepFrom`.
    *
    * Versions ≥ `keepFrom` keep resolving exactly as before (checkpoint +
    * commit tail); versions below it now REJECT with the ordinary
    * unknown-version error. Data files referenced only by expired
    * versions become unreferenced and the next [[vacuum]] reclaims them —
    * that reclamation is the point. The exactly-once note ledger and the
    * zone maps survive in the checkpoint, so streaming replays and pruned
    * reads are unaffected.
    *
    * Safety refusals: a TAG pinned below `keepFrom` blocks expiry (tags
    * are the reproducibility contract — delete the tag first if you mean
    * it); `keepFrom` must be an existing version. Change-feed consumers
    * must be caught up past the horizon before expiring (same constraint
    * every CDC retention window imposes) — [[ChangeFeed.sync]] on an
    * expired span fails loudly rather than skipping silently. */
  def expireVersions(spark: SparkSession, table: String,
                     keepFrom: Long): ExpireResult = {
    val f = fs(spark, table)
    val known = versions(spark, table)
    require(known.contains(keepFrom),
      s"version $keepFrom of $table does not exist")
    val pinned = tags(spark, table).filter(_._2 < keepFrom)
    require(pinned.isEmpty,
      s"tags ${pinned.keys.mkString(", ")} pin versions below $keepFrom; " +
        "delete them before expiring")
    // throws unless a VERIFIED full-state checkpoint now anchors keepFrom
    // (publish failed, or a stale pre-full-state checkpoint squats there) —
    // deleting history without that anchor would destroy the live set /
    // schema / stats / note ledger for every version at the horizon
    checkpointAt(spark, table, keepFrom)
    // TAG-RACE SEAL: publish the retention floor, then re-read tags. A tag
    // created before this re-read is seen here (abort + retract); one
    // created after it necessarily reads the floor AFTER its own create
    // ([[tag]]'s post-create check) and self-rejects. Either way a tag()
    // call that RETURNED never dangles across an expiry that COMPLETED.
    // (Concurrent expireVersions calls are not coordinated — run one
    // retention maintainer per table, the usual scheduler contract.)
    val prevFloor = retentionHorizon(spark, table)
    writeHorizon(spark, table, keepFrom)
    val late = tags(spark, table).filter(_._2 < keepFrom)
    if (late.nonEmpty) {
      writeHorizon(spark, table, prevFloor)
      throw new IllegalStateException(
        s"tags ${late.keys.mkString(", ")} were pinned below $keepFrom " +
          "while expiry was preparing; nothing was deleted — delete the " +
          "tags and retry if the expiry is intended")
    }
    val doomedC = checkpointVersions(spark, table).filter(_ < keepFrom)
    val doomedV = known.filter(_ < keepFrom)
    // delete NEWEST-FIRST: a racing reader of a doomed version then either
    // resolves it completely (every older commit it replays still exists)
    // or rejects it as unknown — never a silently partial live set
    doomedV.sorted.reverse.foreach(v =>
      f.delete(new Path(f"${manifestDir(table)}/v$v%010d.json"), false))
    doomedC.sorted.reverse.foreach(c =>
      f.delete(new Path(f"${manifestDir(table)}/c$c%010d.json"), false))
    ExpireResult(doomedV, keepFrom)
  }

  /** The table's RETENTION FLOOR: the highest `keepFrom` any
    * [[expireVersions]] has prepared (0 = never expired). Published
    * BEFORE manifests are deleted; [[tag]] re-validates against it after
    * creating, which closes the tag-vs-expiry race window. */
  def retentionHorizon(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val p = new Path(s"${manifestDir(table)}/_horizon")
    if (!f.exists(p)) 0L
    else scala.util.Try(readLines(f, p).head.trim.toLong).getOrElse(0L)
  }

  /** Atomic-REPLACE publish of the retention floor marker (unlike
    * manifests, the marker is mutable — it advances with each expiry and
    * retracts on an aborted one). Local fs: ATOMIC_MOVE, readers see old
    * or new, never partial. Other stores: delete + rename — a reader in
    * the gap resolves floor 0, which only weakens the tag check back to
    * the pre-marker behavior, never corrupts state. */
  private def writeHorizon(spark: SparkSession, table: String, v: Long): Unit =
    atomicReplace(fs(spark, table), new Path(s"${manifestDir(table)}/_horizon"),
      (v.toString + "\n").getBytes(StandardCharsets.UTF_8))

  /** Atomic-REPLACE publish of a mutable marker/repair target (unlike
    * [[writeExclusive]] the target may exist). Local fs: ATOMIC_MOVE,
    * readers see old or new content, never partial. Other stores:
    * delete + rename — a reader in the gap sees the target ABSENT, and
    * every caller here tolerates that (a missing floor weakens the tag
    * check to pre-marker behavior; a missing checkpoint falls back to
    * commit replay). */
  private def atomicReplace(f: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val scheme = p.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(nio.getParent)
      val tmp = nio.resolveSibling(
        s".${nio.getFileName}.tmp.${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, nio,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val tmp = new Path(p.getParent,
        s".${p.getName}.tmp.${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      f.delete(p, false)
      if (!f.rename(tmp, p)) {
        try f.delete(tmp, false) catch { case _: java.io.IOException => () }
        throw new java.io.IOException(s"atomic replace of $p failed")
      }
    }
  }

  /** Rewrite the current live set into `targetFiles` files and commit the
    * swap as ONE transaction (adds the compacted files, removes the
    * fragmented ones) against the resolved version — a concurrent writer
    * wins the race and the compaction retries later. Old versions keep
    * time-traveling: removed files stay referenced by their original
    * commits, so [[vacuum]] never reclaims them. Returns the new version
    * (or the current one when there is nothing to compact). */
  def compact(spark: SparkSession, table: String, targetFiles: Int = 1,
              bloomFpp: Double = 0.01): Long = {
    val v = currentVersion(spark, table)
    val files = liveFiles(spark, table, Some(v))
    val dvs = liveDvFiles(spark, table, Some(v))
    // live deletion vectors always compact (the fold is the point: the
    // anti-join materializes once and the read path stops paying it)
    if (files.size <= targetFiles && dvs.isEmpty) return v
    val dir = s"$table/data/compact-${java.util.UUID.randomUUID().toString}"
    writeData(readAt(spark, table, Some(v)) // dv-resolved: tombstones fold out
      .repartition(targetFiles), dir)
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    // a full rewrite orphans every bloom sidecar entry (all data files
    // retire), so the index refreshes IN the same commit: new sidecars
    // for the new files, old sidecars retired — reads keep pruning with
    // no unindexed window ([[buildBloomIndex]] would otherwise have to
    // catch up later, with conservative full scans in between)
    val idxCols = bloomIndexedColumns(spark, table, v)
    val oldSidecars = liveBloomFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    val bloomParts = idxCols.flatMap(c =>
      bloomSidecarFor(spark, table, parts, c, bloomFpp, sc))
    commit(spark, table, adds = parts, removes = files ++ dvs ++ oldSidecars,
      baseVersion = Some(v), bloomAdds = bloomParts,
      addLens = lensOf(partsSt))
  }

  /** RESTORE the table to the content of `toVersion` as a NEW commit —
    * non-destructive rollback (the `RESTORE TABLE … TO VERSION` shape):
    * the live data-file and deletion-vector sets become exactly those of
    * `toVersion`, while every intermediate version keeps time-traveling
    * (nothing is deleted; the bad versions stay inspectable forever).
    *
    * Cost is METADATA-ONLY at any scale: the commit re-references
    * `toVersion`'s immutable files (still on disk — [[vacuum]] only ever
    * reclaims files no manifest references), so rolling a 100 TB table
    * back from a bad ingest writes one manifest file, zero data bytes.
    * Re-added files regain their zone-map stats for free ([[fileStats]]
    * replays the full stamp history against the live set). The schema
    * recorded at `toVersion` is re-stamped when it differs from the
    * current one, so post-restore reads resolve under the restored shape.
    * Restoring to the current content is a no-op (returns the current
    * version, no empty commit). Optimistic concurrency as everywhere: the
    * commit lands against the resolved version or throws
    * [[ConcurrentCommitException]].
    *
    * Reference analog: none (north-star extension) — the "roll back the
    * bad ingest" leg of the versioning story in the class doc. */
  def restore(spark: SparkSession, table: String, toVersion: Long,
              note: Option[String] = None): Long = {
    val v = currentVersion(spark, table)
    val targetFiles = liveFiles(spark, table, Some(toVersion))
    val curFiles = liveFiles(spark, table, Some(v))
    val targetDv = liveDvFiles(spark, table, Some(toVersion))
    val curDv = liveDvFiles(spark, table, Some(v))
    // the bloom-index live set travels with the content it covers (a
    // stale sidecar entry is harmless, but restored files should get
    // their index coverage back, and post-target sidecars retire)
    val targetBloom = liveBloomFiles(spark, table, Some(toVersion))
    val curBloom = liveBloomFiles(spark, table, Some(v))
    val schemaStamp = tableSchema(spark, table, Some(toVersion)).map(_.json)
      .filterNot(s => tableSchema(spark, table, Some(v)).map(_.json).contains(s))
    val adds = targetFiles.diff(curFiles)
    val removes = curFiles.diff(targetFiles) ++ curDv.diff(targetDv) ++
      curBloom.diff(targetBloom)
    val dvAdds = targetDv.diff(curDv)
    val bloomAdds = targetBloom.diff(curBloom)
    if (adds.isEmpty && removes.isEmpty && dvAdds.isEmpty && bloomAdds.isEmpty &&
        schemaStamp.isEmpty) v
    else commit(spark, table, adds = adds, removes = removes, dvAdds = dvAdds,
      bloomAdds = bloomAdds,
      baseVersion = Some(v), schemaJson = schemaStamp, notes = note.toSeq)
  }

  private val TagName = "[A-Za-z0-9][A-Za-z0-9._-]*".r
  private def tagsDir(table: String) = s"${manifestDir(table)}/tags"

  /** Pin an IMMUTABLE named tag to a version (default: current) — the
    * reproducibility handle a training pipeline needs ("run 47 trained on
    * `corpus@v2-curated`"): a tag resolves to the same immutable file set
    * forever, because versions never change, tags are create-once (a
    * second `tag` with the same name throws — rename, don't repoint), and
    * tagged versions' files stay [[vacuum]]-safe like every other
    * committed version's. One tiny object write; no table version is
    * consumed. Returns the pinned version. */
  def tag(spark: SparkSession, table: String, name: String,
          version: Option[Long] = None): Long = {
    require(TagName.matches(name), s"invalid tag name '$name'")
    val v = version.getOrElse(currentVersion(spark, table))
    val known = versions(spark, table)
    require(v == 0 || known.contains(v), s"version $v of $table does not exist")
    val f = fs(spark, table)
    if (!writeExclusive(f, new Path(s"${tagsDir(table)}/$name"), Seq(v.toString)))
      throw new IllegalArgumentException(s"tag '$name' already exists on $table (tags are immutable)")
    // RACE SEAL against a concurrent [[expireVersions]]: the floor is
    // re-read AFTER the tag file exists, so either the expiry's tag
    // re-scan sees this tag (expiry aborts) or this read sees the
    // expiry's floor (the tag self-deletes and the call throws) — a tag()
    // that RETURNS is never dangled by an expiry that completed.
    val floor = retentionHorizon(spark, table)
    if (v < floor) {
      // the compensating delete must SUCCEED for "the tag was not
      // created" to be true — a swallowed failure here would leave the
      // tag file dangling below the floor of an expiry that already
      // completed, the exact state this seal exists to prevent
      try f.delete(new Path(s"${tagsDir(table)}/$name"), false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"version $v of $table fell below the retention floor $floor " +
            s"while tagging, and RETRACTING the tag failed — tag '$name' " +
            "may still exist on disk and must be deleted manually (it " +
            "pins an expired version)", e)
      }
      throw new IllegalStateException(
        s"version $v of $table fell below the retention floor $floor while " +
          "tagging; the tag was not created")
    }
    v
  }

  /** Retract a `wap-` LIFECYCLE pin ([[graft.io.Wap]]'s clone-base tag).
    * Only the wap prefix is retractable — user tags stay immutable
    * (create-once, never repointed, never deleted): the wap pin is
    * machinery with a defined end of life (publish/abandon), a user tag
    * is a reproducibility promise. */
  private[graft] def retractTag(spark: SparkSession, table: String,
                                name: String): Unit = {
    require(name.startsWith("wap-"),
      s"only wap- lifecycle pins are retractable; '$name' is a user tag")
    fs(spark, table).delete(new Path(s"${tagsDir(table)}/$name"), false)
    ()
  }

  /** All tags on the table, name → version. */
  def tags(spark: SparkSession, table: String): Map[String, Long] = {
    val f = fs(spark, table)
    val dir = new Path(tagsDir(table))
    if (!f.exists(dir)) Map.empty
    else f.listStatus(dir).toSeq.filter(_.isFile)
      .filterNot(_.getPath.getName.contains(".tmp."))
      .map(s => s.getPath.getName -> readLines(f, s.getPath).head.trim.toLong)
      .toMap
  }

  def tagVersion(spark: SparkSession, table: String, name: String): Long =
    tags(spark, table).getOrElse(name,
      throw new IllegalArgumentException(s"no tag '$name' on $table"))

  /** Time-travel read by tag — [[readAt]] at the tag's pinned version. */
  def readTag(spark: SparkSession, table: String, name: String,
              schema: Option[StructType] = None): DataFrame =
    readAt(spark, table, Some(tagVersion(spark, table, name)), schema)

  /** A commit's wall-clock timestamp: the "ts" line its manifest records
    * ([[commit]] stamps every commit at millisecond precision), with the
    * manifest object's mtime as the fallback for manifests written before
    * ts lines existed (second-granular locally, fs-dependent generally). */
  private def commitTs(f: FileSystem, table: String, v: Long): Long = {
    val p = new Path(f"${manifestDir(table)}/v$v%010d.json")
    parsedManifest(f, p)
      .collectFirst { case ("ts", s) => s.toLong }
      .getOrElse(f.getFileStatus(p).getModificationTime)
  }

  /** The newest version committed AT OR BEFORE `tsMillis` (epoch millis) —
    * the `TIMESTAMP AS OF` resolution, from the timestamps the manifests
    * themselves record ([[commitTs]]). Two commits inside one tick resolve
    * to the later version, which is also what their serialization order
    * means.
    *
    * A timestamp OLDER than the earliest surviving commit REJECTS (the
    * Delta/Iceberg contract): the instant may fall inside a span
    * [[expireVersions]] destroyed, and answering "version 0, empty table"
    * would be silently wrong. The caller who really wants "the table
    * before its first commit" reads version 0 explicitly. */
  def versionAt(spark: SparkSession, table: String, tsMillis: Long): Long = {
    val f = fs(spark, table)
    val known = versions(spark, table)
    require(known.nonEmpty, s"$table has no commits; no timestamp resolves")
    val earliest = commitTs(f, table, known.head)
    if (tsMillis < earliest) throw new IllegalArgumentException(
      s"timestamp $tsMillis predates the earliest available version " +
        s"${known.head} of $table (committed at $earliest); history below " +
        "it does not exist or was expired")
    known.filter(v => commitTs(f, table, v) <= tsMillis).last
  }

  /** `TIMESTAMP AS OF` read: the table as it stood at `tsMillis`. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long,
               schema: Option[StructType] = None): DataFrame =
    readAt(spark, table, Some(versionAt(spark, table, tsMillis)), schema)

  /** Outcome of a [[compactSmall]]: the committed version, how many
    * small files were binpacked into how many, and the live files left
    * untouched (byte-identical, never read). */
  final case class CompactSmallResult(version: Long, packed: Int,
                                      filesAfter: Int, untouched: Int)

  /** Incremental small-file compaction — the binpack OPTIMIZE a 100 TB
    * table actually runs: coalesce only the live files smaller than
    * `smallBytes` into ~`targetBytes` outputs and swap them in ONE
    * commit; everything already well-sized is never opened. [[compact]]
    * rewrites the whole live set (right for folding tombstones or
    * re-clustering); THIS pass costs O(small-file tail) — the shape that
    * keeps streaming ingest (many per-batch files) from degrading scans,
    * run on a schedule without ever paying O(table).
    *
    * Deletion vectors are deliberately NOT folded here: dv tombstones
    * are key-based, so they keep suppressing matching rows wherever
    * those rows physically live — rewriting raw small-file bytes
    * (`coalesce`, no shuffle) cannot resurrect or lose a delete. Folding
    * stays with [[compact]]/[[optimizeZorder]], which read dv-resolved.
    * Old versions keep time-traveling to the fragmented files (still
    * referenced by their commits — vacuum-safe). Re-stamp zone maps for
    * the rewritten files via `statsCols`. */
  def compactSmall(spark: SparkSession, table: String,
                   smallBytes: Long, targetBytes: Long,
                   statsCols: Seq[String] = Nil,
                   bloomFpp: Double = 0.01): CompactSmallResult = {
    val v = currentVersion(spark, table)
    val files = liveFiles(spark, table, Some(v))
    val f = fs(spark, table)
    val sized = files.map(p => p -> f.getFileStatus(new Path(p)).getLen)
    val small = sized.filter(_._2 < smallBytes)
    if (small.size <= 1)
      return CompactSmallResult(v, 0, 0, files.size)
    val outFiles = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val dir = s"$table/data/binpack-${java.util.UUID.randomUUID().toString}"
    // raw read (NOT dv-resolved — see doc) under the recorded schema, so
    // shape-divergent pre-evolution files binpack to the evolved shape
    val sc = tableSchema(spark, table, Some(v))
    writeData(schemaRead(spark, table, Some(v), small.map(_._1))
      .coalesce(outFiles), dir)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    // untouched files keep their sidecar coverage (old sidecars stay
    // live; entries for the retired small files are stale and ignored);
    // the binpacked files get fresh coverage in the same commit, so
    // point lookups never fall back to conservative reads
    val bloomParts = bloomIndexedColumns(spark, table, v).flatMap(c =>
      bloomSidecarFor(spark, table, parts, c, bloomFpp, sc))
    // the binpacked files INHERIT the retired files' stat coverage (zone
    // maps re-stamped for the new layout, row counts iff the smalls
    // carried them) — compaction must never be the operation that turns
    // pruning or metadata COUNT(*) off; explicit statsCols add on top
    val retiredStats = fileStats(spark, table, Some(v))
      .filter(st => small.exists(_._1 == st.path))
    val statCols = (retiredStats.map(_.column)
      .filterNot(reservedStat) ++ statsCols).distinct
    val keepRowCounts = retiredStats.exists(_.column == RowsStat)
    val nv = commit(spark, table, adds = parts, removes = small.map(_._1),
      baseVersion = Some(v),
      stats = computeStats(spark, dir, parts, statCols,
        withRowCounts = keepRowCounts),
      bloomAdds = bloomParts, addLens = lensOf(partsSt))
    CompactSmallResult(nv, small.size, parts.size, files.size - small.size)
  }

  /** Outcome of a [[buildBloomIndex]]: the committed version, how many
    * live files were newly indexed, how many were already covered, and
    * the sidecar dir written (None when nothing needed indexing). */
  final case class BloomIndexResult(version: Long, indexed: Int,
                                    alreadyIndexed: Int, sidecar: Option[String])

  /** Build a per-file BLOOM INDEX on `column` — the file-skipping layer
    * for POINT LOOKUPS on a column the layout is NOT clustered by (zone
    * maps prune by min/max range, which is useless when every file spans
    * the full value range — the "find these 50 doc ids in 100 TB" shape).
    * One sidecar parquet row per data file: (data_file, column, bloom
    * bytes), the bloom being Spark's own `util.sketch.BloomFilter` sized
    * to the file's exact non-null count at `fpp`.
    *
    * Build cost: two column-pruned passes over the UNINDEXED live files
    * only (count per file, then one hash-partition-by-file pass building
    * every bloom in parallel) — incremental by default, so the scheduled
    * maintenance run pays O(new files since last build). `rebuild = true`
    * re-indexes everything and retires this column's old sidecars in the
    * same commit. The index is VERSIONED table state: the sidecar commit
    * participates in time travel, checkpoints carry live sidecars across
    * [[expireVersions]], rebuild-retired sidecars become [[vacuum]] food,
    * and optimistic concurrency applies as everywhere.
    *
    * Files with only null keys produce no bloom row (a bloom cannot
    * witness null) and stay conservatively unprunable, like a missing
    * zone map. ~1.2 bytes/key at fpp 1%: ≈1% storage overhead — the
    * standard bloom-index economics. */
  def buildBloomIndex(spark: SparkSession, table: String, column: String,
                      fpp: Double = 0.01,
                      rebuild: Boolean = false): BloomIndexResult = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit}
    import spark.implicits._
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val sidecars = liveBloomFiles(spark, table, Some(v))
    // which sidecar files serve THIS column, and which data files they
    // cover (both metadata-sized: one row per data file)
    val (oldForCol, covered) =
      if (sidecars.isEmpty) (Nil, Set.empty[String])
      else {
        val byName = sidecars.map(p => new Path(p).getName -> p).toMap
        val rows = spark.read.parquet(sidecars: _*)
          .filter(col("column") === lit(column))
          .select(input_file_name().as("sc"), col("data_file"))
          .distinct().collect()
        (rows.flatMap(r => byName.get(new Path(r.getString(0)).getName)).distinct.toSeq,
          rows.map(_.getString(1)).toSet)
      }
    val todo = if (rebuild) live else live.filterNot(covered)
    if (todo.isEmpty)
      return BloomIndexResult(v, 0, covered.intersect(live.toSet).size, None)
    val sc = tableSchema(spark, table, Some(v))
    val parts = bloomSidecarFor(spark, table, todo, column, fpp, sc)
    val dir = parts.headOption.map(p => new Path(p).getParent.toString)
    val indexed =
      if (parts.isEmpty) 0 else spark.read.parquet(parts: _*).count().toInt
    if (parts.isEmpty && (!rebuild || oldForCol.isEmpty)) // all-null keys
      return BloomIndexResult(v, 0, covered.intersect(live.toSet).size, None)
    // losing the version race to a concurrent ingest/compaction is fine:
    // the sidecar is on disk and file-keyed (entries for files the racer
    // rewrote are stale and readPoint ignores them via the live set), so
    // the retry just re-resolves the version — the MergeGate discipline
    var attempts = 0
    var nv = 0L
    var committed = false
    while (!committed)
      try {
        nv = commit(spark, table, adds = Nil,
          removes = if (rebuild) oldForCol else Nil,
          bloomAdds = parts,
          notes = Seq(s"bloom-index-$column"))
        committed = true
      } catch {
        case _: ConcurrentCommitException if attempts < 20 => attempts += 1
      }
    BloomIndexResult(nv, indexed,
      if (rebuild) 0 else covered.intersect(live.toSet).size, dir)
  }

  /** Build per-file bloom sidecar rows for `files` on `column` and write
    * them under `<table>/_index` — the shared core of [[buildBloomIndex]]
    * and the index refresh inside [[optimizeZorder]]/[[compact]]/
    * [[compactSmall]]. Two column-pruned passes over `files` only (exact
    * non-null count per file, then one hash-partition-by-file pass
    * building every bloom in parallel). Returns the sidecar part paths
    * to ride the caller's commit as `bloomAdds` — Nil when no file had a
    * non-null key (a bloom cannot witness null). */
  private def bloomSidecarFor(spark: SparkSession, table: String,
                              files: Seq[String], column: String, fpp: Double,
                              sc: Option[StructType]): Seq[String] = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit}
    import spark.implicits._
    if (files.isEmpty) return Nil
    val keyed = schemaReadWith(spark, sc, columnMapping(spark, table), files)
      .select(input_file_name().as("f"), col(column).cast("string").as("k"))
      .filter(col("k").isNotNull)
    val sizes = keyed.groupBy("f").agg(count(lit(1)).as("n")).as[(String, Long)]
      .collect().toMap
    if (sizes.isEmpty) return Nil
    val bcSizes = spark.sparkContext.broadcast(sizes)
    val blooms = keyed.repartition(col("f")).mapPartitions { it =>
      val bfs = scala.collection.mutable.HashMap
        .empty[String, org.apache.spark.util.sketch.BloomFilter]
      it.foreach { row =>
        val f = row.getString(0)
        bfs.getOrElseUpdate(f, org.apache.spark.util.sketch.BloomFilter
          .create(math.max(bcSizes.value.getOrElse(f, 1L), 1L), fpp))
          .putString(row.getString(1))
      }
      bfs.iterator.map { case (f, bf) =>
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (f, bos.toByteArray)
      }
    }
    // scan URIs → the listed live paths, by unique part name (computeStats
    // discipline — Spark part names embed the write job's UUID); then the
    // sidecar lands like any data write: files FIRST, one commit after
    val bcNames = spark.sparkContext.broadcast(
      files.map(p => new Path(p).getName -> p).toMap)
    val dir = s"$table/_index/bloom-${java.util.UUID.randomUUID().toString}"
    writeData(blooms.map { case (f, b) =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      (bcNames.value.getOrElse(name, name), column, b)
    }.toDF("data_file", "column", "bloom")
      .coalesce(1), dir)
    val f = fs(spark, table)
    listParts(f, dir).map(_.getPath.toString)
  }

  /** The columns the live bloom index serves at `version` — one
    * metadata-sized sidecar scan. */
  private def bloomIndexedColumns(spark: SparkSession, table: String,
                                  version: Long): Seq[String] = {
    val sidecars = liveBloomFiles(spark, table, Some(version))
    if (sidecars.isEmpty) Nil
    else spark.read.parquet(sidecars: _*).select("column")
      .distinct().collect().map(_.getString(0)).toSeq
  }

  /** Partition the live files of `version` by the bloom index's verdict
    * for `values` on `column` — (candidates to read, files skipped). The
    * [[pruneFiles]] shape for point predicates: files without a bloom
    * row are conservatively candidates; the probe is ONE distributed
    * sidecar scan and the driver holds only paths. */
  def bloomPrune(spark: SparkSession, table: String, column: String,
                 values: Seq[String],
                 version: Option[Long] = None): (Seq[String], Seq[String]) = {
    import org.apache.spark.sql.functions.{col, lit, max, when}
    val v = version.getOrElse(currentVersion(spark, table))
    val live = liveFiles(spark, table, Some(v))
    val probes = values.filter(_ != null)
    val sidecars = liveBloomFiles(spark, table, Some(v))
    if (live.isEmpty) (Nil, Nil)
    else if (probes.isEmpty) (Nil, live)
    else if (sidecars.isEmpty) (live, Nil)
    else {
      val verdicts = spark.read.parquet(sidecars: _*)
        .filter(col("column") === lit(column))
        .groupBy("data_file")
        .agg(max(when(graft.functions.SketchExprs.bloomAnyContain(
          col("bloom"), probes), 1L).otherwise(0L)).as("hit"))
        .collect().map(r => r.getString(0) -> (r.getLong(1) == 1L)).toMap
      live.partition(p => verdicts.getOrElse(p, true))
    }
  }

  /** POINT LOOKUP through the bloom index: the rows of `column ∈ values`
    * (string image), reading only the files whose bloom says MIGHT — at
    * 100 TB a k-key lookup on an unclustered column reads O(matching
    * files + false positives) instead of the whole table. Files without
    * a bloom row are conservatively read (never wrong, just unpruned);
    * the probe itself is distributed (one sidecar scan; the driver
    * collects candidate PATHS, metadata-sized). Merge-on-read deletes
    * resolve as in every read. Null probes never match (SQL equality). */
  def readPoint(spark: SparkSession, table: String, column: String,
                values: Seq[String], version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = version.getOrElse(currentVersion(spark, table))
    val live = liveFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    val probes = values.filter(_ != null)
    val candidates =
      if (probes.isEmpty) Nil
      else bloomPrune(spark, table, column, probes, Some(v))._1
    val base =
      if (candidates.isEmpty) {
        val s = sc.getOrElse(throw new IllegalArgumentException(
          s"readPoint on empty/fully-pruned $table needs a recorded schema"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      } else {
        applyDv(spark, table, Some(v), schemaRead(spark, table, Some(v), candidates))
      }
    base.filter(col(column).cast("string").isin(probes: _*))
  }

  /** AGE-BASED retention: expire history so that time travel still works
    * for every instant at or after `tsMillis` — the "keep N days" knob.
    * The horizon is [[versionAt]]`(tsMillis)` (the newest version visible
    * at that instant must survive so `AS OF tsMillis` keeps resolving);
    * everything older expires per [[expireVersions]], with the same tag
    * and safety refusals. No-op (current version kept, nothing expired)
    * when the table has no pre-`tsMillis` history. */
  def expireOlderThan(spark: SparkSession, table: String,
                      tsMillis: Long): ExpireResult = {
    // resolved directly (not via [[versionAt]], which rejects
    // below-earliest timestamps): a retention instant older than all
    // history means there is nothing to expire — a no-op, not an error
    val f = fs(spark, table)
    val horizon = versions(spark, table)
      .filter(v => commitTs(f, table, v) <= tsMillis).lastOption
    horizon match {
      case None    => ExpireResult(Nil, 0L)
      case Some(h) => expireVersions(spark, table, keepFrom = h)
    }
  }

  /** One row of [[detail]] — DESCRIBE DETAIL: the operational metadata a
    * maintenance scheduler reads (all O(metadata); the only data-file
    * bytes touched are the dv key files, which are point-delete-sized by
    * contract). `smallFiles` counts live files under `smallBytes` — the
    * [[compactSmall]] backlog. */
  final case class TableDetail(version: Long, files: Int, bytes: Long,
                               smallFiles: Int, dvFiles: Int, dvKeys: Long,
                               bloomSidecars: Int, versionsRetained: Int,
                               checkpoints: Int, tags: Map[String, Long],
                               schemaRecorded: Boolean,
                               clusterSpec: Option[String],
                               unclusteredFiles: Int)

  def detail(spark: SparkSession, table: String,
             smallBytes: Long = 32L * 1024 * 1024): TableDetail = {
    val f = fs(spark, table)
    val v = currentVersion(spark, table)
    val live = liveFiles(spark, table, Some(v))
    val stats = fileStats(spark, table, Some(v))
    // sizes from the recorded __bytes stats (zero per-file RPCs on the
    // common path); filesystem fallback only for legacy commits
    val recorded = stats.filter(_.column == BytesStat)
      .map(st => st.path -> st.min.toLong).toMap
    val sizes = live.map(p => recorded.getOrElse(p,
      f.getFileStatus(new Path(p)).getLen))
    val dvs = liveDvFiles(spark, table, Some(v))
    val dvKeys = if (dvs.isEmpty) 0L else spark.read.parquet(dvs: _*).count()
    // the LAYOUT SPLIT a cluster-spec evolution leaves behind: files
    // missing a zone map on any CURRENT cluster source column were
    // written under an older spec (or none) — they still prune on their
    // own recorded stats, but not on the new spec's; OPTIMIZE heals the
    // split and drives this back to 0
    val spec = tableProperties(spark, table, Some(v)).get(Clustering.Prop)
    val unclustered = spec match {
      case None => 0
      case Some(sp) =>
        val srcCols = Clustering.parse(sp).map(_._2).distinct.toSet
        val covered = stats.filter(st => srcCols(st.column))
          .groupBy(_.path).collect {
            case (p, sts) if srcCols.subsetOf(sts.map(_.column).toSet) => p
          }.toSet
        live.count(!covered(_))
    }
    TableDetail(
      version = v,
      files = live.size,
      bytes = sizes.sum,
      smallFiles = sizes.count(_ < smallBytes),
      dvFiles = dvs.size,
      dvKeys = dvKeys,
      bloomSidecars = liveBloomFiles(spark, table, Some(v)).size,
      versionsRetained = versions(spark, table).size,
      checkpoints = checkpointVersions(spark, table).size,
      tags = tags(spark, table),
      schemaRecorded = tableSchema(spark, table, Some(v)).isDefined,
      clusterSpec = spec,
      unclusteredFiles = unclustered)
  }

  /** Outcome of an [[optimizeZorder]]: the committed version and the
    * live-file counts either side of the rewrite. */
  final case class OptimizeResult(version: Long, filesBefore: Int, filesAfter: Int)

  /** OPTIMIZE: transactional Z-order layout rewrite of the current
    * version — the lakehouse maintenance pass (the `OPTIMIZE … ZORDER BY`
    * shape): read the live set once, range-partition on the Morton
    * z-value of the two clustering dimensions ([[Layout.zValue]] — static
    * shift/mask arithmetic, codegen'd), z-sort within files, write the
    * new layout under a fresh data dir, and swap it in as ONE commit
    * (adds = new files, removes = old) with re-stamped per-file zone-map
    * stats on BOTH dimensions — after the rewrite every file covers a
    * bounded rectangle of the (a, b) plane, so manifest-level pruning
    * ([[pruneFiles]]/[[readPruned]]) skips files on EITHER key. Row
    * content is untouched; pre-optimize versions keep time-traveling to
    * the old files (they stay referenced by their manifests — [[vacuum]]
    * only ever reclaims unreferenced garbage). Data is on disk before the
    * commit exists; a crash mid-write leaves the table on the old layout
    * with orphan files for vacuum — the same write-then-commit discipline
    * as every other mutator here. */
  def optimizeZorder(spark: SparkSession, table: String,
                     colA: String, colB: String,
                     targetFiles: Int, bits: Int = 16): OptimizeResult =
    optimizeZorder(spark, table, Seq(colA, colB), targetFiles, bits)

  def optimizeZorder(spark: SparkSession, table: String, cols: Seq[String],
                     targetFiles: Int, bits: Int): OptimizeResult =
    optimizeZorder(spark, table, cols, targetFiles, bits, bloomFpp = 0.01)

  /** K-dimension OPTIMIZE (2-4 clustering columns is the useful regime —
    * [[Layout.zValueK]]): identical transaction discipline to the 2-column
    * form; zone maps are re-stamped on ALL k dimensions, so manifest
    * pruning skips files on any of them.
    *
    * STRING dimensions cluster via a DICTIONARY RANK: the column's sorted
    * distinct values map to `[0, 2^bits)` by position (order-preserving
    * exactly, so the re-stamped lexicographic zone maps prune as tightly
    * as a numeric dim's). A byte-prefix image would collapse under shared
    * prefixes (every "src…" tenant lands on one z-value); the rank is
    * immune. The rank builds DISTRIBUTED (two-phase bucketed prefix sums:
    * deterministic sampled boundaries, ≤256 bucket counts folded to
    * offsets, within-bucket row_number — only boundaries and counts touch
    * the driver) and joins back as a broadcast; cardinality is bounded
    * (≤ 2^20, the broadcast bound) because a clustering key IS a low/mid-
    * cardinality attribute (tenant, source, domain) — a near-unique
    * string should cluster through its own numeric key instead. NUMERIC
    * dimensions rank through equi-depth quantile buckets, so a skewed
    * domain (lognormal ids) spreads over the full z-range instead of
    * collapsing into the cells a min-max scale would give it. Null
    * values rank lowest on every dim. */
  def optimizeZorder(spark: SparkSession, table: String, cols: Seq[String],
                     targetFiles: Int, bits: Int,
                     bloomFpp: Double): OptimizeResult = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, floor, lit}
    val v = currentVersion(spark, table)
    val files = liveFiles(spark, table, Some(v))
    if (files.isEmpty) return OptimizeResult(v, 0, 0)
    val dvs = liveDvFiles(spark, table, Some(v)) // fold: rewrite is dv-resolved
    val dir = s"$table/data/zopt-${java.util.UUID.randomUUID().toString}"
    val base = readAt(spark, table, Some(v))
    val stringDims = cols.filter(c =>
      base.schema(c).dataType == org.apache.spark.sql.types.StringType)
    // NUMERIC dims map through an EQUI-DEPTH bucket index (approxQuantile
    // boundaries → [[graft.functions.ArrayExprs.lowerBoundCount]]) before
    // interleaving: [[Layout.zValueK]] masks each dimension to its low
    // `bits` bits, so an unnormalized id domain >= 2^bits would cluster
    // by value MOD 2^bits; and the previous min-max scale collapsed a
    // SKEWED domain (lognormal ids) into a handful of z-cells — the
    // quantile rank is immune to both, like the string dims' rank. The
    // mapping is monotone (all z-ordering needs: the re-stamped zone maps
    // record REAL values, so pruning stays exact); sketch jitter only
    // nudges bucket boundaries, never their order. ONE multi-column
    // quantile pass over all numeric dims; nulls rank lowest.
    val numericDims = cols.filterNot(stringDims.contains)
    val nb = math.min(1 << bits, 4096)
    val numBounds: Map[String, Array[Double]] =
      if (numericDims.isEmpty) Map.empty
      else {
        val probs = (1 until nb).map(_.toDouble / nb).toArray
        val asDouble = base.select(numericDims.map(c =>
          col(c).cast("double").as(c)): _*)
        numericDims.zip(asDouble.stat.approxQuantile(
            numericDims.toArray, probs, 1.0 / (4 * nb)))
          .map { case (c, bs) => c -> bs.distinct.sorted }.toMap
      }
    def bucketedNumeric(c: String): org.apache.spark.sql.Column = {
      val bs = numBounds(c)
      if (bs.isEmpty) lit(0L) // constant / all-null dim: one z-value
      else {
        // spread the bucket index over the FULL [0, 2^bits) range (same
        // scale the string rank applies): a low-cardinality dim would
        // otherwise occupy only the low interleave bits and the z-order
        // would degenerate to a sort on the wider dim
        val nBkts = bs.length + 1
        coalesce(floor(
          graft.functions.ArrayExprs.lowerBoundCount(
            col(c).cast("double"),
            org.apache.spark.sql.functions.typedLit(bs.toSeq)).cast("long") *
            lit(1L << bits) / lit(nBkts)).cast("long"),
          lit(0L)) // null dim values rank lowest, like null strings
      }
    }
    // STRING dims rank DISTRIBUTED (the former sorted-distinct collect
    // materialized up to 2^20 values on the driver): deterministic sampled
    // bucket boundaries (bounded driver footprint), per-bucket counts fold
    // to exclusive offsets (≤ #buckets rows — the [[graft.ops.PrefixSum]]
    // two-phase shape), and the global rank is offset + within-bucket
    // row_number. Only boundaries and bucket counts ever reach the driver.
    val ranked = stringDims.foldLeft(base) { (df, c) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{element_at, filter, row_number, size, typedLit}
      // cardinality bound enforced from one distributed sketch: the rank
      // table must stay broadcastable for the join back (a near-unique
      // string should cluster through its own numeric key instead)
      val approx = df.agg(org.apache.spark.sql.functions
        .approx_count_distinct(col(c), 0.02)).first().getLong(0)
      require(approx <= (1L << 20) * 11 / 10,
        s"z-order string dim '$c' has ~$approx distinct values — " +
          "cluster a near-unique string through a numeric key instead")
      val d = df.select(col(c)).filter(col(c).isNotNull).distinct()
      val sample = d.sample(withReplacement = false,
          math.min(1.0, 8192.0 / math.max(approx, 1L).toDouble), seed = 42L)
        .orderBy(col(c)).collect().map(_.getString(0))
      val nBkts = 256
      val bs: Array[String] =
        if (sample.isEmpty) Array.empty
        else (1 until nBkts)
          .map(i => sample((i.toLong * sample.length / nBkts).toInt))
          .distinct.sorted.toArray
      val bkt =
        if (bs.isEmpty) lit(0)
        else size(filter(typedLit(bs.toSeq), b => b < col(c)))
      val withB = d.withColumn("__bkt", bkt)
      // per-bucket totals → exclusive offsets on ≤ nBkts rows; `d` is
      // deterministic (distinct over immutable files, literal boundaries),
      // so the counts stay valid for the rank job below
      val counts = withB.groupBy("__bkt")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("__tot"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offs = new Array[Long](bs.length + 1)
      var acc = 0L
      for (b <- 0 to bs.length) { offs(b) = acc; acc += counts.getOrElse(b, 0L) }
      val n = math.max(acc, 1L)
      require(n <= (1L << 20),
        s"z-order string dim '$c' has $acc distinct values — " +
          "cluster a near-unique string through a numeric key instead")
      val rank = element_at(typedLit(offs.toSeq), col("__bkt") + 1) +
        row_number().over(Window.partitionBy("__bkt").orderBy(col(c))) - 1
      val rdf = withB
        .withColumn(s"__zr_$c",
          floor(rank * lit(1L << bits) / lit(n)).cast("long"))
        .select(col(c), col(s"__zr_$c"))
      df.join(broadcast(rdf), Seq(c), "left")
    }
    val zdims = cols.map(c =>
      if (stringDims.contains(c)) coalesce(col(s"__zr_$c"), lit(0L))
      else bucketedNumeric(c))
    writeData(ranked
      .withColumn("__z", Layout.zValueK(zdims, bits))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z" +: stringDims.map(c => s"__zr_$c"): _*), dir)
    val f = fs(spark, table)
    val partsSt = listParts(f, dir)
    val parts = partsSt.map(_.getPath.toString)
    // the layout rewrite retires every data file, so the bloom index
    // refreshes in the SAME commit (see [[compact]]) — OPTIMIZE leaves
    // point lookups pruning, not waiting for the next index build
    val idxCols = bloomIndexedColumns(spark, table, v)
    val oldSidecars = liveBloomFiles(spark, table, Some(v))
    val sc = tableSchema(spark, table, Some(v))
    val bloomParts = idxCols.flatMap(c =>
      bloomSidecarFor(spark, table, parts, c, bloomFpp, sc))
    // compaction must never turn pruning off: the rewritten files inherit
    // every stat column the retired files carried (same rule as
    // [[compactSmall]]/[[rewriteWhere]]), not just the z-order dims — one
    // OPTIMIZE on a table whose inserts recorded __rows/zone maps would
    // otherwise silently demote metadata COUNT(*) to a full scan and drop
    // pruning on every non-clustered stat'd column
    val retired = files.toSet
    val retiredStats = fileStats(spark, table, Some(v))
      .filter(st => retired(st.path))
    val statCols = (cols ++ retiredStats.map(_.column).filterNot(reservedStat)).distinct
    val keepRowCounts = retiredStats.exists(_.column == RowsStat)
    val nv = commit(spark, table, adds = parts,
      removes = files ++ dvs ++ oldSidecars, baseVersion = Some(v),
      stats = computeStats(spark, dir, parts, statCols,
        withRowCounts = keepRowCounts),
      bloomAdds = bloomParts, addLens = lensOf(partsSt))
    OptimizeResult(nv, files.size, parts.size)
  }

  /** Delete data files under `<table>/data` that NO committed version
    * references (garbage from writers that crashed before their commit).
    * Never touches referenced files — time travel to any version keeps
    * working. Returns the deleted paths. */
  def vacuum(spark: SparkSession, table: String): Seq[String] = {
    val f = fs(spark, table)
    val referenced = referencedFiles(spark, table)
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    // data files and index sidecars reclaim under the same rule: no
    // existing manifest adds them (crashed writers, retired/rebuilt
    // indexes, history freed by expireVersions)
    Seq(new Path(s"$table/data"), new Path(s"$table/_index"))
      .filter(f.exists).foreach { dir =>
        val it = f.listFiles(dir, true)
        while (it.hasNext) {
          val s = it.next()
          val p = s.getPath.toString
          val name = s.getPath.getName
          // in-flight Spark temp output is the writer's business, not garbage
          if (s.isFile && !p.contains("_temporary") && !name.startsWith(".") &&
              !name.startsWith("_") && !referenced.contains(p))
            orphans += p
        }
      }
    orphans.foreach(p => f.delete(new Path(p), false))
    orphans.toSeq
  }
}
