package graft.io

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** WRITE-AUDIT-PUBLISH: zero-copy clones with an atomic publish — the
  * staging discipline a production data pipeline runs risky transforms
  * under (Iceberg's WAP / Nessie-branch pattern, built entirely on this
  * repo's existing manifest machinery):
  *
  * {{{
  *   Wap.clone(spark, corpus, staging)        // O(metadata): no data copied
  *   ... mutate staging freely (SQL DML, merges, OPTIMIZE, appends) ...
  *   ... audit staging (row counts, quality gates, eval queries) ...
  *   Wap.publish(spark, staging)              // ONE atomic commit in corpus
  * }}}
  *
  *  - CLONE commits the source's live file set (data + deletion vectors +
  *    bloom sidecars), recorded schema, table properties and zone-map
  *    stats into a fresh table as version 1 — a full independent table in
  *    O(metadata), readable and writable through every existing surface
  *    (catalog SQL, DML, procedures). A retractable `wap-` lifecycle tag
  *    pins the base version in the SOURCE, so source expiry cannot strand
  *    the shared files while the clone lives ([[Snapshots.expireVersions]]
  *    refuses to cross a tag; ordinary user tags stay immutable —
  *    [[Snapshots.retractTag]] accepts only the `wap-` prefix).
  *  - AUDIT is just reading the clone: every query surface works, and the
  *    source serves production reads untouched the whole time.
  *  - PUBLISH swaps the clone's live state into the source as ONE
  *    optimistic commit against the clone's base version (the source
  *    must not have advanced — re-clone to rebase; refusing beats silent
  *    merge semantics). Files the clone created are REHOMED into the
  *    source's data directory first (hard link on local filesystems,
  *    copy elsewhere), so the published source never references paths
  *    under a staging directory an operator might delete; their zone-map
  *    stats travel with the rename. Pre-publish source versions keep
  *    time-traveling; the lifecycle pin retracts once the publish commit
  *    holds the shared files live.
  *
  * Vacuum safety is structural: [[Snapshots.vacuum]] deletes only files
  * under its own table's `data/` that no version references — the clone
  * referencing source paths never exposes them to the CLONE's vacuum,
  * and the source's vacuum keeps them while any source version (base is
  * pinned) references them.
  *
  * Reference analog: none (north-star extension) — the audit gate the
  * reference's single-writer pipeline never needed, and the heart of how
  * a 100 TB training corpus takes risky curation changes safely.
  */
object Wap {

  final case class PublishResult(version: Long, added: Int, removed: Int,
                                 rehomed: Int)

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c else '-')
      .dropWhile(!_.isLetterOrDigit).take(64) match {
      case "" => "x"
      case t  => t
    }

  /** Legacy pin name (pre-`wap.pin` clones recorded nothing, so their
    * publish/abandon recomputes this shape). New clones uniquify with a
    * full-path hash — two same-leaf clones of one base (`/a/stage` and
    * `/b/stage`) must not collide on the source tag. */
  private def pinName(dst: String, base: Long): String =
    s"wap-${sanitize(new Path(dst).getName)}-v$base"

  private def uniquePinName(dst: String, base: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(new Path(dst).toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    s"${pinName(dst, base)}-$h"
  }

  /** The clone's recorded pin (`wap.pin` prop), falling back to the
    * legacy deterministic name for clones made before the prop existed. */
  private def pinOf(props: Map[String, String], dst: String): String =
    props.getOrElse("wap.pin", pinName(dst, props("wap.base").toLong))

  /** Zero-copy clone of `src`@`version` (default current) into the new
    * table `dst`. Returns the clone's version (always 1). */
  def clone(spark: SparkSession, src: String, dst: String,
            version: Option[Long] = None): Long = {
    val f = fsOf(spark, dst)
    require(!f.exists(new Path(s"$dst/_manifest")), s"$dst already exists")
    val v = version.getOrElse(Snapshots.currentVersion(spark, src))
    require(v > 0 && Snapshots.versions(spark, src).contains(v),
      s"version $v of $src does not exist")
    // pin FIRST: once the tag holds, expiry cannot cross the base, so
    // every file the clone is about to reference stays resolvable
    val pin = uniquePinName(dst, v)
    Snapshots.tag(spark, src, pin, Some(v))
    try {
      // carried zone maps keep pruning live on the clone from its first
      // read; __bytes is re-recorded by commit() itself for the add set
      val carried = Snapshots.fileStats(spark, src, Some(v))
        .filterNot(_.column == Snapshots.BytesStat)
      Snapshots.commit(spark, dst,
        adds = Snapshots.liveFiles(spark, src, Some(v)),
        dvAdds = Snapshots.liveDvFiles(spark, src, Some(v)),
        bloomAdds = Snapshots.liveBloomFiles(spark, src, Some(v)),
        schemaJson = Snapshots.tableSchema(spark, src, Some(v)).map(_.json),
        stats = carried,
        notes = Seq(s"wap-clone:$src@$v"),
        props = Snapshots.tableProperties(spark, src, Some(v)).toSeq
          .map { case (k, pv) => k -> Some(pv) } ++
          Seq("wap.source" -> Some(src), "wap.base" -> Some(v.toString),
            "wap.pin" -> Some(pin)))
    } catch {
      case t: Throwable =>
        // a failed clone must not leak its lifecycle pin (it would block
        // source expiry until manually retracted)
        try Snapshots.retractTag(spark, src, pin)
        catch { case r: Throwable => t.addSuppressed(r) }
        throw t
    }
  }

  /** Hard-link (local) or copy (object stores) `from` under `toDir`,
    * returning the new path. Part/dv/bloom file names embed write-job
    * UUIDs, so basenames cannot collide in the shared rehome dir. */
  private def linkOrCopy(f: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                         from: String, toDir: Path): String = {
    val srcP = new Path(from)
    val to = new Path(toDir, srcP.getName)
    if (Option(to.toUri.getScheme).forall(_ == "file")) {
      val toNio = java.nio.file.Paths.get(to.toUri.getPath)
      java.nio.file.Files.createDirectories(toNio.getParent)
      java.nio.file.Files.createLink(toNio, java.nio.file.Paths.get(srcP.toUri.getPath))
    } else FileUtil.copy(f, srcP, f, to, false, conf)
    to.toString
  }

  /** Publish the clone's live state into its source as ONE atomic swap
    * commit — a THREE-WAY MERGE at file granularity against the clone's
    * base (the git model: base = the cloned version, ours = the source's
    * current head, theirs = the clone):
    *
    *  - files only ONE side touched merge cleanly: source appends stay
    *    live (the ingest-keeps-appending-while-curation-stages pattern
    *    publishes without a re-clone), source-side removals stand, the
    *    clone's own adds land (rehomed) and its removals retire;
    *  - files BOTH sides removed/rewrote CONFLICT and refuse loudly
    *    with the file list (row-level intent is unknowable at publish
    *    time; re-clone from the current head and re-apply) — the same
    *    file-level conflict rule Iceberg/Delta commit validation uses;
    *  - deletion-vector streams merge one-sided only (both sides adding
    *    tombstones have unknowable key overlap → conflict);
    *  - a schema evolved on ONE side carries through; evolved on both
    *    to different shapes → conflict.
    *
    * Caveat (same as every file-granularity MVCC): two sides touching
    * DISJOINT files can still conflict semantically (e.g. both insert
    * the same key into different files) — key-level invariants are the
    * caller's, exactly as in Iceberg snapshot isolation. */
  def publish(spark: SparkSession, dst: String): PublishResult = {
    // a writer landing between resolve and commit is the NORMAL race for
    // this operation (publish exists to end a staging window on a live
    // table) — retry the WHOLE derivation: each attempt re-resolves the
    // head and re-validates the add-only condition, so a retried publish
    // is exactly as safe as a first-try one; lost attempts' rehome dirs
    // are vacuum food like every lost optimistic writer's
    var attempts = 0
    while (true) {
      try return publishOnce(spark, dst)
      catch {
        case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
          attempts += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def publishOnce(spark: SparkSession, dst: String): PublishResult = {
    val props = Snapshots.tableProperties(spark, dst)
    val src = props.getOrElse("wap.source", throw new IllegalArgumentException(
      s"$dst is not a WAP clone (no wap.source property); Wap.clone creates one"))
    val base = props("wap.base").toLong
    val cur = Snapshots.currentVersion(spark, src)
    val srcLive = Snapshots.liveFiles(spark, src, Some(base)).toSet
    val srcDv = Snapshots.liveDvFiles(spark, src, Some(base)).toSet
    val srcBloom = Snapshots.liveBloomFiles(spark, src, Some(base)).toSet
    val nowLive = if (cur == base) srcLive
      else Snapshots.liveFiles(spark, src, Some(cur)).toSet
    val nowDv = if (cur == base) srcDv
      else Snapshots.liveDvFiles(spark, src, Some(cur)).toSet
    val nowBloom = if (cur == base) srcBloom
      else Snapshots.liveBloomFiles(spark, src, Some(cur)).toSet
    val dstV = Snapshots.currentVersion(spark, dst)
    val dstLive = Snapshots.liveFiles(spark, dst, Some(dstV))
    val dstDv = Snapshots.liveDvFiles(spark, dst, Some(dstV))
    val dstBloom = Snapshots.liveBloomFiles(spark, dst, Some(dstV))
    // three-way conflict detection at file granularity: a base file both
    // sides removed was REWRITTEN twice with unknowable row intent
    val dataConflicts = (srcLive -- nowLive) intersect (srcLive -- dstLive.toSet)
    val bloomConflicts = (srcBloom -- nowBloom) intersect (srcBloom -- dstBloom.toSet)
    val srcDvChanged = nowDv != srcDv
    val branchDvChanged = dstDv.toSet != srcDv
    // dv tombstones are KEY-based (applyDv joins by key), so a dv change
    // on one side conflicts not only with the other side's dv changes but
    // with the other side's base-file rewrites too: a source dv-delete of
    // key k merged over a clone CoW-rewrite that UPDATED k would keep the
    // tombstone live and silently suppress the rewritten row (and
    // symmetrically, a clone tombstone over a source rewrite)
    val srcBaseChanged = (srcLive -- nowLive).nonEmpty
    val dstBaseChanged = (srcLive -- dstLive.toSet).nonEmpty
    val dvCross = (srcDvChanged && dstBaseChanged) ||
      (branchDvChanged && srcBaseChanged)
    if (dataConflicts.nonEmpty || bloomConflicts.nonEmpty ||
        (srcDvChanged && branchDvChanged) || dvCross) {
      val what =
        if (dataConflicts.nonEmpty)
          s"both rewrote base data files: ${dataConflicts.take(4).mkString(", ")}" +
            (if (dataConflicts.size > 4) s" (+${dataConflicts.size - 4} more)" else "")
        else if (bloomConflicts.nonEmpty)
          s"both rewrote bloom sidecars: ${bloomConflicts.take(4).mkString(", ")}"
        else if (srcDvChanged && branchDvChanged)
          "both sides added deletion vectors (tombstone key overlap unknowable)"
        else if (srcDvChanged && dstBaseChanged)
          "the source added deletion vectors while the clone rewrote base " +
            "files (a source tombstone could suppress a clone-rewritten row)"
        else
          "the clone added deletion vectors while the source rewrote base " +
            "files (a clone tombstone could suppress a source-rewritten row)"
      throw new IllegalStateException(
        s"publish conflict: $src advanced to v$cur past the clone's base " +
          s"v$base and $what; re-clone from the current version and " +
          "re-apply the staged changes (changes to DISJOINT files merge " +
          "cleanly — this refusal is a real double-rewrite)")
    }
    // rehome clone-created files into the source's own data dir so the
    // source never references a staging path
    val f = fsOf(spark, src)
    val conf = spark.sparkContext.hadoopConfiguration
    val rehomeDir = new Path(s"$src/data/wap-${java.util.UUID.randomUUID()}")
    var rehomed = Map.empty[String, String]
    def place(p: String, already: Set[String]): String =
      if (already(p)) p
      else { val np = linkOrCopy(f, conf, p, rehomeDir); rehomed += p -> np; np }
    val adds = dstLive.filterNot(srcLive).map(place(_, srcLive))
    val dvAdds = dstDv.filterNot(srcDv).map(place(_, srcDv))
    val bloomAdds = dstBloom.filterNot(srcBloom).map(place(_, srcBloom))
    // the clone's removals apply to what is STILL live at the head —
    // base files the source itself already retired need (and tolerate)
    // no second removal
    val removes = ((srcLive -- dstLive.toSet) intersect nowLive).toSeq ++
      ((srcDv -- dstDv.toSet) intersect nowDv).toSeq ++
      ((srcBloom -- dstBloom.toSet) intersect nowBloom).toSeq
    // zone maps for the published adds travel with the rehome (every add
    // was rehomed by construction — it is a file the source didn't have);
    // __bytes re-records inside commit() for the new paths
    val stats = Snapshots.fileStats(spark, dst, Some(dstV))
      .filterNot(_.column == Snapshots.BytesStat)
      .filter(st => rehomed.contains(st.path))
      .map(st => st.copy(path = rehomed(st.path)))
    // schema three-way: evolved on one side carries; both→different refuses
    val dstSchema = Snapshots.tableSchema(spark, dst, Some(dstV))
    val srcSchema = Snapshots.tableSchema(spark, src, Some(cur))
    val baseSchema = Snapshots.tableSchema(spark, src, Some(base))
    if (dstSchema != baseSchema && srcSchema != baseSchema &&
        dstSchema != srcSchema)
      throw new IllegalStateException(
        s"publish conflict: both $src (v$base→v$cur) and the clone $dst " +
          "evolved the schema to different shapes; re-clone and re-apply")
    val version = Snapshots.commit(spark, src,
      adds = adds, removes = removes, dvAdds = dvAdds, bloomAdds = bloomAdds,
      baseVersion = Some(cur),
      schemaJson = if (dstSchema != baseSchema && dstSchema != srcSchema)
        dstSchema.map(_.json) else None,
      stats = stats,
      notes = Seq(s"wap-publish:$dst@$dstV"))
    // the publish commit now holds the shared files live — the lifecycle
    // pin has done its job
    Snapshots.retractTag(spark, src, pinOf(props, dst))
    PublishResult(version, adds.size, removes.size, rehomed.size)
  }

  /** Abandon a clone: retract the source's lifecycle pin (the clone's
    * directory is left for the operator — it may still be referenced by
    * nothing, but deleting data is an operator decision). */
  def abandon(spark: SparkSession, dst: String): Unit = {
    val props = Snapshots.tableProperties(spark, dst)
    val src = props.getOrElse("wap.source", throw new IllegalArgumentException(
      s"$dst is not a WAP clone"))
    Snapshots.retractTag(spark, src, pinOf(props, dst))
  }
}
