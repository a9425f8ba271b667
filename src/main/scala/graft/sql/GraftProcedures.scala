package graft.sql

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructType}

import graft.io.Snapshots

/** SQL MAINTENANCE PROCEDURES for snapshot tables — the DSv2
  * `ProcedureCatalog` half of [[GraftCatalog]], so the operations a
  * table operator schedules are themselves one SQL statement away:
  *
  * {{{
  *   CALL graft.system.optimize('t', 'a,b', 16)     -- Z-order rewrite
  *   CALL graft.system.compact_small('t', 33554432, 134217728)
  *   CALL graft.system.bloom_index('t', 'doc_id', 0.01)
  *   CALL graft.system.checkpoint('t')
  *   CALL graft.system.expire('t', 9)               -- bounded history
  *   CALL graft.system.vacuum('t')
  *   CALL graft.system.restore('t', 3)
  *   CALL graft.system.tag('t', 'v2-curated', 3)
  *   CALL graft.system.fast_count('t')
  * }}}
  *
  * Each CALL runs the corresponding transactional library operation
  * (same multi-writer discipline, same refusals) and returns its result
  * as one row — the Iceberg `CALL catalog.system.…` surface shape. Table
  * arguments are identifiers relative to the catalog root, so the same
  * statement works across environments.
  */
object GraftProcedures {

  private val S = DataTypes.StringType
  private val L = DataTypes.LongType
  private val D = DataTypes.DoubleType

  private def in(n: String, t: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(n, t).build()
  private def inDef(n: String, t: org.apache.spark.sql.types.DataType,
                    default: String) =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  private def mkDef(name: String, doc: String, params: Seq[ProcedureParameter],
                    out: StructType)(
      run: (SparkSession, String, InternalRow) => Seq[Any]): Def =
    Def(name, doc, params, out, run)

  /** One procedure definition; [[load]] binds it to a catalog root. */
  private final case class Def(name: String, doc: String,
                               params: Seq[ProcedureParameter], out: StructType,
                               run: (SparkSession, String, InternalRow) => Seq[Any])

  /** A definition bound to its catalog root — self-binding (fixed
    * parameters), one output row per CALL. */
  private final class P(d: Def, root: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = d.name
    override def description(): String = d.doc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = d.params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val values = d.run(SparkSession.active, root, input).toArray
      val row: InternalRow = new GenericInternalRow(values)
      util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = d.out
      }).iterator()
    }
  }

  private def tbl(root: String, input: InternalRow, i: Int): String =
    s"$root/${input.getUTF8String(i).toString}"

  private val procedures: Map[String, Def] = Seq(
    mkDef("optimize", "transactional Z-order layout rewrite (OPTIMIZE ZORDER BY)",
      Seq(in("table", S), inDef("cols", S, "''"), inDef("target_files", L, "0"),
        inDef("bits", L, "16")),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("files_before", L, false),
        DataTypes.createStructField("files_after", L, false))))(
      (s, root, in) => {
        // empty cols defaults to the table's recorded cluster spec and
        // target_files=0 sizes by bytes (~512 MiB each) — a PARTITIONED
        // BY table heals its layout with a bare CALL optimize('t')
        val path = tbl(root, in, 0)
        val explicit = in.getUTF8String(1).toString.split(',')
          .toSeq.map(_.trim).filter(_.nonEmpty)
        val cols =
          if (explicit.nonEmpty) explicit
          else graft.io.Clustering.statCols(s, path) match {
            case Nil => throw new IllegalArgumentException(
              s"optimize: pass cols, or set $path's write.cluster.by " +
                "(CREATE ... PARTITIONED BY) to default from it")
            case cs => cs
          }
        val target =
          if (in.getLong(2) > 0) in.getLong(2).toInt
          else {
            // sum the __bytes stats commits already record — zero
            // per-file getFileStatus RPCs on the common path (exactly
            // what t$files reads them for); only legacy files missing
            // the stat fall back to a metadata RPC each
            val live = Snapshots.liveFiles(s, path)
            val recorded = Snapshots.fileStats(s, path)
              .filter(_.column == Snapshots.BytesStat)
              .map(st => st.path -> st.min.toLong).toMap
            lazy val fsys = new org.apache.hadoop.fs.Path(path)
              .getFileSystem(s.sparkContext.hadoopConfiguration)
            val bytes = live.map(p => recorded.getOrElse(p,
              fsys.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen)).sum
            math.max(1, math.ceil(bytes / (512.0 * 1024 * 1024)).toInt)
          }
        val r = Snapshots.optimizeZorder(s, path, cols, target,
          in.getLong(3).toInt)
        Seq(r.version, r.filesBefore.toLong, r.filesAfter.toLong)
      }),
    mkDef("maintain", "one-call maintenance sweep: binpack small files, verified checkpoint, age-based expiry, vacuum",
      Seq(in("table", S), inDef("small_mb", L, "32"), inDef("target_mb", L, "256"),
        inDef("keep_days", L, "0")),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("packed", L, false),
        DataTypes.createStructField("checkpointed", L, false),
        DataTypes.createStructField("expired_versions", L, false),
        DataTypes.createStructField("vacuumed", L, false))))(
      (s, root, in) => {
        // the nightly sweep as one statement, each step the library
        // transaction with its own discipline: binpack the small-file
        // tail (O(tail)); checkpoint so later expiry has a verified
        // anchor; expire by age ONLY when keep_days > 0 (retention is
        // opt-in — deleting history must be asked for); vacuum last so
        // files the expiry just unreferenced reclaim in the same call
        val path = tbl(root, in, 0)
        val packed = Snapshots.compactSmall(s, path,
          smallBytes = in.getLong(1) * 1024 * 1024,
          targetBytes = in.getLong(2) * 1024 * 1024).packed
        val ck = Snapshots.checkpoint(s, path)
        val expired =
          if (in.getLong(3) <= 0) 0L
          else Snapshots.expireOlderThan(s, path,
            System.currentTimeMillis() - in.getLong(3) * 24L * 3600 * 1000)
            .expired.size.toLong
        val vacuumed = Snapshots.vacuum(s, path).size.toLong
        Seq(Snapshots.currentVersion(s, path), packed.toLong, ck, expired, vacuumed)
      }),
    mkDef("clone", "zero-copy WAP clone: stage risky changes on a full table in O(metadata)",
      Seq(in("source", S), in("dest", S), inDef("version", L, "0"),
        inDef("ref", S, "''")),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("base", L, false))))(
      (s, root, in) => {
        val src = tbl(root, in, 0)
        // ref (a TAG name) beats version beats current — cloning the
        // 'v2-curated' corpus by name is the reproducibility story
        val ref = in.getUTF8String(3).toString
        val v =
          if (ref.nonEmpty) Some(Snapshots.tagVersion(s, src, ref))
          else if (in.getLong(2) > 0) Some(in.getLong(2))
          else None
        val cloned = graft.io.Wap.clone(s, src,
          s"$root/${in.getUTF8String(1).toString}", v)
        Seq(cloned, v.getOrElse(Snapshots.currentVersion(s, src)))
      }),
    mkDef("publish", "atomically publish a WAP clone's state into its source",
      Seq(in("dest", S)),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("added", L, false),
        DataTypes.createStructField("removed", L, false),
        DataTypes.createStructField("rehomed", L, false))))(
      (s, root, in) => {
        val r = graft.io.Wap.publish(s, tbl(root, in, 0))
        Seq(r.version, r.added.toLong, r.removed.toLong, r.rehomed.toLong)
      }),
    mkDef("abandon", "retract a WAP clone's lifecycle pin without publishing",
      Seq(in("dest", S)),
      StructType(Seq(
        DataTypes.createStructField("abandoned", org.apache.spark.sql.types.DataTypes.BooleanType, false))))(
      (s, root, in) => {
        graft.io.Wap.abandon(s, tbl(root, in, 0))
        Seq(true)
      }),
    mkDef("compact_small", "binpack the small-file tail (O(tail), not O(table))",
      Seq(in("table", S), in("small_bytes", L), in("target_bytes", L)),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("packed", L, false),
        DataTypes.createStructField("files_after", L, false),
        DataTypes.createStructField("untouched", L, false))))(
      (s, root, in) => {
        val r = Snapshots.compactSmall(s, tbl(root, in, 0), in.getLong(1),
          in.getLong(2))
        Seq(r.version, r.packed.toLong, r.filesAfter.toLong, r.untouched.toLong)
      }),
    mkDef("bloom_index", "build/extend the per-file bloom point-lookup index",
      Seq(in("table", S), in("column", S), inDef("fpp", D, "0.01")),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("indexed", L, false),
        DataTypes.createStructField("already_indexed", L, false))))(
      (s, root, in) => {
        val r = Snapshots.buildBloomIndex(s, tbl(root, in, 0),
          in.getUTF8String(1).toString, in.getDouble(2))
        Seq(r.version, r.indexed.toLong, r.alreadyIndexed.toLong)
      }),
    mkDef("checkpoint", "write a verified full-state checkpoint at the current version",
      Seq(in("table", S)),
      StructType(Seq(DataTypes.createStructField("version", L, false))))(
      (s, root, in) => Seq(Snapshots.checkpoint(s, tbl(root, in, 0)))),
    mkDef("expire", "expire history below keep_from (verified checkpoint anchors the horizon)",
      Seq(in("table", S), in("keep_from", L)),
      StructType(Seq(
        DataTypes.createStructField("expired", L, false),
        DataTypes.createStructField("horizon", L, false))))(
      (s, root, in) => {
        val r = Snapshots.expireVersions(s, tbl(root, in, 0), in.getLong(1))
        Seq(r.expired.size.toLong, r.checkpointAt)
      }),
    mkDef("vacuum", "delete files no committed version references",
      Seq(in("table", S)),
      StructType(Seq(DataTypes.createStructField("deleted", L, false))))(
      (s, root, in) => Seq(Snapshots.vacuum(s, tbl(root, in, 0)).size.toLong)),
    mkDef("restore", "metadata-only rollback to a version's content (new commit)",
      Seq(in("table", S), in("to_version", L)),
      StructType(Seq(DataTypes.createStructField("version", L, false))))(
      (s, root, in) =>
        Seq(Snapshots.restore(s, tbl(root, in, 0), in.getLong(1)))),
    mkDef("tag", "pin an immutable named tag to a version",
      Seq(in("table", S), in("name", S), in("version", L)),
      StructType(Seq(DataTypes.createStructField("version", L, false))))(
      (s, root, in) => Seq(Snapshots.tag(s, tbl(root, in, 0),
        in.getUTF8String(1).toString, Some(in.getLong(2))))),
    mkDef("fast_count", "COUNT(*) from manifest metadata (exact; scan fallback)",
      Seq(in("table", S)),
      StructType(Seq(DataTypes.createStructField("rows", L, false))))(
      (s, root, in) => Seq(Snapshots.fastCount(s, tbl(root, in, 0)))),
    mkDef("analyze",
      "record per-column NDV/null/length statistics for the cost-based " +
        "optimizer (one aggregation pass; stats ride as transactional " +
        "properties and report through the scan's columnStats); " +
        "histogram_bins > 1 additionally records equi-height histograms " +
        "on numeric columns for skew-honest selectivity",
      Seq(in("table", S), in("columns", S), inDef("histogram_bins", L, "0")),
      StructType(Seq(DataTypes.createStructField("analyzed", L, false))))(
      (s, root, in) => Seq(graft.io.ColStats.analyze(s, tbl(root, in, 0),
        in.getUTF8String(1).toString.split(',').map(_.trim)
          .filter(_.nonEmpty).toSeq,
        histogramBins = in.getLong(2).toInt).size.toLong)),
    mkDef("branch",
      "fork the table as a named branch (zero-copy WAP clone; read via " +
        "VERSION AS OF '<name>', write via <table>._branches.<name>)",
      Seq(in("table", S), in("name", S), inDef("version", L, "0")),
      StructType(Seq(DataTypes.createStructField("version", L, false))))(
      (s, root, in) => Seq(graft.io.Branches.create(s, tbl(root, in, 0),
        in.getUTF8String(1).toString,
        Some(in.getLong(2)).filter(_ > 0)))),
    mkDef("fast_forward",
      "publish a branch back into its table as ONE atomic commit " +
        "(three-way merge at file granularity: disjoint-file changes land, " +
        "double-rewrites refuse) and close it",
      Seq(in("table", S), in("name", S)),
      StructType(Seq(
        DataTypes.createStructField("version", L, false),
        DataTypes.createStructField("added", L, false),
        DataTypes.createStructField("removed", L, false))))(
      (s, root, in) => {
        val r = graft.io.Branches.merge(s, tbl(root, in, 0),
          in.getUTF8String(1).toString)
        Seq(r.version, r.added.toLong, r.removed.toLong)
      }),
    mkDef("drop_branch", "abandon a branch: retract its pin, delete its directory",
      Seq(in("table", S), in("name", S)),
      StructType(Seq(DataTypes.createStructField("dropped", L, false))))(
      (s, root, in) => {
        graft.io.Branches.drop(s, tbl(root, in, 0), in.getUTF8String(1).toString)
        Seq(1L)
      }),
    mkDef("create_mv",
      "create an INCREMENTALLY MAINTAINED view of `GROUP BY dims` aggregates " +
        "over a source table's change feed; the spec persists as table " +
        "properties and `SELECT * FROM <catalog>.<view>` reads it",
      Seq(in("view", S), in("source", S), in("keys", S), in("dims", S),
        inDef("measures", S, "''"), inDef("min_max", S, "''"),
        inDef("approx_distinct", S, "''"), inDef("auto_refresh", S, "''")),
      StructType(Seq(
        DataTypes.createStructField("view_version", L, false),
        DataTypes.createStructField("versions_applied", L, false))))(
      (s, root, in) => {
        val view = tbl(root, in, 0)
        val sourceRel = in.getUTF8String(1).toString
        require(Snapshots.versions(s, view).isEmpty,
          s"$view already exists; refresh_mv maintains an existing view")
        require(Snapshots.versions(s, s"$root/$sourceRel").nonEmpty,
          s"source table $root/$sourceRel does not exist")
        def strOf(i: Int) = in.getUTF8String(i).toString
        require(strOf(7).isEmpty || Seq("true", "false").contains(strOf(7)),
          s"auto_refresh must be 'true' or 'false', got '${strOf(7)}'")
        val props = Seq(
          "mv.source" -> sourceRel, "mv.keys" -> strOf(2), "mv.dims" -> strOf(3),
          "mv.measures" -> strOf(4), "mv.minmax" -> strOf(5),
          "mv.distinct" -> strOf(6),
          "mv.auto" -> (if (strOf(7) == "true") "true" else ""))
          .filter(_._2.nonEmpty)
        Snapshots.commit(s, view, adds = Nil,
          props = props.map { case (k, v) => k -> Some(v) })
        val applied = refreshMv(s, root, view)
        Seq(Snapshots.currentVersion(s, view), applied.size.toLong)
      }),
    mkDef("refresh_mv",
      "catch a materialized view up with its source's change feed — ALL " +
        "pending versions fold in ONE transactional merge; replays skip on " +
        "the note ledger (exactly-once)",
      Seq(in("view", S)),
      StructType(Seq(
        DataTypes.createStructField("view_version", L, false),
        DataTypes.createStructField("versions_applied", L, false))))(
      (s, root, in) => {
        val view = tbl(root, in, 0)
        val applied = refreshMv(s, root, view)
        Seq(Snapshots.currentVersion(s, view), applied.size.toLong)
      })
  ).map(d => d.name -> d).toMap

  /** The shared maintenance step: resolve the view's persisted spec
    * ([[graft.io.ViewMaintenance]] parameters ride as `mv.*` table
    * properties) and fold every unapplied source version. The feed
    * materializes under `<view>/_feed` — outside `data/`/`_index`, so
    * vacuum never touches it and the view table's own commits stay the
    * only ledger. */
  private[sql] def refreshMv(s: SparkSession, root: String, view: String): Seq[Long] = {
    val props = Snapshots.tableProperties(s, view)
    val sourceRel = props.getOrElse("mv.source",
      throw new IllegalArgumentException(
        s"$view is not a materialized view (no mv.source property)"))
    def list(k: String): Seq[String] = props.get(k)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    graft.io.ViewMaintenance.maintain(s, s"$root/$sourceRel",
      keys = list("mv.keys"), dims = list("mv.dims"),
      measures = list("mv.measures"), feedDir = s"$view/_feed",
      viewTable = view, minMax = list("mv.minmax"),
      distinct = list("mv.distinct"))
  }

  /** Resolve `graft.system.<name>`, bound to this catalog's root. */
  def load(root: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().toSeq == Seq("system"),
      s"procedures live under the 'system' namespace, got $ident")
    val d = procedures.getOrElse(ident.name(),
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name()}' " +
          s"(have: ${procedures.keys.toSeq.sorted.mkString(", ")})"))
    new P(d, root)
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      procedures.keys.toSeq.sorted.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty
}
