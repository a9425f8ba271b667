package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Snapshots

/** SQL surface for snapshot tables ([[graft.io.Snapshots]]) — a
  * DataSourceV2 `TableCatalog`, so the entire lakehouse layer is
  * reachable from `spark.sql` the way a user first touches any table:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/tables")
  *   spark.sql("SELECT * FROM graft.docs WHERE doc_id = 42")
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.docs VERSION AS OF 'v2-curated'")  // tag
  *   spark.sql("SELECT * FROM graft.docs TIMESTAMP AS OF '2026-08-15 12:00:00'")
  * }}}
  *
  * An identifier `graft.a.b.t` maps to the table root `<root>/a/b/t`;
  * version resolution is PINNED at analysis time (`loadTable`), so one
  * query sees one immutable snapshot even while writers commit. The
  * audit surface is SQL too: `` graft.`t$history` `` / `` `t$files` `` /
  * `` `t$tags` `` / `` `t$detail` `` are metadata tables
  * ([[GraftMetaTable]]).
  *
  * Reads push down through the manifest's own metadata, which is the
  * scale story at 100 TB: `SupportsPushDownRequiredColumns` prunes the
  * parquet scan to the referenced columns, and `SupportsPushDownFilters`
  * turns SQL predicates into FILE PRUNING — zone-map range intersection
  * ([[Snapshots.fileStats]]) for ranges and one-sided comparisons, bloom
  * sidecar probes ([[Snapshots.bloomPrune]]) for point predicates — so
  * `WHERE doc_id = k` opens O(matching files), not O(table). Pruning is
  * CONSERVATIVE (a kept file may still hold no match), so every pushed
  * filter is also returned to Spark for re-evaluation AND applied inside
  * the wrapped scan (parquet row-group pushdown); correctness never
  * depends on the metadata.
  *
  * The physical read reuses Spark's own parquet source through the
  * [[V1Scan]] fallback (the JDBC-connector pattern): the scan builds a
  * pruned DataFrame over exactly the candidate files — deletion vectors
  * resolved, recorded schema enforced ([[Snapshots.readLiveSubset]]) —
  * and hands Spark its RDD. Rows pay one Row↔InternalRow conversion, the
  * price of not re-implementing a vectorized parquet reader; the scan
  * itself stays distributed, pruned, and codegen'd below the boundary.
  *
  * CREATE TABLE / CTAS work (an empty schema-stamped v1, then ordinary
  * transactional appends); row-level DML (MERGE/DELETE/UPDATE) stays
  * with the transactional library API, which is where the multi-writer
  * discipline lives. DROP TABLE deletes the tree once no branch or WAP
  * clone still shares its files; `renameTable` throws (a directory move
  * is non-atomic on object stores — clone + publish instead).
  * MAINTENANCE is SQL: the catalog is also a
  * `ProcedureCatalog`, so
  * `CALL graft.system.optimize('t', 'a,b', 16)`, `compact_small`,
  * `bloom_index`, `checkpoint`, `expire`, `vacuum`, `restore`, `tag`,
  * and `fast_count` run the same library transactions from a SQL
  * statement ([[GraftProcedures]], the Iceberg `CALL catalog.system.…`
  * shape).
  *
  * Reference analog: the `latest/` stable-read surface (`DP:482-488`) —
  * the "just query it" entry point — generalized to versioned SQL.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root = <tables dir>"))
    // manifest statistics must survive the V1ScanWrapper pushdown boundary
    // or join planning sees defaultSizeInBytes and never broadcasts a
    // graft table — see [[org.apache.spark.sql.graft.StatsShim]]
    org.apache.spark.sql.graft.StatsShim.register(SparkSession.active)
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tablePath(ident: Identifier): String =
    (root +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def exists(path: String): Boolean = {
    val p = new Path(s"$path/_manifest")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = (root +: namespace.toSeq).mkString("/")
    val p = new Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => exists(s"$dir/$n"))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    // `t$history` / `t$files` / `t$tags` / `t$detail` — metadata tables
    // ([[GraftMetaTable]]); everything else is the data table itself
    ident.name().split('$') match {
      case Array(base, kind) if GraftMetaTable.Kinds(kind) =>
        val basePath = tablePath(Identifier.of(ident.namespace(), base))
        if (!exists(basePath)) throw new NoSuchTableException(ident)
        return new GraftMetaTable(basePath, ident.toString, kind)
      case _ =>
    }
    val path = tablePath(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    cutVersion(ident, path) match {
      case Some(v) => new GraftTable(path, s"$ident@cut$v", v)
      case None =>
        // FRESHNESS-ON-READ for auto-refresh MVs (`create_mv(…,
        // auto_refresh => 'true')`): fold any unapplied source versions
        // BEFORE pinning, so every read observes a view current with its
        // source — the deferred-maintenance contract (refresh work runs
        // when someone reads, amortized by the exactly-once note ledger:
        // a fresh view costs one metadata check, racing readers
        // serialize through the optimistic commit, and per-source-commit
        // write amplification never happens). Time-travel / cut reads
        // above bypass it (reading the past must not mutate the present).
        if (Snapshots.tableProperties(spark, path).get("mv.auto")
            .contains("true"))
          GraftProcedures.refreshMv(spark, root, path)
        new GraftTable(path, ident.toString,
          Snapshots.currentVersion(spark, path)) // pinned: one query, one snapshot
    }
  }

  /** SESSION-PINNED CONSISTENT CUTS — [[graft.io.MultiTable]]'s
    * cross-table guarantee reachable from SQL:
    *
    * {{{
    *   SET spark.graft.cut.<catalog> = <ledger>        -- newest cut
    *   SET spark.graft.cut.<catalog> = <ledger>@<v>    -- historical cut
    *   SET spark.graft.cut.<catalog> =                 -- (empty) unpin
    * }}}
    *
    * While pinned, every PLAIN read through this catalog resolves member
    * tables at the cut's published versions — two tables derived
    * together are read together, never index-ahead-of-data. Reading a
    * NON-member while pinned refuses ("consistent" would be a lie);
    * explicit `VERSION/TIMESTAMP AS OF` and the ledger itself bypass the
    * pin (they name their own snapshot). The cut is re-resolved per
    * query analysis: an unversioned pin tracks the newest published cut,
    * a `@v` pin replays history forever. */
  private def cutVersion(ident: Identifier, path: String): Option[Long] = {
    import graft.io.MultiTable
    spark.conf.getOption(s"spark.graft.cut.$catalogName")
      .map(_.trim).filter(_.nonEmpty).flatMap { spec =>
        val (ledgerRel, lv) = spec.split('@') match {
          case Array(l)    => (l, None)
          case Array(l, v) => (l, Some(v.toLong))
          case _ => throw new IllegalArgumentException(
            s"spark.graft.cut.$catalogName must be <ledger> or <ledger>@<version>, got '$spec'")
        }
        val ledgerPath = s"$root/$ledgerRel"
        if (path == ledgerPath) None // the cut's own source reads normally
        else {
          val cut = MultiTable.resolveAt(spark, ledgerPath,
            lv.getOrElse(Snapshots.currentVersion(spark, ledgerPath)))
          val rel = (ident.namespace() :+ ident.name()).mkString("/")
          Some(cut.getOrElse(path, cut.getOrElse(rel,
            throw new IllegalArgumentException(
              s"$ident is not a member of the pinned cut $spec " +
                s"(members: ${cut.keys.toSeq.sorted.mkString(", ")}); " +
                "unpin the session or read a member table"))))
        }
      }
  }

  /** `VERSION AS OF x` — a TAG name first, then a BRANCH name, then a
    * version number (the Iceberg ref-before-snapshot-id order:
    * [[Snapshots.tag]] imposes no naming rule, so a tag legitimately
    * named '123' must win over version 123 — resolving numbers first
    * would silently read the wrong snapshot; [[graft.io.Branches]]
    * refuses tag-shadowing names at create, so tag-then-branch is
    * unambiguous). A branch ref reads the BRANCH's current head — the
    * live fork, not a frozen version. A non-ref, non-numeric (or empty)
    * string rejects with the failed resolutions named. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = tablePath(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    Snapshots.tags(spark, path).get(version) match {
      case Some(v) =>
        require(v == 0 || Snapshots.versions(spark, path).contains(v),
          s"version $v of $path does not exist")
        new GraftTable(path, s"$ident@v$v", v)
      case None if version.nonEmpty && !version.forall(_.isDigit) &&
          graft.io.Branches.list(spark, path).contains(version) =>
        val bp = graft.io.Branches.path(path, version)
        new GraftTable(bp, s"$ident@$version",
          Snapshots.currentVersion(spark, bp))
      case None =>
        require(version.nonEmpty && version.forall(_.isDigit),
          s"'$version' is neither a tag nor a branch on $path nor a version number")
        val v = version.toLong
        require(v == 0 || Snapshots.versions(spark, path).contains(v),
          s"version $v of $path does not exist")
        new GraftTable(path, s"$ident@v$v", v)
    }
  }

  /** `TIMESTAMP AS OF t` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    val v = Snapshots.versionAt(spark, path, timestampMicros / 1000L)
    new GraftTable(path, s"$ident@v$v", v)
  }

  /** CREATE TABLE (and therefore CTAS — Spark creates, then appends
    * through the V1 write path): version 1 is an empty, schema-stamped
    * commit, so the new table immediately reads as a typed empty frame
    * and every later writer inherits the recorded schema.
    * `PARTITIONED BY` becomes manifest-native write clustering
    * ([[Clustering]]): identity and years/months/days/hours transforms
    * record as the `write.cluster.by` property; writers range-cluster and
    * zone-map on it, the scan prunes on it — hidden partitioning with no
    * directory layout. */
  /** COLUMN DEFAULT VALUES are supported end-to-end: declared at CREATE
    * or ADD COLUMN, they ride in the schema stamp as the standard
    * `CURRENT_DEFAULT` / `EXISTS_DEFAULT` field metadata — the analyzer
    * fills omitted INSERT columns from CURRENT_DEFAULT, and Spark's
    * parquet readers fill the column in files that PREDATE it from
    * EXISTS_DEFAULT (SPARK-38334 existence defaults), so an ADD COLUMN
    * … DEFAULT backfills 100 TB of history with zero rewrites while an
    * explicit NULL inserted later stays NULL (the fill applies only to
    * files physically missing the column). EXISTS_DEFAULT freezes the
    * CONSTANT value at declaration time; a later SET DEFAULT changes
    * future inserts only — the SQL-standard split. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS)

  /** The standard default-value field metadata from a declared default:
    * CURRENT_DEFAULT keeps the user's SQL text (future inserts re-fold
    * it), EXISTS_DEFAULT freezes the folded constant (what pre-existing
    * rows must forever read as). */
  private def defaultMeta(dv: org.apache.spark.sql.connector.catalog.ColumnDefaultValue,
                          base: org.apache.spark.sql.types.Metadata)
      : org.apache.spark.sql.types.Metadata = {
    val frozen = Option(dv.getValue)
      .map(lv => org.apache.spark.sql.catalyst.expressions
        .Literal(lv.value, lv.dataType).sql)
      .orElse(Option(dv.getSql))
      .getOrElse(throw new UnsupportedOperationException(
        s"column default carries neither a folded value nor SQL text: $dv"))
    new org.apache.spark.sql.types.MetadataBuilder().withMetadata(base)
      .putString("CURRENT_DEFAULT", Option(dv.getSql).getOrElse(frozen))
      .putString("EXISTS_DEFAULT", frozen)
      .build()
  }

  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val path = tablePath(ident)
    if (exists(path))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    val schema = StructType(columns.map { c =>
      val f0 = org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)
      val f1 = Option(c.defaultValue()).map(dv =>
        f0.copy(metadata = defaultMeta(dv, f0.metadata))).getOrElse(f0)
      // GENERATED ALWAYS AS (expr) rides the schema stamp under Spark's
      // generation-expression key; computation happens engine-side at
      // INSERT ([[GraftWriteBuilder.applyGenerated]])
      val f2 = Option(c.generationExpression()).map { ge =>
        f1.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f1.metadata)
          .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY, ge)
          .build())
      }.getOrElse(f1)
      // GENERATED … AS IDENTITY rides the schema stamp under Spark's own
      // identity metadata keys; assignment happens engine-side at INSERT
      // ([[GraftWriteBuilder]]) against a transactional high watermark
      Option(c.identityColumnSpec()).map { is =>
        // BIGINT only: the minting expression rides
        // monotonically_increasing_id(), whose partition-encoded values
        // exceed 2^33 — an INT identity would overflow (ANSI crash) or
        // wrap to DUPLICATE ids (the one invariant the feature promises)
        require(c.dataType == org.apache.spark.sql.types.LongType,
          s"IDENTITY column ${c.name} must be BIGINT, got ${c.dataType.simpleString}")
        import org.apache.spark.sql.catalyst.util.IdentityColumn
        f2.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f2.metadata)
          .putLong(IdentityColumn.IDENTITY_INFO_START, is.getStart)
          .putLong(IdentityColumn.IDENTITY_INFO_STEP, is.getStep)
          .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            is.isAllowExplicitInsert)
          .build())
      }.getOrElse(f2)
    })
    val clusterProp = Clustering.specOf(partitions, schema)
      .map(Clustering.Prop -> Some(_))
    Snapshots.commit(spark, path, adds = Nil, schemaJson = Some(schema.json),
      props = userProps(properties).toSeq.map { case (k, v) =>
        k -> Some(v) } ++ clusterProp)
    new GraftTable(path, ident.toString, Snapshots.currentVersion(spark, path))
  }

  /** TBLPROPERTIES minus the keys Spark itself injects on CREATE. */
  private def userProps(properties: util.Map[String, String]): Map[String, String] =
    properties.asScala.toMap -- Seq("provider", "location", "owner", "external")

  /** ALTER TABLE: `SET/UNSET TBLPROPERTIES`, `ADD COLUMNS`,
    * `RENAME COLUMN`, `DROP COLUMN` — each one transactional commit
    * (properties fold last-wins in the manifest; a schema change is a
    * schema stamp, the x95 evolution machinery: `AS OF` below the
    * evolution serves the old shape).
    *
    * RENAME is METADATA-ONLY: files keep the old physical name; the
    * `graft.column.mapping` property ([[Snapshots.MappingProp]]) carries
    * logical→physical so one scan serves both generations
    * ([[Snapshots.schemaRead]]) and old files' zone maps keep pruning
    * under the new name ([[Snapshots.fileStats]] translates). DROP is
    * metadata-only too: files unrewritten, reads project the column
    * away; its physical name is quarantined
    * ([[Snapshots.DroppedProp]]) so a later ADD cannot silently
    * resurrect the dropped data from old files. Type changes refuse:
    * files are immutable. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (!exists(path)) throw new NoSuchTableException(ident)
    // PIN the version every validation below reads at, and commit against
    // it: ADD CONSTRAINT validates existing rows, so a writer landing
    // between validation and commit would have validated against the OLD
    // constraint set — the pinned baseVersion makes that race a loud
    // ConcurrentCommitException (re-run the ALTER) instead of a silently
    // unvalidated constraint
    val pinnedV = Snapshots.currentVersion(spark, path)
    var propChanges: Seq[(String, Option[String])] = changes.collect {
      case s: TableChange.SetProperty    => s.property -> Some(s.value)
      case r: TableChange.RemoveProperty => r.property -> None
    }
    val addCols = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val widens = changes.collect { case u: TableChange.UpdateColumnType => u }
    val defSets = changes.collect {
      case u: TableChange.UpdateColumnDefaultValue => u }
    val conAdds = changes.collect { case a: TableChange.AddConstraint => a }
    val conDrops = changes.collect { case d: TableChange.DropConstraint => d }
    val other = changes.filterNot(c => c.isInstanceOf[TableChange.SetProperty] ||
      c.isInstanceOf[TableChange.RemoveProperty] ||
      c.isInstanceOf[TableChange.AddColumn] ||
      c.isInstanceOf[TableChange.RenameColumn] ||
      c.isInstanceOf[TableChange.DeleteColumn] ||
      c.isInstanceOf[TableChange.UpdateColumnType] ||
      c.isInstanceOf[TableChange.UpdateColumnDefaultValue] ||
      c.isInstanceOf[TableChange.AddConstraint] ||
      c.isInstanceOf[TableChange.DropConstraint])
    if (other.nonEmpty) throw new UnsupportedOperationException(
      s"graft tables support ALTER TABLE SET/UNSET TBLPROPERTIES, ADD " +
        s"COLUMNS, RENAME COLUMN, DROP COLUMN, widening ALTER COLUMN " +
        s"TYPE, SET/DROP DEFAULT and ADD/DROP CONSTRAINT … CHECK only " +
        s"(files are immutable; other changes would re-map history) — " +
        s"got ${other.mkString(", ")}")
    // ADD CONSTRAINT … CHECK: validate the EXISTING live rows once (the
    // inherent O(table) cost every engine pays at declaration — column-
    // pruned to the predicate's columns), then record the predicate SQL
    // as a property; every later write validates its own O(change) slice
    // ([[graft.io.Constraints]]). Other constraint kinds (UNIQUE/PK/FK)
    // have no distributed enforcement story worth faking — refuse.
    conAdds.foreach { a =>
      a.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          val name = c.name()
          require(name.nonEmpty && !name.contains("="),
            s"constraint name '$name' must be non-empty without '='")
          val existing = graft.io.Constraints.of(spark, path).toMap
          require(!existing.contains(name),
            s"constraint '$name' already exists on $path")
          val sql = Option(c.predicateSql()).getOrElse(
            throw new UnsupportedOperationException(
              s"CHECK constraint '$name' carries no predicate SQL"))
          val bad = graft.io.Constraints
            .violations(Snapshots.readAt(spark, path, Some(pinnedV)), sql)
            .limit(1).count()
          require(bad == 0,
            s"cannot add CHECK constraint '$name' ($sql): existing rows " +
              s"of $path violate it")
          propChanges ++= Seq(
            graft.io.Constraints.Prefix + name -> Some(sql))
        case otherC => throw new UnsupportedOperationException(
          s"graft tables enforce CHECK constraints only, got $otherC")
      }
    }
    conDrops.foreach { d =>
      val existing = graft.io.Constraints.of(spark, path).toMap
      if (!existing.contains(d.name()) && !d.ifExists())
        throw new IllegalArgumentException(
          s"no such constraint '${d.name()}' on $path")
      propChanges ++= Seq(graft.io.Constraints.Prefix + d.name() -> None)
    }
    val schemaChanges = addCols.nonEmpty || renames.nonEmpty ||
      drops.nonEmpty || widens.nonEmpty || defSets.nonEmpty
    val schemaJson = if (!schemaChanges) None else {
      var cur = Snapshots.tableSchema(spark, path).getOrElse(
        throw new UnsupportedOperationException(
          s"$path records no schema; schema evolution needs a " +
            "schema-stamped table"))
      val props = Snapshots.tableProperties(spark, path)
      var mapping = Snapshots.columnMapping(spark, path)
      var dropped = props.get(Snapshots.DroppedProp)
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
      // columns a live deletion vector keys on cannot change name or
      // drop — the tombstone join would silently stop resolving
      lazy val dvKeyCols: Set[String] = {
        val dvs = Snapshots.liveDvFiles(spark, path)
        if (dvs.isEmpty) Set.empty
        else spark.read.parquet(dvs: _*).columns.toSet
      }
      def physOf(logical: String): String = mapping.getOrElse(logical, logical)
      renames.foreach { r =>
        require(r.fieldNames().length == 1,
          s"nested RENAME COLUMN is not supported: ${r.fieldNames().mkString(".")}")
        val from = r.fieldNames().head; val to = r.newName()
        require(cur.fieldNames.contains(from), s"no such column: $from")
        require(!cur.fieldNames.contains(to), s"column $to already exists")
        require(!dropped.contains(to) && !mapping.valuesIterator.contains(to),
          s"cannot rename to '$to': old files still carry data under that " +
            "physical name (OPTIMIZE to purge, or pick another name)")
        require(!dvKeyCols.contains(from),
          s"cannot rename '$from': live deletion vectors key on it " +
            "(compact to fold them first)")
        val fromCons = graft.io.Constraints.mentioning(spark, path, from)
        require(fromCons.isEmpty,
          s"cannot rename '$from': CHECK constraint(s) " +
            s"${fromCons.mkString(", ")} reference it (DROP CONSTRAINT first)")
        val phys = physOf(from)
        mapping = (mapping - from) ++ (if (phys == to) Nil else Seq(to -> phys))
        cur = StructType(cur.fields.map(f =>
          if (f.name == from) f.copy(name = to) else f))
        // clustered tables keep clustering through the rename
        props.get(graft.io.Clustering.Prop)
          .filter(spec => graft.io.Clustering.parse(spec).exists(_._2 == from))
          .foreach { spec =>
            val renamed = graft.io.Clustering.parse(spec).map {
              case (fn, c) =>
                val c2 = if (c == from) to else c
                if (fn.isEmpty) c2 else s"$fn($c2)"
            }.mkString(",")
            propChanges ++= Seq(graft.io.Clustering.Prop -> Some(renamed))
          }
      }
      drops.foreach { d =>
        require(d.fieldNames().length == 1,
          s"nested DROP COLUMN is not supported: ${d.fieldNames().mkString(".")}")
        val name = d.fieldNames().head
        require(cur.fieldNames.contains(name), s"no such column: $name")
        require(cur.fields.length > 1, "cannot drop the last column")
        require(!dvKeyCols.contains(name),
          s"cannot drop '$name': live deletion vectors key on it " +
            "(compact to fold them first)")
        require(!graft.io.Clustering.statCols(spark, path).contains(name),
          s"cannot drop cluster column '$name': change write.cluster.by first")
        val nameCons = graft.io.Constraints.mentioning(spark, path, name)
        require(nameCons.isEmpty,
          s"cannot drop '$name': CHECK constraint(s) " +
            s"${nameCons.mkString(", ")} reference it (DROP CONSTRAINT first)")
        dropped = (dropped :+ physOf(name)).distinct
        mapping -= name
        cur = StructType(cur.fields.filterNot(_.name == name))
      }
      // METADATA-ONLY TYPE WIDENING (the Iceberg type-promotion set that
      // Spark 4's parquet readers resolve at scan time, SPARK-40876): the
      // schema stamp re-records the column wide, existing files stay
      // byte-identical and read promoted, zone maps keep pruning (the
      // stat comparator already treats the integral chain and float/
      // double uniformly — old files compare under their recorded narrow
      // dtype, new bounds parse in it), and `AS OF` below the evolution
      // serves the narrow type from the stamp history. Narrowings and
      // re-mappings refuse: files are immutable.
      widens.foreach { u =>
        require(u.fieldNames().length == 1,
          s"nested ALTER COLUMN is not supported: ${u.fieldNames().mkString(".")}")
        val name = u.fieldNames().head
        require(cur.fieldNames.contains(name), s"no such column: $name")
        import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}
        val from = cur(name).dataType
        val to = u.newDataType()
        val ok = (from, to) match {
          case (ByteType, ShortType | IntegerType | LongType) => true
          case (ShortType, IntegerType | LongType)            => true
          case (IntegerType, LongType)                        => true
          case (FloatType, DoubleType)                        => true
          case _                                              => false
        }
        require(ok, s"ALTER COLUMN TYPE supports WIDENING only " +
          s"(tinyint→smallint→int→bigint, float→double); got " +
          s"${from.simpleString} → ${to.simpleString} — files are " +
          "immutable and a narrowing or re-mapping would corrupt history")
        require(!dvKeyCols.contains(name),
          s"cannot widen '$name': live deletion vectors key on it " +
            "(compact to fold them first)")
        cur = StructType(cur.fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f))
      }
      // ALTER COLUMN SET/DROP DEFAULT: CURRENT_DEFAULT only — future
      // inserts change, EXISTS_DEFAULT stays frozen (rows that predate
      // the column must forever read the value declared WITH it)
      defSets.foreach { u =>
        require(u.fieldNames().length == 1,
          s"nested ALTER COLUMN is not supported: ${u.fieldNames().mkString(".")}")
        val name = u.fieldNames().head
        require(cur.fieldNames.contains(name), s"no such column: $name")
        cur = StructType(cur.fields.map { f =>
          if (f.name != name) f
          else {
            val b = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
            Option(u.newCurrentDefault())
              .flatMap(dv => Option(dv.getSql)).filter(_.nonEmpty) match {
              case Some(sql) => b.putString("CURRENT_DEFAULT", sql)
              case None      => b.remove("CURRENT_DEFAULT")
            }
            f.copy(metadata = b.build())
          }
        })
      }
      val added = addCols.map { a =>
        require(a.fieldNames().length == 1,
          s"nested ADD COLUMNS is not supported: ${a.fieldNames().mkString(".")}")
        require(a.isNullable,
          s"new column ${a.fieldNames().head} must be nullable: existing " +
            "files cannot backfill a NOT NULL value")
        require(a.position() == null,
          "FIRST/AFTER positions are not supported; new columns append")
        require(!cur.fieldNames.contains(a.fieldNames().head),
          s"column ${a.fieldNames().head} already exists")
        require(!dropped.contains(a.fieldNames().head) &&
          !mapping.valuesIterator.contains(a.fieldNames().head),
          s"cannot add '${a.fieldNames().head}': old files still carry " +
            "data under that physical name and would resurrect it " +
            "(OPTIMIZE to purge, or pick another name)")
        val f = org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
        // ADD COLUMN … DEFAULT v: the default metadata makes every
        // pre-existing file serve v through the reader's existence
        // fill — a 100 TB backfill with zero rewrites
        Option(a.defaultValue()).map(dv =>
          f.copy(metadata = defaultMeta(dv, f.metadata))).getOrElse(f)
      }
      if (renames.nonEmpty || drops.nonEmpty) {
        propChanges ++= Seq(Snapshots.MappingProp -> (
          if (mapping.isEmpty) None
          else Some(mapping.map { case (l, p) => s"$l=$p" }.mkString(","))))
        propChanges ++= Seq(Snapshots.DroppedProp -> (
          if (dropped.isEmpty) None else Some(dropped.mkString(","))))
      }
      Some(StructType(cur.fields ++ added).json)
    }
    // cluster-spec EVOLUTION through the ordinary property surface:
    // re-validate against the current schema (a typo'd spec must refuse
    // at the ALTER, not silently stop clustering later writes) and
    // announce the layout split in the commit notes — `t$detail`'s
    // `unclustered_files` then tracks how much of the live set predates
    // the new spec until OPTIMIZE heals it
    val evolveNotes = propChanges.collect {
      case (p, v) if p == graft.io.Clustering.Prop =>
        v.foreach { spec =>
          Snapshots.tableSchema(spark, path)
            .foreach(Clustering.validateSpec(spec, _))
        }
        val old = Snapshots.tableProperties(spark, path).get(p)
        s"cluster-evolve:${old.getOrElse("(none)")}->${v.getOrElse("(none)")}"
    }
    Snapshots.commit(spark, path, adds = Nil, schemaJson = schemaJson,
      props = propChanges, notes = evolveNotes,
      baseVersion = Some(pinnedV))
    loadTable(ident)
  }

  /** DROP TABLE — deletes the table tree (manifest + data; destructive,
    * exactly the SQL contract). Refuses while OTHER tables still share
    * its files: live branches (each holds a lifecycle pin) and
    * outstanding WAP clones (`wap-` pins) must merge, publish or drop
    * first — otherwise the clone/branch would dangle on deleted data.
    * User tags die with the table (they pin versions, not consumers). */
  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    if (!exists(path)) return false
    val branches = graft.io.Branches.list(spark, path)
    if (branches.nonEmpty) throw new IllegalStateException(
      s"cannot DROP $path: live branches ${branches.mkString(", ")} — " +
        "fast_forward or drop_branch them first")
    val pins = Snapshots.tags(spark, path).keys.filter(_.startsWith("wap-"))
    if (pins.nonEmpty) throw new IllegalStateException(
      s"cannot DROP $path: outstanding WAP clones hold lifecycle pins " +
        s"(${pins.mkString(", ")}) — publish or abandon them first")
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables do not rename: a directory move is non-atomic on " +
        "object stores; CALL clone + publish to re-home a table's state")

  // ──────────────────────────────────────────────────────────────────
  // LOGICAL VIEWS (`CREATE [OR REPLACE] VIEW cat.v AS SELECT …`) — the
  // DSv2 ViewCatalog surface: a view is stored VIEW TEXT plus the
  // analysis-time schema, persisted as one JSON metadata file under
  // `<namespace>/_views/<name>.json` (temp-write + atomic rename).
  // Resolution re-parses the text at READ time against the session —
  // exactly the SQL standard's late-binding contract — so a view over a
  // graft table keeps seeing the table's current version while AS OF
  // reads of the table underneath are unaffected. DML against a view
  // fails resolution (a view is never a Table, so UPDATE/MERGE/DELETE
  // cannot bind it as a target). Names are one flat space with tables:
  // creating either over the other refuses.
  // ──────────────────────────────────────────────────────────────────
  import org.apache.spark.sql.connector.catalog.{View, ViewChange, ViewInfo}

  private case class ViewMeta(sql: String, currentCatalog: String,
      currentNamespace: Seq[String], schemaJson: String,
      queryColumnNames: Seq[String], columnAliases: Seq[String],
      columnComments: Seq[String], properties: Map[String, String])

  private def viewPath(ident: Identifier): Path =
    new Path(((root +: ident.namespace().toSeq) :+ "_views").mkString("/") +
      s"/${ident.name()}.json")

  private def viewFs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readViewMeta(ident: Identifier): Option[ViewMeta] = {
    val p = viewPath(ident)
    val f = viewFs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      Some(org.json4s.jackson.Serialization.read[ViewMeta](s))
    }
  }

  private def writeViewMeta(ident: Identifier, m: ViewMeta): Unit = {
    val p = viewPath(ident)
    val f = viewFs(p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${ident.name()}.${java.util.UUID.randomUUID()}.tmp")
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val out = f.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.write(m)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) throw new IllegalStateException(
      s"could not publish view metadata for $ident")
  }

  private class GraftView(ident: Identifier, m: ViewMeta) extends View {
    override def name(): String = ident.toString
    override def query(): String = m.sql
    override def currentCatalog(): String = m.currentCatalog
    override def currentNamespace(): Array[String] = m.currentNamespace.toArray
    override def schema(): StructType =
      org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
        .asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = m.queryColumnNames.toArray
    override def columnAliases(): Array[String] = m.columnAliases.toArray
    override def columnComments(): Array[String] = m.columnComments.toArray
    override def properties(): util.Map[String, String] = m.properties.asJava
  }

  override def viewExists(ident: Identifier): Boolean =
    viewFs(viewPath(ident)).exists(viewPath(ident))

  override def loadView(ident: Identifier): View =
    readViewMeta(ident).map(new GraftView(ident, _)).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val dir = new Path(((root +: namespace.toSeq) :+ "_views").mkString("/"))
    val f = viewFs(dir)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(n => Identifier.of(namespace.toArray, n.stripSuffix(".json")))
      .toArray
  }

  private def metaOf(info: ViewInfo): ViewMeta =
    ViewMeta(info.sql(), info.currentCatalog(),
      info.currentNamespace().toSeq, info.schema().json,
      info.queryColumnNames().toSeq, info.columnAliases().toSeq,
      info.columnComments().toSeq, info.properties().asScala.toMap)

  override def createView(info: ViewInfo): View = {
    val ident = info.ident()
    if (exists(tablePath(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    writeViewMeta(ident, metaOf(info))
    loadView(ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident()
    if (exists(tablePath(ident)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    if (!orCreate && !viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    writeViewMeta(ident, metaOf(info))
    loadView(ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val m = readViewMeta(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
    val props = changes.foldLeft(m.properties) {
      case (ps, s: ViewChange.SetProperty)    => ps + (s.property() -> s.value())
      case (ps, r: ViewChange.RemoveProperty) => ps - r.property()
      case (_, other) => throw new UnsupportedOperationException(
        s"graft views support SET/UNSET TBLPROPERTIES only, got $other")
    }
    writeViewMeta(ident, m.copy(properties = props))
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean = {
    val p = viewPath(ident)
    val f = viewFs(p)
    f.exists(p) && f.delete(p, false)
  }

  override def renameView(from: Identifier, to: Identifier): Unit = {
    val m = readViewMeta(from).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from))
    if (exists(tablePath(to)))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(to)
    if (viewExists(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(to)
    writeViewMeta(to, m)
    dropView(from)
  }

  /** Maintenance procedures (`CALL graft.system.optimize('t', …)` etc.) —
    * the writes that ARE exposed through SQL run the same transactional
    * library operations; see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list(namespace)
}

/** One pinned (table, version) snapshot as a DSv2 table. Reads resolve
  * at the pinned version; writes (INSERT INTO / INSERT OVERWRITE, via
  * the V1 write fallback) are transactional commits against the CURRENT
  * version — the same library operations, one SQL statement away.
  *
  * A MATERIALIZED VIEW (a table whose properties carry an `mv.source`
  * spec — see [[GraftProcedures]] `create_mv`) reads through the same
  * scan with ONE addition: the maintained aggregate stores emptied
  * groups as identity rows (`n_rows = 0`, the single-MERGE catch-up
  * contract of [[graft.io.ViewMaintenance]]), so every SQL read filters
  * them out, and the metadata COUNT(*) shortcut is disabled (it would
  * count ghosts). Direct writes to a view refuse — its content is
  * DERIVED; mutate the source and `CALL graft.system.refresh_mv`. */
final class GraftTable(val path: String, ident: String, val pinnedVersion: Long)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String = ident
  override def version(): String = pinnedVersion.toString

  /** Is this table a maintained view? (pinned-version property read —
    * one manifest replay at analysis time, no data touched) */
  lazy val isMaterializedView: Boolean =
    Snapshots.tableProperties(SparkSession.active, path, Some(pinnedVersion))
      .contains("mv.source")

  private[sql] def refuseMvWrite(what: String): Unit =
    if (isMaterializedView) throw new UnsupportedOperationException(
      s"$ident is a materialized view — its content derives from " +
        s"${Snapshots.tableProperties(SparkSession.active, path)("mv.source")}; " +
        s"$what the SOURCE table and CALL graft.system.refresh_mv instead")

  override lazy val schema: StructType = {
    val spark = SparkSession.active
    Snapshots.tableSchema(spark, path, Some(pinnedVersion)).getOrElse {
      val live = Snapshots.liveFiles(spark, path, Some(pinnedVersion))
      require(live.nonEmpty,
        s"version $pinnedVersion of $path is empty and records no schema")
      spark.read.parquet(live: _*).schema
    }
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  /** Recorded CHECK constraints, surfaced through the DSv2 constraint
    * API (DESCRIBE et al.); enforcement is engine-side on every write
    * path ([[graft.io.Constraints]]). */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    graft.io.Constraints.of(SparkSession.active, path).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** Manifest-recorded table properties, pinned like everything else
    * (SHOW TBLPROPERTIES reads these). */
  override def properties(): util.Map[String, String] =
    Snapshots.tableProperties(SparkSession.active, path,
      Some(pinnedVersion)).asJava

  /** The recorded clustering spec as transforms (SHOW CREATE / DESCRIBE
    * honesty; writes route through [[graft.io.Clustering.forWrite]] regardless). */
  override def partitioning(): Array[Transform] =
    Snapshots.tableProperties(SparkSession.active, path, Some(pinnedVersion))
      .get(Clustering.Prop).map(Clustering.transforms)
      .getOrElse(Array.empty)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(this)

  /** `DELETE FROM graft.t WHERE …` — the copy-on-write transactional
    * delete ([[Snapshots.deleteWhere]]): only files actually holding
    * matches rewrite, pre-delete versions keep time-traveling.
    * Spark asks first; a predicate this table can't translate exactly
    * refuses here (no silent approximation on a DELETE). With
    * `write.delete.mode=mor` set, routes to the deletion-vector path
    * instead ([[GraftTable.sqlDelete]]). */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftScan.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    refuseMvWrite("DELETE from")
    val cond = filters.flatMap(GraftScan.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true)) // TRUNCATE shape
    GraftTable.sqlDelete(SparkSession.active, path, cond, None)
  }
}

object GraftTable {
  /** Refuse row-level SQL mutation of a materialized view — shared by
    * every DML entry point (the DSv2 write/delete paths check their
    * table instance; the extension commands run against a bare path and
    * check here). */
  def refuseMvDml(spark: SparkSession, path: String, what: String): Unit = {
    val props = Snapshots.tableProperties(spark, path)
    if (props.contains("mv.source")) throw new UnsupportedOperationException(
      s"$path is a materialized view — its content derives from " +
        s"${props("mv.source")}; $what the SOURCE table and " +
        "CALL graft.system.refresh_mv instead")
  }

  /** The one SQL DELETE entry point (shared by the [[SupportsDelete]]
    * path and the extension rule's [[GraftDeleteCommand]]): routes on the
    * table's `write.delete.mode` property — `cow` (default) rewrites the
    * matching files ([[Snapshots.deleteWhere]]); `mor` commits one
    * key-tombstone deletion vector ([[Snapshots.deleteWhereMor]], write
    * cost O(matched keys), the CDC-heavy shape) keyed on
    * `write.merge.keys`. Properties travel in the manifest, so the knob
    * is itself transactional and time-travels. */
  def sqlDelete(spark: SparkSession, path: String,
                cond: Column, prune: Option[(String, String, String)]): Unit = {
    refuseMvDml(spark, path, "DELETE from")
    val props = Snapshots.tableProperties(spark, path)
    props.getOrElse("write.delete.mode", "cow") match {
      case "mor" =>
        val keys = props.get("write.merge.keys")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .filter(_.nonEmpty)
          .getOrElse(throw new IllegalArgumentException(
            s"$path sets write.delete.mode=mor but no write.merge.keys — " +
              "ALTER TABLE … SET TBLPROPERTIES ('write.merge.keys'='k1,k2')"))
        Snapshots.deleteWhereMor(spark, path, cond, keys, prune)
      case "cow" => Snapshots.deleteWhere(spark, path, cond, prune)
      case other => throw new IllegalArgumentException(
        s"unknown write.delete.mode '$other' on $path (cow | mor)")
    }
    ()
  }

  /** Replace the table's content with `df` as ONE swap commit (new files
    * in; the resolved version's live data + dvs + bloom sidecars out)
    * under optimistic concurrency with re-resolve retries — the INSERT
    * OVERWRITE machinery, shared with the full-sync MERGE
    * ([[GraftMergeCommand]]). Pre-overwrite versions keep time-traveling;
    * orphan dirs from lost races are vacuum food. */
  def overwrite(spark: SparkSession, path: String, df: DataFrame): Unit = {
    // clustered tables keep their layout + zone maps across overwrites
    // (an un-stat'd swap would silently turn pruning off until the next
    // OPTIMIZE — the worst kind of regression at 100 TB)
    val (clustered, statCols) = graft.io.Clustering.forWrite(spark, path, df)
    var attempts = 0
    var done = false
    while (!done) {
      val v = Snapshots.currentVersion(spark, path)
      val removes = Snapshots.liveFiles(spark, path, Some(v)) ++
        Snapshots.liveDvFiles(spark, path, Some(v)) ++
        Snapshots.liveBloomFiles(spark, path, Some(v))
      val dir = s"$path/data/${java.util.UUID.randomUUID()}"
      // CHECK constraints ride the write (fresh Observation per attempt —
      // one attaches to exactly one action); the gate still precedes the
      // swap commit
      val (inst, check) =
        graft.io.Constraints.observed(spark, path, clustered, "overwritten")
      Snapshots.writeData(inst, dir)
      check()
      val p = new Path(dir)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val partsSt = Snapshots.listParts(f, dir)
      val parts = partsSt.map(_.getPath.toString)
      try {
        Snapshots.commit(spark, path, adds = parts,
          removes = removes, baseVersion = Some(v),
          stats = Snapshots.computeStats(spark, dir, parts, statCols,
            withRowCounts = statCols.nonEmpty),
          addLens = Snapshots.lensOf(partsSt))
        done = true
      } catch {
        case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
          attempts += 1 // re-resolve; the orphan dir is vacuum food
      }
    }
  }
}

/** INSERT INTO = one transactional append commit ([[Snapshots
  * .commitAppend]] — add-only, so racing writers both land); INSERT
  * OVERWRITE = one swap commit (new files in, current live set + dvs +
  * bloom sidecars out) under optimistic concurrency with re-resolve
  * retries; `df.writeTo(t).overwrite(cond)` / static-partition
  * overwrite = the PREDICATE overwrite ([[Snapshots.replaceWhere]] —
  * the Delta replaceWhere shape: exactly the matching rows swap for the
  * new data in one commit, zone maps prune the candidate files, data
  * leaking outside the predicate refuses). Columns resolve positionally
  * against the table schema (the SQL INSERT contract); the recorded
  * schema stays authoritative. */
final class GraftWriteBuilder(table: GraftTable)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {
  private var overwrite = false
  private var replaceFilters: Option[Array[Filter]] = None

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // AlwaysTrue (or empty) is the full INSERT OVERWRITE swap
    val meaningful = filters.filterNot(
      _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (meaningful.isEmpty) overwrite = true
    else replaceFilters = Some(meaningful)
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.Dataset[Row],
                            ovr: Boolean): Unit = {
          table.refuseMvWrite("INSERT into")
          val spark = data.sparkSession
          val cols = table.schema.fieldNames.toIndexedSeq
          val df = data.toDF(cols: _*) // positional, the INSERT contract
          val idFields = table.schema.fields.filter(
            org.apache.spark.sql.catalyst.util.IdentityColumn.isIdentityColumn)
          replaceFilters match {
            case Some(_) if idFields.nonEmpty =>
              throw new UnsupportedOperationException(
                "replaceWhere on an IDENTITY table is ambiguous (the " +
                  "replacement rows would need fresh ids minted mid-swap); " +
                  "DELETE the band then INSERT, or MERGE by key instead")
            case Some(fs) =>
              // predicate overwrite: every filter must translate EXACTLY
              // (replacing too little or too much is data corruption)
              val conds = fs.map(f => GraftScan.toColumn(f).getOrElse(
                throw new UnsupportedOperationException(
                  s"replaceWhere filter $f has no exact translation; " +
                    "rewrite the predicate or use MERGE")))
              val cond = conds.reduce(_ && _)
              val gen = GraftWriteBuilder.applyGenerated(table, df)
              GraftDmlRetry.retry {
                Snapshots.replaceWhere(spark, table.path, cond, gen,
                  prune = GraftWriteBuilder.filterBound(fs))
              }
            case None if idFields.nonEmpty =>
              GraftWriteBuilder.insertWithIdentity(spark, table, df,
                idFields.toSeq, overwrite || ovr)
            case None =>
              val gen = GraftWriteBuilder.applyGenerated(table, df)
              if (!(overwrite || ovr)) {
                val (clustered, statCols) =
                  graft.io.Clustering.forWrite(spark, table.path, gen)
                Snapshots.commitAppend(clustered, table.path,
                  statsCols = statCols, recordRowCounts = statCols.nonEmpty)
              } else GraftTable.overwrite(spark, table.path, gen)
          }
        }
      }
  }
}

/** IDENTITY assignment — engine-side, transactional, gap-tolerant (the
  * SQL-standard contract is uniqueness + direction, not density):
  *
  *  - values generate as `watermark + step * monotonically_increasing_id()`
  *    inside the SAME plan that writes the files — one pass, no
  *    double-compute of the producing query;
  *  - the high watermark (`graft.identity.<col>.next`) advances in the
  *    SAME commit as the data against the version the assignment read —
  *    a RACING identity insert throws [[Snapshots.ConcurrentCommitException]]
  *    and re-derives with fresh values, so two writers can never mint the
  *    same id (the lost attempt's files are vacuum food);
  *  - the watermark re-reads from the WRITTEN files (column-pruned
  *    max/min), so explicit `BY DEFAULT` values push it past themselves;
  *  - `GENERATED ALWAYS` refuses explicit values per row via a zero-pass
  *    in-plan guard (`raise_error`), `BY DEFAULT` fills only NULLs. */
object GraftWriteBuilder {
  private def nextProp(col: String) = s"graft.identity.$col.next"

  /** A SOUND zone-map bound implied by v1 overwrite filters: per-column
    * closed bounds from equality / one-sided comparisons on stat-encodable
    * literals (the [[GraftDmlRule.pruneBound]] rule over the v1 shape);
    * the first column with both sides wins. */
  private[sql] def filterBound(fs: Array[Filter]): Option[(String, String, String)] = {
    import org.apache.spark.sql.sources._
    def enc(v: Any): Option[String] = v match {
      case null => None
      case _: Int | _: Long | _: Short | _: Byte | _: Double | _: Float |
           _: String => Some(v.toString)
      case _ => None
    }
    val lo = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val hi = scala.collection.mutable.LinkedHashMap.empty[String, String]
    fs.foreach {
      case EqualTo(c, v) => enc(v).foreach { s => lo(c) = s; hi(c) = s }
      case GreaterThan(c, v)        => enc(v).foreach(lo(c) = _)
      case GreaterThanOrEqual(c, v) => enc(v).foreach(lo(c) = _)
      case LessThan(c, v)           => enc(v).foreach(hi(c) = _)
      case LessThanOrEqual(c, v)    => enc(v).foreach(hi(c) = _)
      case _ =>
    }
    lo.keys.find(hi.contains).map(c => (c, lo(c), hi(c)))
  }

  /** GENERATED ALWAYS AS (expr) computation — in-plan, zero extra
    * passes: omitted (NULL) values compute from the row's other columns;
    * an explicit value must MATCH the expression or the write fails per
    * row (`raise_error`, the Delta validation shape). Expressions may
    * reference only non-generated columns (enforced by Spark at CREATE). */
  private[sql] def applyGenerated(table: GraftTable,
                                  df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.util.GeneratedColumn
    table.schema.fields.foldLeft(df) { (d, f) =>
      GeneratedColumn.getGenerationExpression(f) match {
        case None => d
        case Some(ge) =>
          val e = expr(ge).cast(f.dataType)
          d.withColumn(f.name,
            when(col(f.name).isNotNull && !(col(f.name) <=> e),
              raise_error(lit(s"GENERATED column '${f.name}' value does " +
                s"not match its expression ($ge)")).cast(f.dataType))
              .otherwise(coalesce(col(f.name), e)))
      }
    }
  }

  private[sql] def insertWithIdentity(spark: SparkSession, table: GraftTable,
                                      df: org.apache.spark.sql.DataFrame,
                                      idFields: Seq[org.apache.spark.sql.types.StructField],
                                      ovr: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.util.IdentityColumn
    val path = table.path
    var attempts = 0
    var done = false
    while (!done) {
      val v = Snapshots.currentVersion(spark, path)
      val props = Snapshots.tableProperties(spark, path, Some(v))
      val specs = idFields.map(f => f -> IdentityColumn.getIdentityInfo(f).get)
      val filled0 = specs.foldLeft(df) { case (d, (f, is)) =>
        val next = props.get(nextProp(f.name)).map(_.toLong).getOrElse(is.getStart)
        val gen = (lit(next) + lit(is.getStep) * monotonically_increasing_id())
          .cast(f.dataType)
        val e =
          if (is.isAllowExplicitInsert) coalesce(col(f.name), gen)
          else when(col(f.name).isNotNull, raise_error(lit(
            s"GENERATED ALWAYS AS IDENTITY column '${f.name}' cannot be " +
              "assigned an explicit value")).cast(f.dataType)).otherwise(gen)
        d.withColumn(f.name, e)
      }
      // generated columns compute AFTER identity fill (they may reference
      // the freshly minted ids)
      val filled = applyGenerated(table, filled0)
      val (clustered, statCols) = graft.io.Clustering.forWrite(spark, path, filled)
      val dir = s"$path/data/${java.util.UUID.randomUUID()}"
      // the identity WATERMARK aggregates and the CHECK constraints both
      // ride the write as observed metrics (the written change was
      // previously re-read twice: once for the watermark agg, once for
      // validation); min/max are idempotent under task retries and the
      // gates still precede the commit
      val wmAggs = specs.map { case (f, is) =>
        (if (is.getStep >= 0) max(col(f.name)) else min(col(f.name)))
          .as(s"__wm_${f.name}")
      }
      val (inst, check) = graft.io.Constraints.observed(
        spark, path, clustered, "inserted", extraAggs = wmAggs)
      Snapshots.writeData(inst, dir)
      val observedRow = check()
      val p = new Path(dir)
      val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val partsSt = Snapshots.listParts(fsys, dir)
      val parts = partsSt.map(_.getPath.toString)
      if (parts.isEmpty) {
        // nothing minted — but an OVERWRITE of an empty source must
        // still truncate, exactly like the non-identity path
        if (!ovr) return
        try {
          Snapshots.commit(spark, path, adds = Nil,
            removes = Snapshots.liveFiles(spark, path, Some(v)) ++
              Snapshots.liveDvFiles(spark, path, Some(v)) ++
              Snapshots.liveBloomFiles(spark, path, Some(v)),
            baseVersion = Some(v))
          return
        } catch {
          case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
            attempts += 1
        }
      } else {
        // watermark from the OBSERVED write metrics (no re-read)
        val propUps = specs.collect {
          case (f, is) if observedRow.get(s"__wm_${f.name}").exists(_ != null) =>
            // MONOTONIC watermark: a GENERATED BY DEFAULT insert of
            // explicit ids BELOW the current watermark (a backfill) must
            // never move it backwards, or later inserts would re-mint
            // already-issued ids — the one invariant identity promises
            val cur = props.get(nextProp(f.name)).map(_.toLong)
              .getOrElse(is.getStart)
            val written = observedRow(s"__wm_${f.name}")
              .asInstanceOf[Number].longValue + is.getStep
            val mono =
              if (is.getStep >= 0) math.max(cur, written)
              else math.min(cur, written)
            nextProp(f.name) -> Some(mono.toString)
        }
        val removes =
          if (!ovr) Nil
          else Snapshots.liveFiles(spark, path, Some(v)) ++
            Snapshots.liveDvFiles(spark, path, Some(v)) ++
            Snapshots.liveBloomFiles(spark, path, Some(v))
        try {
          Snapshots.commit(spark, path, adds = parts, removes = removes,
            baseVersion = Some(v), props = propUps,
            stats = Snapshots.computeStats(spark, dir, parts, statCols,
              withRowCounts = statCols.nonEmpty),
            addLens = Snapshots.lensOf(partsSt))
          done = true
        } catch {
          // a racing writer may have minted the same ids: re-derive against
          // the fresh watermark (the lost attempt's dir is vacuum food)
          case _: Snapshots.ConcurrentCommitException if attempts < 20 =>
            attempts += 1
        }
      }
    }
  }
}

/** Last-scan observability for specs and EXPLAIN-side auditing: how many
  * live files the manifest metadata kept vs pruned for the most recent
  * catalog scan build. Debug surface only — never read on a query path.
  *
  * THREAD-LOCAL first, volatile global as fallback: a scan records into
  * both, a reader prefers its own thread's record — so concurrent SQL
  * sessions don't clobber each other's observations, while the
  * write-on-one-thread / read-on-another case (rare: V1 buildScan runs
  * on the collecting thread) still resolves through the global. */
object GraftScanInfo {
  final case class Info(table: String, version: Long,
                        candidates: Int, total: Int, pushed: Seq[String])
  private val tl = new ThreadLocal[Option[Info]] {
    override def initialValue(): Option[Info] = None
  }
  @volatile private var global: Option[Info] = None
  def last: Option[Info] = tl.get().orElse(global)
  def last_=(v: Option[Info]): Unit = { tl.set(v); global = v }
}

final class GraftScanBuilder(table: GraftTable)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var required: StructType = table.schema
  private var pushed: Array[Filter] = Array.empty
  private var countOnly = false
  private var aggPush: Option[Seq[GraftAggScan.Agg]] = None
  private var limit: Option[Int] = None

  /** Accept every filter for PRUNING, return every filter for
    * RE-EVALUATION: manifest pruning is conservative (zone maps and
    * blooms keep false positives), so Spark must keep the exact
    * predicate above the scan. The wrapped DataFrame applies the
    * convertible ones again anyway, pushing them into the parquet
    * row-group reader. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftScan.prunes)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Unfiltered, ungrouped COUNT(*) answers from manifest metadata
    * ([[Snapshots.fastCount]]) — at 100 TB a row-counted table's
    * COUNT(*) is one manifest replay, zero data files opened. Spark only
    * offers aggregate pushdown when no post-scan filters remain, and we
    * return every filter for re-evaluation, so this path is exactly the
    * bare-count query. Anything else declines and plans normally. */
  private def bareCount(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    !table.isMaterializedView && pushed.isEmpty && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  /** Unfiltered, ungrouped MIN/MAX/COUNT answered ENTIRELY from zone-map
    * metadata: the per-file min/max the manifest already records fold to
    * the table extremes when (and only when) every live file carries the
    * stat, no deletion vector is live (a tombstone could remove the
    * extreme row), and the column's type reconstructs exactly from the
    * stat string encoding. `SELECT min(ts), max(ts) FROM t` — the first
    * query every time-series user runs — then opens ZERO data files at
    * any table size. Anything not provably exact declines and plans
    * normally; pruning may be conservative, aggregates may not. */
  // memoized per ScanBuilder: Spark invokes supportCompletePushDown then
  // pushAggregation with the same Aggregation instance, and the manifest
  // replay inside (liveFiles + fileStats + liveDvFiles) is the expensive
  // part — compute once, reuse in both callbacks
  private var minMaxMemo: Option[(AnyRef, Option[Seq[GraftAggScan.Agg]])] = None

  private def minMaxPush(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[GraftAggScan.Agg]] = minMaxMemo match {
    case Some((k, v)) if k eq agg => v
    case _ =>
      val v = minMaxPushCompute(agg)
      minMaxMemo = Some((agg, v))
      v
  }

  private def minMaxPushCompute(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[GraftAggScan.Agg]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (table.isMaterializedView || pushed.nonEmpty ||
        agg.groupByExpressions().nonEmpty) return None
    def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          Some(nr.fieldNames().head)
        case _ => None
      }
    val parsed = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(GraftAggScan.CountAll)
      case m: Min       => ref(m.column).map(GraftAggScan.MinCol)
      case m: Max       => ref(m.column).map(GraftAggScan.MaxCol)
      case _            => None
    }
    if (parsed.exists(_.isEmpty)) return None
    val aggs = parsed.flatten
    val cols = aggs.collect {
      case GraftAggScan.MinCol(c) => c
      case GraftAggScan.MaxCol(c) => c
    }.distinct
    if (cols.isEmpty) return Some(aggs) // counts only: fastCount is exact always
    val spark = SparkSession.active
    val v = table.pinnedVersion
    if (!cols.forall(c => table.schema.fieldNames.contains(c) &&
        GraftAggScan.reconstructs(table.schema(c).dataType))) return None
    if (Snapshots.liveDvFiles(spark, table.path, Some(v)).nonEmpty) return None
    val live = Snapshots.liveFiles(spark, table.path, Some(v))
    val stats = Snapshots.fileStats(spark, table.path, Some(v))
    val covered = cols.forall { c =>
      val have = stats.filter(_.column == c).map(_.path).toSet
      live.forall(have)
    }
    if (covered) Some(aggs) else None
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    bareCount(agg) || minMaxPush(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (bareCount(agg)) { countOnly = true; true }
    else minMaxPush(agg) match {
      case Some(aggs) => aggPush = Some(aggs); true
      case None       => false
    }
  }

  /** LIMIT folds into the wrapped scan (fewer rows cross the V1 row
    * boundary); Spark re-applies it above regardless (partial push). */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** ORDER BY + LIMIT folds as a top-k into the wrapped scan: the inner
    * DataFrame's sort+limit compiles to Spark's TakeOrderedAndProject
    * (bounded per-task heaps), so exactly k rows cross the V1 row
    * boundary instead of the table. Partial push — Spark keeps the
    * authoritative sort above. Only simple column references fold;
    * expression sorts decline and plan normally. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
    val parsed = orders.toSeq.map { o =>
      o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 &&
            required.fieldNames.contains(nr.fieldNames().head) =>
          Some((nr.fieldNames().head,
            o.direction() == SortDirection.ASCENDING,
            o.nullOrdering() == NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (parsed.exists(_.isEmpty)) false
    else { topN = Some((parsed.flatten, n)); true }
  }

  private var topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None

  override def build(): Scan =
    if (countOnly) new GraftCountScan(table)
    else aggPush.map(new GraftAggScan(table, _))
      .getOrElse(new GraftScan(table, required, pushed, limit, topN))
}

/** Complete MIN/MAX/COUNT pushdown: one row folded from the manifest's
  * per-file zone maps ([[GraftScanBuilder.minMaxPush]] proved exactness
  * before routing here — full stat coverage, no live dvs, reconstructible
  * types). */
final class GraftAggScan(table: GraftTable, aggs: Seq[GraftAggScan.Agg])
    extends V1Scan {
  import org.apache.spark.sql.types._

  private val out = StructType(aggs.map {
    case GraftAggScan.CountAll  => StructField("count", LongType, nullable = false)
    case GraftAggScan.MinCol(c) => StructField(s"min_$c", table.schema(c).dataType)
    case GraftAggScan.MaxCol(c) => StructField(s"max_$c", table.schema(c).dataType)
  })

  override def readSchema(): StructType = out
  override def description(): String =
    s"GraftAggScan ${table.path}@v${table.pinnedVersion} " +
      s"[${aggs.mkString(", ")}] (manifest zone maps)"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = out
      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession
        val v = table.pinnedVersion
        val live = Snapshots.liveFiles(spark, table.path, Some(v)).toSet
        val stats = Snapshots.fileStats(spark, table.path, Some(v))
          .filter(st => live(st.path))
        def bound(c: String, wantMax: Boolean): Any = {
          val sts = stats.filter(_.column == c)
          if (sts.isEmpty) null // empty table: SQL min/max of no rows
          else {
            val best = sts.reduce { (a, b) =>
              val cmp = Snapshots.statCompare(a.dtype,
                if (wantMax) a.max else a.min,
                if (wantMax) b.max else b.min).getOrElse(
                throw new IllegalStateException(
                  s"unorderable dtype ${a.dtype} passed minMaxPush for $c"))
              if ((wantMax && cmp >= 0) || (!wantMax && cmp <= 0)) a else b
            }
            GraftAggScan.parse(table.schema(c).dataType,
              if (wantMax) best.max else best.min)
          }
        }
        val row = Row.fromSeq(aggs.map {
          case GraftAggScan.CountAll =>
            Snapshots.fastCount(spark, table.path, Some(v))
          case GraftAggScan.MinCol(c) => bound(c, wantMax = false)
          case GraftAggScan.MaxCol(c) => bound(c, wantMax = true)
        })
        GraftScanInfo.last = Some(GraftScanInfo.Info(
          table.path, v, 0, live.size, Seq(s"AGG -> zone maps [${aggs.mkString(",")}]")))
        spark.sparkContext.parallelize(Seq(row), 1)
      }
    }.asInstanceOf[T]
}

object GraftAggScan {
  sealed trait Agg
  case object CountAll extends Agg
  final case class MinCol(c: String) extends Agg
  final case class MaxCol(c: String) extends Agg

  import org.apache.spark.sql.types._

  /** Types whose stat string (`cast(x AS STRING)`) round-trips EXACTLY
    * back to the value. Temporal/decimal types stay on the normal path —
    * their renderings are zone/precision-lossy to reparse safely. */
  def reconstructs(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | StringType => true
    case _ => false
  }

  def parse(dt: DataType, s: String): Any = dt match {
    case LongType    => s.toLong
    case IntegerType => s.toInt
    case ShortType   => s.toShort
    case ByteType    => s.toByte
    case DoubleType  => s.toDouble
    case FloatType   => s.toFloat
    case StringType  => s
    case other => throw new IllegalStateException(s"unreconstructible $other")
  }
}

/** Complete COUNT(*) pushdown: one row from [[Snapshots.fastCount]] —
  * metadata-only when commits recorded row counts, exact always (live
  * deletion vectors defer to the dv-resolved read inside fastCount). */
final class GraftCountScan(table: GraftTable) extends V1Scan {
  private val out = StructType(Seq(
    org.apache.spark.sql.types.StructField("count",
      org.apache.spark.sql.types.LongType, nullable = false)))

  override def readSchema(): StructType = out
  override def description(): String =
    s"GraftCountScan ${table.path}@v${table.pinnedVersion} (manifest fastCount)"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = out
      override def buildScan(): RDD[Row] = {
        val spark = context.sparkSession
        val n = Snapshots.fastCount(spark, table.path, Some(table.pinnedVersion))
        GraftScanInfo.last = Some(GraftScanInfo.Info(
          table.path, table.pinnedVersion, 0,
          Snapshots.liveFiles(spark, table.path, Some(table.pinnedVersion)).size,
          Seq("COUNT(*) -> fastCount")))
        spark.sparkContext.parallelize(Seq(Row(n)), 1)
      }
    }.asInstanceOf[T]
}

final class GraftScan(table: GraftTable, required: StructType,
                      filters: Array[Filter],
                      limit: Option[Int] = None,
                      topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None)
    extends V1Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Manifest-derived plan statistics — the missing half of pushdown.
    * Without this every DSv2 relation reports `defaultSizeInBytes`
    * (≈`Long.MaxValue`), so a 2 MB dim table joined to a 100 TB fact
    * table NEVER auto-broadcasts and Spark plans a full shuffle join.
    * Bytes sum the `__bytes` stats [[graft.io.Snapshots.commit]] records
    * per added file (the Iceberg `file_size_in_bytes` contract), rows sum
    * `__rows` where recorded — both over the ZONE-MAP-SURVIVING candidate
    * set, so a pushed `WHERE` shrinks the estimate exactly as far as it
    * shrinks the scan. Metadata-only (one manifest replay, no data files
    * opened), computed once per scan instance. Live deletion vectors make
    * the row sum an upper bound — safe for planning, which only ever
    * OVER-estimates from it. */
  private lazy val v2Stats: org.apache.spark.sql.connector.read.Statistics = {
    import java.util.OptionalLong
    val spark = SparkSession.active
    val v = table.pinnedVersion
    val live = Snapshots.liveFiles(spark, table.path, Some(v))
    val all = Snapshots.fileStats(spark, table.path, Some(v))
    val pruneBy = GraftScan.encodeTemporal(filters,
      java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
    // above the distribute threshold the per-file verdict loop would be
    // the planning-time cost the scan itself already refuses to pay on
    // the driver — estimate from the unpruned live set instead (an
    // over-estimate can only make planning more conservative)
    val threshold = spark.conf
      .getOption("spark.graft.scan.statsDistributeThreshold")
      .map(_.toInt).getOrElse(20000)
    val candidates =
      if (filters.isEmpty || live.size >= threshold) live
      else {
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        val byFile = all.filterNot(st => Snapshots.reservedStat(st.column))
          .filter(st => Snapshots.statZoneOk(st.dtype, zone))
          .groupBy(_.path).map { case (p, xs) => p -> xs.map(st => st.column -> st).toMap }
        live.filter { p =>
          val st = byFile.getOrElse(p, Map.empty[String, Snapshots.FileStat])
          pruneBy.forall(GraftScan.mayMatch(st, _))
        }
      }
    val bytesByFile = all.filter(_.column == Snapshots.BytesStat)
      .map(st => st.path -> st.min.toLong).toMap
    val rowsByFile = all.filter(_.column == Snapshots.RowsStat)
      .map(st => st.path -> st.min.toLong).toMap
    val knownBytes = candidates.flatMap(bytesByFile.get)
    val byteEst =
      if (knownBytes.isEmpty) OptionalLong.empty()
      else if (knownBytes.size == candidates.size) OptionalLong.of(knownBytes.sum)
      else // legacy files predating __bytes: scale the known mean (estimate)
        OptionalLong.of(knownBytes.sum / knownBytes.size * candidates.size)
    val rows = candidates.flatMap(rowsByFile.get)
    val rowEst =
      if (rows.size == candidates.size && candidates.nonEmpty) OptionalLong.of(rows.sum)
      else OptionalLong.empty()
    // recorded column stats (CALL analyze — [[graft.io.ColStats]]) ride
    // into the optimizer: with spark.sql.cbo.enabled the join reorder
    // sees real NDVs instead of guessing. Read at the PINNED version so
    // stats time-travel with the data they describe.
    val colStats: java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      // equi-height histograms (ANALYZE … histogram_bins) ride along:
      // under CBO, FilterEstimation prices skewed predicates from the
      // real value distribution instead of NDV-uniform — the difference
      // between broadcasting a rare-band probe and shuffle-joining it
      val hists = graft.io.ColStats.histOf(spark, table.path, Some(v))
      // true min/max recorded by ANALYZE, falling back to the histogram's
      // outer boundaries; boxed to the column's own type
      // (FilterEstimation's range check needs them typed, and with NDV
      // but NO range it prices every literal as out-of-range = 0 rows)
      val ranges = graft.io.ColStats.rangeOf(spark, table.path, Some(v))
      def typedVal(d: Double, c: String): Option[Object] =
        table.schema.fields.find(_.name == c).map(_.dataType).flatMap {
          case org.apache.spark.sql.types.LongType =>
            Some(java.lang.Long.valueOf(d.toLong))
          case org.apache.spark.sql.types.IntegerType =>
            Some(java.lang.Integer.valueOf(d.toInt))
          case org.apache.spark.sql.types.ShortType =>
            Some(java.lang.Short.valueOf(d.toShort))
          case org.apache.spark.sql.types.ByteType =>
            Some(java.lang.Byte.valueOf(d.toByte))
          case org.apache.spark.sql.types.DoubleType =>
            Some(java.lang.Double.valueOf(d))
          case org.apache.spark.sql.types.FloatType =>
            Some(java.lang.Float.valueOf(d.toFloat))
          // temporals box to their CATALYST-INTERNAL numeric — what
          // transformV2Stats forwards verbatim into ColumnStat min/max
          // and FilterEstimation prices (days / micros since epoch)
          case org.apache.spark.sql.types.DateType =>
            Some(java.lang.Integer.valueOf(d.toInt))
          case org.apache.spark.sql.types.TimestampType =>
            Some(java.lang.Long.valueOf(d.toLong))
          case _ => None
        }
      graft.io.ColStats.of(spark, table.path, Some(v)).foreach {
        case (c, (ndv, nulls, avgL, maxL)) =>
          val minMax: Option[(Object, Object)] = ranges.get(c)
            .orElse(hists.get(c).collect {
              case (_, bs) if bs.nonEmpty => (bs.head._1, bs.last._2)
            })
            .flatMap { case (lo, hi) =>
              typedVal(lo, c).zip(typedVal(hi, c)).headOption
            }
          val hist: java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            hists.get(c) match {
              case Some((h, bs)) if bs.nonEmpty => java.util.Optional.of(
                new org.apache.spark.sql.connector.read.colstats.Histogram {
                  override def height(): Double = h
                  override def bins(): Array[
                      org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                    bs.map { case (binLo, binHi, binNdv) =>
                      new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                        override def lo(): Double = binLo
                        override def hi(): Double = binHi
                        override def ndv(): Long = binNdv
                      }
                    }.toArray
                })
              case _ => java.util.Optional.empty()
            }
          m.put(org.apache.spark.sql.connector.expressions.Expressions.column(c),
            new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
              override def distinctCount(): OptionalLong = OptionalLong.of(ndv)
              override def nullCount(): OptionalLong = OptionalLong.of(nulls)
              override def avgLen(): OptionalLong = OptionalLong.of(avgL)
              override def maxLen(): OptionalLong = OptionalLong.of(maxL)
              override def min(): java.util.Optional[Object] =
                minMax.map(mm => java.util.Optional.of(mm._1))
                  .getOrElse(java.util.Optional.empty())
              override def max(): java.util.Optional[Object] =
                minMax.map(mm => java.util.Optional.of(mm._2))
                  .getOrElse(java.util.Optional.empty())
              override def histogram(): java.util.Optional[
                  org.apache.spark.sql.connector.read.colstats.Histogram] = hist
            })
      }
      m
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): OptionalLong = byteEst
      override def numRows(): OptionalLong = rowEst
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    v2Stats

  override def description(): String =
    s"GraftScan ${table.path}@v${table.pinnedVersion} " +
      s"cols=[${required.fieldNames.mkString(",")}] " +
      s"pruneBy=[${filters.mkString(", ")}]" +
      limit.map(n => s" limit=$n").getOrElse("") +
      topN.map { case (o, n) =>
        s" topN=$n by ${o.map(_._1).mkString(",")}" }.getOrElse("")

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftRelation(context, table, required, filters, limit, topN)
      .asInstanceOf[T]
}

object GraftScan {
  /** Filters the manifest metadata can act on (everything else passes
    * through untouched — Spark re-evaluates it above the scan). Temporal
    * literals count: [[encodeTemporal]] canonicalizes them driver-side
    * before any verdict runs. */
  def prunes(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => encodable(v)
    case In(_, vs)                => vs.forall(v => v == null || encodable(v))
    case GreaterThan(_, v)        => encodable(v)
    case GreaterThanOrEqual(_, v) => encodable(v)
    case LessThan(_, v)           => encodable(v)
    case LessThanOrEqual(_, v)    => encodable(v)
    case StringStartsWith(_, _)   => true
    case And(l, r)                => prunes(l) || prunes(r)
    case Or(l, r)                 => prunes(l) && prunes(r)
    case _                        => false
  }

  private def encodable(v: Any): Boolean = enc(v).isDefined || temporal(v)

  private def temporal(v: Any): Boolean = v match {
    case _: java.sql.Timestamp | _: java.time.Instant |
         _: java.sql.Date | _: java.time.LocalDate => true
    case _ => false
  }

  /** Driver-side canonicalization of temporal filter literals into the
    * zone-map stat encoding — the exact string `cast(ts AS STRING)`
    * renders under the session time zone ("uuuu-MM-dd HH:mm:ss" with the
    * microsecond fraction trimmed of trailing zeros, omitted when zero),
    * so the pruning comparison is string-vs-string in one format. The
    * rendering is CHRONOLOGICALLY LEXICOGRAPHIC (fixed-width zero-padded
    * fields; a fraction only extends an otherwise-equal prefix), so the
    * generic lexicographic statCompare stays order-correct. Runs ON THE
    * DRIVER before any verdict path — the distributed executor-side
    * verdicts then see plain strings and never need a SparkSession.
    * Write/read zone divergence is handled at the verdict sites: stats
    * are zone-stamped (`timestamp@<zone>`, [[Snapshots.statZoneOk]]) and
    * a stat whose write zone differs from this session's is dropped
    * before any comparison — conservatively scanned, never falsely
    * pruned. */
  def encodeTemporal(filters: Array[Filter], zone: java.time.ZoneId): Array[Filter] = {
    def ts(i: java.time.Instant): String = {
      val ldt = java.time.LocalDateTime.ofInstant(i, zone)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
        f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      val micros = ldt.getNano / 1000
      if (micros == 0) base
      else base + "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse
    }
    def e(v: Any): Any = v match {
      case t: java.sql.Timestamp  => ts(t.toInstant)
      case i: java.time.Instant   => ts(i)
      case d: java.sql.Date       => d.toString
      case d: java.time.LocalDate => d.toString
      case x                      => x
    }
    def walk(f: Filter): Filter = f match {
      case EqualTo(a, v)            => EqualTo(a, e(v))
      case In(a, vs)                => In(a, vs.map(e))
      case GreaterThan(a, v)        => GreaterThan(a, e(v))
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(a, e(v))
      case LessThan(a, v)           => LessThan(a, e(v))
      case LessThanOrEqual(a, v)    => LessThanOrEqual(a, e(v))
      case And(l, r)                => And(walk(l), walk(r))
      case Or(l, r)                 => Or(walk(l), walk(r))
      case x                        => x
    }
    filters.map(walk)
  }

  /** v1 Filter → Column (None = inexpressible; callers treat that as
    * not-translatable and keep the filter above the scan / refuse the
    * delete). Shared by the scan's row-group re-push and SQL DELETE. */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case StringEndsWith(a, p)     => Some(col(a).endsWith(p))
    case StringContains(a, p)     => Some(col(a).contains(p))
    case AlwaysTrue()             => Some(lit(true))
    case AlwaysFalse()            => Some(lit(false))
    case And(l, r)                => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r)                 => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c)                   => toColumn(c).map(!_)
    case _                        => None
  }

  /** Stat-encoding of a literal — must match how [[Snapshots]] records
    * zone maps (`cast("string")`) for the comparison to mean anything.
    * Types whose Java toString diverges from Spark's cast rendering
    * (timestamps, dates) are left un-encoded: conservative, never wrong. */
  def enc(v: Any): Option[String] = v match {
    case null                     => None
    case _: Long | _: Int | _: Short | _: Byte => Some(v.toString)
    case _: Double | _: Float     => Some(v.toString)
    case s: String                => Some(s)
    case d: java.math.BigDecimal  => Some(d.toString)
    case d: BigDecimal            => Some(d.toString)
    case _                        => None
  }

  private def intersects(st: Snapshots.FileStat, lo: String, hi: String): Boolean =
    (Snapshots.statCompare(st.dtype, st.min, hi),
      Snapshots.statCompare(st.dtype, st.max, lo)) match {
      case (Some(minVsHi), Some(maxVsLo)) => !(minVsHi > 0 || maxVsLo < 0)
      case _                              => true
    }

  /** Can a file with these zone maps hold a row matching `f`? Missing
    * stats and un-encodable literals are conservatively true. Static and
    * closure-clean on purpose: the distributed verdict path evaluates
    * this per file ON EXECUTORS ([[GraftRelation.buildScan]]). */
  def mayMatch(stats: Map[String, Snapshots.FileStat], f: Filter): Boolean = {
    def cmpToMax(a: String, v: Any): Option[Int] = for {
      st <- stats.get(a); e <- GraftScan.enc(v)
      c <- Snapshots.statCompare(st.dtype, st.max, e)
    } yield c
    def cmpToMin(a: String, v: Any): Option[Int] = for {
      st <- stats.get(a); e <- GraftScan.enc(v)
      c <- Snapshots.statCompare(st.dtype, st.min, e)
    } yield c
    f match {
      case EqualTo(a, v) =>
        (stats.get(a), GraftScan.enc(v)) match {
          case (Some(st), Some(e)) => intersects(st, e, e)
          case _                   => true
        }
      case In(a, vs) =>
        val es = vs.toSeq.filter(_ != null).flatMap(GraftScan.enc(_))
        if (es.size != vs.count(_ != null)) true
        else stats.get(a) match {
          case Some(st) => es.exists(e => intersects(st, e, e))
          case None     => true
        }
      case GreaterThan(a, v)        => cmpToMax(a, v).forall(_ > 0)
      case GreaterThanOrEqual(a, v) => cmpToMax(a, v).forall(_ >= 0)
      case LessThan(a, v)           => cmpToMin(a, v).forall(_ < 0)
      case LessThanOrEqual(a, v)    => cmpToMin(a, v).forall(_ <= 0)
      // exact prefix bound: a file may hold a p-prefixed row iff its max
      // reaches p AND its min's own p-length prefix does not sort above p.
      // (The tempting `st.min <= p + '\uffff'` bound falsely prunes a file
      // whose min itself starts with p but contains U+FFFF right after
      // the prefix — pruning must never have false negatives.)
      case StringStartsWith(a, p) =>
        stats.get(a).forall(st => st.dtype != "string" ||
          (st.max >= p && st.min.take(p.length) <= p))
      case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
      case Or(l, r)  => mayMatch(stats, l) || mayMatch(stats, r)
      case _         => true
    }
  }
}

/** The V1 fallback relation: builds the pruned, dv-resolved DataFrame and
  * hands Spark its RDD (rows convert at the boundary; the scan below it
  * is Spark's own vectorized parquet reader over the kept files only). */
final class GraftRelation(ctx: SQLContext, table: GraftTable,
                          required: StructType, filters: Array[Filter],
                          limit: Option[Int] = None,
                          topN: Option[(Seq[(String, Boolean, Boolean)], Int)] = None)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = required
  override def toString: String =
    s"GraftRelation(${table.path}@v${table.pinnedVersion})"

  override def buildScan(): RDD[Row] = {
    val spark = ctx.sparkSession
    val v = table.pinnedVersion
    val live = Snapshots.liveFiles(spark, table.path, Some(v))
    // temporal literals canonicalize to the stat encoding ONCE, on the
    // driver (the distributed verdict path must stay session-free)
    val pruneBy = GraftScan.encodeTemporal(filters,
      java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
    // zone-map verdict per file: every filter must be satisfiable by the
    // file's recorded [min,max]; files without a stat stay candidates.
    // Two evaluation paths, same verdicts:
    //  - DRIVER (default below the threshold): replay stats, loop. Fine
    //    to tens of thousands of files; O(files × stats × filters).
    //  - DISTRIBUTED (at manifest scale): the manifests themselves are
    //    read as a Spark text job, stat lines parse and fold to verdicts
    //    per file ON EXECUTORS, and only pruned-file names return —
    //    driver work stays O(live set), flat in stats × filters
    //    (ProbeScanStats measures the crossover).
    val threshold = spark.conf
      .getOption("spark.graft.scan.statsDistributeThreshold")
      .map(_.toInt).getOrElse(20000)
    var candidates =
      if (filters.isEmpty) live
      else if (live.size < threshold) {
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        val statsByFile = Snapshots.fileStats(spark, table.path, Some(v))
          .filter(st => Snapshots.statZoneOk(st.dtype, zone))
          .groupBy(_.path).map { case (p, xs) => p -> xs.map(st => st.column -> st).toMap }
        live.filter { p =>
          val stats = statsByFile.getOrElse(p, Map.empty)
          pruneBy.forall(GraftScan.mayMatch(stats, _))
        }
      } else {
        import spark.implicits._
        val fs = pruneBy // closure-clean copy (v1 Filters are serializable)
        val zone = spark.sessionState.conf.sessionLocalTimeZone
        // physical→logical stat-name translation across metadata-only
        // renames (same rule as the driver path's Snapshots.fileStats)
        val phys2log = Snapshots.columnMapping(spark, table.path, Some(v))
          .collect { case (l, p) if l != p => p -> l }
        val liveSet = spark.sparkContext.broadcast(live.toSet)
        val sources = Snapshots.statSourceManifests(spark, table.path, Some(v))
        // stats are immutable per (path, column): any duplicate wins, so
        // the executor-side fold needs no ordered replay
        val pruned = spark.read.textFile(sources: _*)
          .flatMap(Snapshots.parseStatLine)
          .filter(st => liveSet.value(st.path) && Snapshots.statZoneOk(st.dtype, zone))
          .map(st => phys2log.get(st.column)
            .map(l => st.copy(column = l)).getOrElse(st))
          .groupByKey(_.path)
          .mapGroups { (p, sts) =>
            val m = sts.map(st => st.column -> st).toMap
            (p, fs.forall(GraftScan.mayMatch(m, _)))
          }
          .filter(!_._2).map(_._1).collect().toSet // O(pruned) to the driver
        live.filterNot(pruned)
      }
    // bloom sidecar probes for top-level point predicates (EqualTo / In)
    val bloomCols = {
      val sidecars = Snapshots.liveBloomFiles(spark, table.path, Some(v))
      if (sidecars.isEmpty) Set.empty[String]
      else spark.read.parquet(sidecars: _*).select("column")
        .distinct().collect().map(_.getString(0)).toSet
    }
    pruneBy.foreach {
      case EqualTo(a, value) if bloomCols(a) && GraftScan.enc(value).isDefined =>
        val kept = Snapshots.bloomPrune(spark, table.path, a,
          Seq(GraftScan.enc(value).get), Some(v))._1.toSet
        candidates = candidates.filter(kept)
      case In(a, vs) if bloomCols(a) && vs.nonEmpty &&
          vs.forall(x => x == null || GraftScan.enc(x).isDefined) =>
        val kept = Snapshots.bloomPrune(spark, table.path, a,
          vs.toSeq.filter(_ != null).map(x => GraftScan.enc(x).get), Some(v))._1.toSet
        candidates = candidates.filter(kept)
      case _ =>
    }
    GraftScanInfo.last = Some(GraftScanInfo.Info(
      table.path, v, candidates.size, live.size, filters.map(_.toString).toSeq))
    val base =
      if (candidates.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], table.schema)
      else Snapshots.readLiveSubset(spark, table.path, Some(v), candidates)
    // re-apply convertible predicates INSIDE the wrapped scan: parquet
    // row-group pushdown on the kept files (Spark re-applies the exact
    // predicate above the boundary regardless — pushFilters returned all).
    // A materialized view additionally filters its identity rows (emptied
    // groups stored as n_rows = 0 — never part of the view's content).
    val withMv =
      if (table.isMaterializedView) base.filter(col("n_rows") > 0) else base
    val filtered = filters.flatMap(GraftScan.toColumn).foldLeft(withMv)(_.filter(_))
    val projected = filtered.select(required.fieldNames.map(col).toIndexedSeq: _*)
    // top-k folds INSIDE the wrapped scan: sort+limit compiles to
    // TakeOrderedAndProject (bounded per-task heaps), so k rows cross the
    // V1 row boundary, not the table; Spark re-sorts above (partial push)
    topN match {
      case Some((orders, n)) =>
        val sortCols = orders.map {
          case (c, true, true)   => col(c).asc_nulls_first
          case (c, true, false)  => col(c).asc_nulls_last
          case (c, false, true)  => col(c).desc_nulls_first
          case (c, false, false) => col(c).desc_nulls_last
        }
        projected.sort(sortCols: _*).limit(n).rdd
      case None => limit.map(projected.limit).getOrElse(projected).rdd
    }
  }



}
