package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Snapshots

/** METADATA TABLES — the `table$suffix` audit surface (Iceberg's
  * `t.history` / Delta's DESCRIBE family, spelled with the `$` separator
  * so it needs no reserved namespace):
  *
  * {{{
  *   SELECT * FROM graft.`t$history`   -- one row per commit
  *   SELECT * FROM graft.`t$files`     -- the live data files, with sizes
  *   SELECT * FROM graft.`t$tags`      -- name → pinned version
  *   SELECT * FROM graft.`t$detail`    -- DESCRIBE DETAIL, one row
  *   SELECT * FROM graft.`t$stats`     -- live zone maps, one row per
  *                                     -- (file, column) — what pruning
  *                                     -- actually sees (reserved __rows/
  *                                     -- __bytes included, flagged)
  * }}}
  *
  * Everything is manifest metadata (the only data bytes touched are
  * `$detail`'s dv key files, point-delete-sized by contract), so these
  * answer instantly at any table size — the operational dashboards a
  * 100 TB table is actually managed from. Read-only, current-version by
  * definition (history IS all versions; a time-travel clause on a
  * metadata table rejects).
  */
object GraftMetaTable {
  val Kinds: Set[String] = Set("history", "files", "tags", "detail", "stats")

  def schemaFor(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("ts_millis", LongType, nullable = false),
      StructField("adds", IntegerType, nullable = false),
      StructField("removes", IntegerType, nullable = false),
      StructField("dv_adds", IntegerType, nullable = false),
      StructField("schema_stamped", BooleanType, nullable = false),
      StructField("notes", ArrayType(StringType), nullable = false)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "stats" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("column", StringType, nullable = false),
      StructField("dtype", StringType, nullable = false),
      StructField("min", StringType, nullable = false),
      StructField("max", StringType, nullable = false),
      StructField("reserved", BooleanType, nullable = false)))
    case "detail" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("small_files", IntegerType, nullable = false),
      StructField("dv_files", IntegerType, nullable = false),
      StructField("dv_keys", LongType, nullable = false),
      StructField("bloom_sidecars", IntegerType, nullable = false),
      StructField("versions_retained", IntegerType, nullable = false),
      StructField("checkpoints", IntegerType, nullable = false),
      StructField("retention_floor", LongType, nullable = false),
      StructField("schema_recorded", BooleanType, nullable = false),
      StructField("cluster_spec", StringType, nullable = true),
      StructField("unclustered_files", IntegerType, nullable = false)))
  }

  def rowsFor(spark: SparkSession, path: String, kind: String): Seq[Row] =
    kind match {
      case "history" =>
        Snapshots.history(spark, path).map(c => Row(
          c.version, c.tsMillis, c.adds, c.removes, c.dvAdds,
          c.schemaStamped, c.notes))
      case "files" =>
        // sizes from manifest __bytes stats when recorded (no per-file
        // RPC at listing time); filesystem fallback for legacy commits
        val conf = spark.sparkContext.hadoopConfiguration
        val recorded = Snapshots.fileStats(spark, path)
          .filter(_.column == Snapshots.BytesStat)
          .map(st => st.path -> st.min.toLong).toMap
        Snapshots.liveFiles(spark, path).map { p =>
          Row(p, recorded.getOrElse(p, {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(conf).getFileStatus(hp).getLen
          }))
        }
      case "tags" =>
        Snapshots.tags(spark, path).toSeq.sortBy(_._1)
          .map { case (n, v) => Row(n, v) }
      case "stats" =>
        Snapshots.fileStats(spark, path)
          .sortBy(st => (st.path, st.column))
          .map(st => Row(st.path, st.column, st.dtype, st.min, st.max,
            Snapshots.reservedStat(st.column)))
      case "detail" =>
        val d = Snapshots.detail(spark, path)
        Seq(Row(d.version, d.files, d.bytes, d.smallFiles, d.dvFiles,
          d.dvKeys, d.bloomSidecars, d.versionsRetained, d.checkpoints,
          Snapshots.retentionHorizon(spark, path), d.schemaRecorded,
          d.clusterSpec.orNull, d.unclusteredFiles))
    }
}

final class GraftMetaTable(path: String, ident: String, kind: String)
    extends Table with SupportsRead {

  override def name(): String = ident
  override def schema: StructType = GraftMetaTable.schemaFor(kind)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = GraftMetaTable.schemaFor(kind)
            override def buildScan(): RDD[Row] = {
              val spark = context.sparkSession
              spark.sparkContext.parallelize(
                GraftMetaTable.rowsFor(spark, path, kind), 1)
            }
          }.asInstanceOf[T]
      }
    }
}
