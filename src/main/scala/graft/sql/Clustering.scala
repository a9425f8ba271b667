package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.functions.{col, date_trunc}
import org.apache.spark.sql.types.{DateType, StructType, TimestampType}

import graft.io.Snapshots

/** `PARTITIONED BY` on graft tables = MANIFEST-NATIVE WRITE CLUSTERING,
  * not directory partitioning. The spec (identity columns and the
  * temporal transforms `years/months/days/hours(ts)` — the Iceberg
  * hidden-partitioning family) is recorded as the transactional table
  * property `write.cluster.by`; every INSERT / INSERT OVERWRITE / CTAS /
  * full-sync MERGE then range-clusters its rows on the transform values
  * before writing, and stamps zone maps + row counts on the SOURCE
  * columns. Files therefore hold tight disjoint ranges, and the existing
  * scan machinery — zone-map pruning in the SQL catalog, DML candidate
  * pruning, `readPrunedRanges` — serves partition pruning with no new
  * read path and no directory layout to age badly:
  *
  * {{{
  *   CREATE TABLE graft.events (ts TIMESTAMP, src STRING, v BIGINT)
  *     PARTITIONED BY (days(ts), src)
  *   INSERT INTO graft.events SELECT ...   -- clustered + stat'd
  *   SELECT ... WHERE ts >= X AND ts < Y   -- opens only overlapping files
  * }}}
  *
  * Why this beats directories at 100 TB: pruning resolves on manifest
  * metadata (no LIST per partition), a mis-clustered table heals with
  * one OPTIMIZE instead of a rewrite into new directories, and the
  * transform is invisible to queries (predicates stay on the raw
  * column — Iceberg's core insight). `bucket(n, c)` is refused: zone
  * maps cannot serve hash-bucket pruning; the engine's answer to point
  * lookups is `CALL graft.system.bloom_index` (measured ~1.8 B/key).
  *
  * Reference analog: the year/month directory layout the reference
  * derives from filenames (`DP:229-247`) — generalized to typed,
  * transactional, multi-dimension clustering.
  */
object Clustering {

  val Prop = "write.cluster.by"

  private val Temporal = Map(
    "years" -> "YEAR", "months" -> "MONTH", "days" -> "DAY", "hours" -> "HOUR")

  /** CREATE TABLE's transforms → the property value, validated against
    * the declared schema. Throws on anything zone maps cannot serve. */
  def specOf(partitions: Array[Transform], schema: StructType): Option[String] = {
    if (partitions.isEmpty) return None
    val parts = partitions.map { t =>
      val refs = t.references()
      require(refs.length == 1 && refs.head.fieldNames().length == 1,
        s"PARTITIONED BY transform $t must reference exactly one top-level column")
      val c = refs.head.fieldNames().head
      require(schema.fieldNames.contains(c),
        s"PARTITIONED BY references unknown column '$c'")
      t.name().toLowerCase match {
        case "identity" => c
        case fn if Temporal.contains(fn) =>
          require(schema(c).dataType == TimestampType || schema(c).dataType == DateType,
            s"$fn($c) needs a timestamp/date column, got ${schema(c).dataType.simpleString}")
          s"$fn($c)"
        case "bucket" => throw new UnsupportedOperationException(
          s"bucket() is not supported — zone maps cannot prune hash buckets; " +
            s"cluster on the column itself and CALL graft.system.bloom_index " +
            s"('$c') for point lookups")
        case other => throw new UnsupportedOperationException(
          s"unsupported PARTITIONED BY transform '$other' " +
            "(identity, years, months, days, hours)")
      }
    }
    Some(parts.mkString(","))
  }

  /** The recorded spec as parsed (fn, column) pairs; identity rides as
    * fn = "". */
  def parse(spec: String): Seq[(String, String)] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map {
      case s if s.endsWith(")") =>
        val i = s.indexOf('(')
        (s.substring(0, i), s.substring(i + 1, s.length - 1))
      case c => ("", c)
    }

  /** The spec re-expressed as DSv2 transforms (Table.partitioning). */
  def transforms(spec: String): Array[Transform] =
    parse(spec).map {
      case ("", c)       => Expressions.identity(c)
      case ("years", c)  => Expressions.years(c)
      case ("months", c) => Expressions.months(c)
      case ("days", c)   => Expressions.days(c)
      case ("hours", c)  => Expressions.hours(c)
      case (fn, c) => throw new IllegalStateException(s"bad cluster spec $fn($c)")
    }.toArray

  /** Cluster `df` for a write into `path` per the table's recorded spec:
    * one range shuffle on the transform values + an in-partition sort, so
    * each output file covers a tight disjoint range of every cluster
    * dimension. Returns the clustered frame and the SOURCE columns to
    * zone-map (raw-column stats serve both range and equality pruning —
    * rows clustered by `days(ts)` have tight raw-ts ranges per file).
    * No-op (df, Nil) for unclustered tables. */
  def forWrite(spark: SparkSession, path: String, df: DataFrame): (DataFrame, Seq[String]) =
    Snapshots.tableProperties(spark, path).get(Prop) match {
      case None => (df, Nil)
      case Some(spec) =>
        val ps = parse(spec)
        val exprs: Seq[Column] = ps.map {
          case ("", c)   => col(c)
          case (fn, c)   => date_trunc(Temporal(fn), col(c))
        }
        val statCols = ps.map(_._2).distinct
        (df.repartitionByRange(exprs: _*).sortWithinPartitions(exprs: _*), statCols)
    }
}
