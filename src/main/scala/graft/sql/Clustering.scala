package graft.sql

import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.{DateType, StructType, TimestampType}

/** `PARTITIONED BY` on graft tables = MANIFEST-NATIVE WRITE CLUSTERING,
  * not directory partitioning. This is the DSv2-facing half (CREATE
  * TABLE transform validation, `Table.partitioning` reporting); the
  * write-side machinery every ingest path shares lives in
  * [[graft.io.Clustering]]. The spec (identity columns and the temporal
  * transforms `years/months/days/hours(ts)` — the Iceberg
  * hidden-partitioning family) is recorded as the transactional table
  * property `write.cluster.by`; writers range-cluster on the transform
  * values and zone-map the SOURCE columns, so files hold tight disjoint
  * ranges and the existing scan pruning serves partition pruning with
  * predicates on the raw column:
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

  val Prop: String = graft.io.Clustering.Prop

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
        case fn if graft.io.Clustering.temporalFns(fn) =>
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

  /** Validate a `write.cluster.by` value against the table schema — the
    * same rules CREATE's `PARTITIONED BY` enforces, applied when the
    * spec EVOLVES through `ALTER TABLE SET TBLPROPERTIES`: a typo'd
    * column or an unservable transform must refuse at the ALTER, not
    * silently stop clustering every later write. */
  def validateSpec(spec: String, schema: StructType): Unit =
    graft.io.Clustering.parse(spec).foreach {
      case ("", c) =>
        require(schema.fieldNames.contains(c),
          s"write.cluster.by references unknown column '$c'")
      case (fn, c) if graft.io.Clustering.temporalFns(fn) =>
        require(schema.fieldNames.contains(c),
          s"write.cluster.by references unknown column '$c'")
        require(schema(c).dataType == TimestampType || schema(c).dataType == DateType,
          s"$fn($c) needs a timestamp/date column, got ${schema(c).dataType.simpleString}")
      case ("bucket", c) => throw new UnsupportedOperationException(
        s"bucket() is not supported — zone maps cannot prune hash buckets; " +
          s"cluster on the column itself and CALL graft.system.bloom_index " +
          s"('$c') for point lookups")
      case (fn, c) => throw new UnsupportedOperationException(
        s"unsupported write.cluster.by transform '$fn($c)' " +
          "(identity, years, months, days, hours)")
    }

  /** The spec re-expressed as DSv2 transforms (Table.partitioning). */
  def transforms(spec: String): Array[Transform] =
    graft.io.Clustering.parse(spec).map {
      case ("", c)       => Expressions.identity(c)
      case ("years", c)  => Expressions.years(c)
      case ("months", c) => Expressions.months(c)
      case ("days", c)   => Expressions.days(c)
      case ("hours", c)  => Expressions.hours(c)
      case (fn, c) => throw new IllegalStateException(s"bad cluster spec $fn($c)")
    }.toArray
}
