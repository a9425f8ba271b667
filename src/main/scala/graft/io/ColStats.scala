package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TABLE-LEVEL COLUMN STATISTICS for cost-based optimization — the
  * `ANALYZE TABLE` surface: `CALL graft.system.analyze('t', 'a,b')`
  * computes per-column NDV (HyperLogLog sketch — one aggregation pass,
  * never a distinct shuffle per column), null count, and string-image
  * length moments, and records them as transactional table properties
  * (`graft.colstat.<col>`), version-stamped like every other property:
  * they time travel, survive checkpoints, and carry through clones and
  * branches.
  *
  * The scan reports them through DSv2 `Statistics.columnStats()`, so
  * with `spark.sql.cbo.enabled` Spark's cost-based join reordering and
  * cardinality estimation see real NDVs instead of guessing — at 100 TB
  * the difference between a join tree keyed on a 12-value dimension and
  * one keyed on a unique id is the plan, and only NDV tells them apart.
  * Stats are estimates recorded AS OF the analyze version (the standard
  * engine contract — they go stale until the next ANALYZE, and planning
  * only ever degrades gracefully from stale estimates). */
object ColStats {

  val Prefix = "graft.colstat."

  /** One aggregation pass over the live table: per column NDV
    * (approx_count_distinct), null count, avg/max string-image length.
    * Records `graft.colstat.<col>` properties in one commit; returns the
    * per-column NDV map. */
  def analyze(spark: SparkSession, table: String,
              cols: Seq[String]): Map[String, Long] = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val df = Snapshots.readAt(spark, table)
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c)).as(s"__ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        ceil(coalesce(avg(length(col(c).cast("string"))), lit(0.0)))
          .cast("long").as(s"__avglen_$c"),
        coalesce(max(length(col(c).cast("string"))), lit(0))
          .cast("long").as(s"__maxlen_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val v = Snapshots.currentVersion(spark, table)
    val props = cols.zipWithIndex.map { case (c, i) =>
      val ndv = row.getLong(i * 4)
      val nulls = if (row.isNullAt(i * 4 + 1)) 0L else row.getLong(i * 4 + 1)
      // fixed-width types report their physical width, not the string-
      // image digit count (a BIGINT is 8 bytes, not "avg 7 digits") —
      // sizeInBytes-derived estimates stay honest; variable-width types
      // (strings, binaries, arrays) keep the measured image lengths
      val fixedW: Option[Long] = df.schema(c).dataType match {
        case t @ (_: org.apache.spark.sql.types.NumericType |
                  org.apache.spark.sql.types.BooleanType |
                  org.apache.spark.sql.types.DateType |
                  org.apache.spark.sql.types.TimestampType |
                  org.apache.spark.sql.types.TimestampNTZType) =>
          Some(t.defaultSize.toLong)
        case _ => None
      }
      val avgLen = fixedW.getOrElse(row.getLong(i * 4 + 2))
      val maxLen = fixedW.getOrElse(row.getLong(i * 4 + 3))
      (Prefix + c) -> Some(s"ndv=$ndv;nulls=$nulls;avglen=$avgLen;" +
        s"maxlen=$maxLen;asof=$v")
    }
    Snapshots.commit(spark, table, adds = Nil, props = props,
      notes = Seq(s"analyze:${cols.mkString(",")}"))
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i * 4) }.toMap
  }

  /** Recorded column stats at `version` (default current):
    * column → (ndv, nulls, avgLen, maxLen). */
  def of(spark: SparkSession, table: String,
         version: Option[Long] = None): Map[String, (Long, Long, Long, Long)] =
    Snapshots.tableProperties(spark, table, version).collect {
      case (k, v) if k.startsWith(Prefix) =>
        val kv = v.split(';').flatMap(_.split('=') match {
          case Array(a, b) => Some(a -> b.toLong); case _ => None
        }).toMap
        k.drop(Prefix.length) -> ((kv.getOrElse("ndv", 0L),
          kv.getOrElse("nulls", 0L), kv.getOrElse("avglen", 0L),
          kv.getOrElse("maxlen", 0L)))
    }
}
