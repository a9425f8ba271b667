package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, date_trunc}

/** The WRITE half of hidden partitioning — shared by every path that
  * lands rows in a snapshot table (SQL INSERT/OVERWRITE/CTAS, CoW
  * rewrites, MERGE, the streaming snapshot sink). The spec recorded in
  * the transactional `write.cluster.by` property (set by the SQL
  * catalog's `PARTITIONED BY`, see [[graft.sql.Clustering]]) names
  * identity columns and/or temporal transforms (`days(ts)` …); writers
  * range-cluster their rows on the transform values and stamp zone maps
  * + row counts on the SOURCE columns, so every file holds a tight
  * disjoint range and the ordinary zone-map pruning serves partition
  * pruning.
  *
  * Mutations preserve the layout: without this, every CoW rewrite or
  * CDC merge would smear wide ranges across fresh files and pruning
  * would silently decay until the next OPTIMIZE — the most insidious
  * 100 TB regression, because results stay correct while scans grow.
  * Output file COUNT is byte-driven (AQE coalesces the range shuffle),
  * which is exactly the production behavior — partition count never
  * depends on the transform's cardinality. */
object Clustering {

  val Prop = "write.cluster.by"

  private val Temporal = Map(
    "years" -> "YEAR", "months" -> "MONTH", "days" -> "DAY", "hours" -> "HOUR")

  def temporalFns: Set[String] = Temporal.keySet

  /** The recorded spec as (fn, column) pairs; identity rides as fn = "". */
  def parse(spec: String): Seq[(String, String)] =
    spec.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map {
      case s if s.endsWith(")") =>
        val i = s.indexOf('(')
        (s.substring(0, i), s.substring(i + 1, s.length - 1))
      case c => ("", c)
    }

  def clusterExprs(spec: String): Seq[Column] = parse(spec).map {
    case ("", c) => col(c)
    case (fn, c) => date_trunc(Temporal(fn), col(c))
  }

  /** The table's recorded cluster spec, if any. */
  def specOf(spark: SparkSession, path: String): Option[String] =
    Snapshots.tableProperties(spark, path).get(Prop)

  /** SOURCE columns the spec clusters on — the columns every write to
    * the table must zone-map for pruning to keep working. */
  def statCols(spark: SparkSession, path: String): Seq[String] =
    specOf(spark, path).map(parse(_).map(_._2).distinct).getOrElse(Nil)

  /** Cluster `df` for a write into `path` per the recorded spec: one
    * range shuffle on the transform values + an in-partition sort, so
    * each output file covers a tight disjoint range of every cluster
    * dimension. Returns the clustered frame and the source columns to
    * zone-map. No-op (df, Nil) for unclustered tables. */
  def forWrite(spark: SparkSession, path: String, df: DataFrame): (DataFrame, Seq[String]) =
    specOf(spark, path) match {
      case None => (df, Nil)
      case Some(spec) =>
        val exprs = clusterExprs(spec)
        (df.repartitionByRange(exprs: _*).sortWithinPartitions(exprs: _*),
          parse(spec).map(_._2).distinct)
    }
}
