package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{approx_count_distinct, broadcast, coalesce, col, date_trunc, floor, greatest, least, lit, max, min}
import org.apache.spark.sql.types.StringType

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

  /** Cluster `df` for a write into `path` per the recorded spec. Returns
    * the clustered frame and the source columns to zone-map. No-op
    * (df, Nil) for unclustered tables.
    *
    *  - ONE dimension: a range shuffle + in-partition sort — each file
    *    covers a tight disjoint range.
    *  - MULTIPLE dimensions: lexicographic ranging would give the
    *    LEADING dimension tight per-file ranges and leave every later
    *    dimension spanning its whole domain (a predicate on dim 2 alone
    *    prunes nothing) — so k ≥ 2 Morton-interleaves per-batch min-max
    *    scaled dims ([[Layout.zValueK]], the OPTIMIZE ZORDER core) and
    *    ranges on the z-value: every file covers a bounded k-rectangle
    *    and EVERY dimension's zone maps prune. Scaling is order-
    *    preserving and batch-local (zone maps record REAL values, so
    *    pruning stays exact regardless); string dims rank through a
    *    per-batch dictionary like OPTIMIZE's, and a string dim too
    *    distinct to dictionary (> 2^16 values) falls back to
    *    lexicographic ranging rather than failing the write. The extra
    *    min/max (+ distinct for strings) aggregations are the same cost
    *    class as the zone-map stats every clustered write already
    *    computes. */
  def forWrite(spark: SparkSession, path: String, df: DataFrame): (DataFrame, Seq[String]) =
    specOf(spark, path) match {
      case None => (df, Nil)
      case Some(spec) =>
        val exprs = clusterExprs(spec)
        val statCols = parse(spec).map(_._2).distinct
        val clustered =
          if (exprs.size == 1) rangeCluster(df, exprs)
          else zCluster(spark, df, exprs).getOrElse(rangeCluster(df, exprs))
        (clustered, statCols)
    }

  private def rangeCluster(df: DataFrame, exprs: Seq[Column]): DataFrame =
    df.repartitionByRange(exprs: _*).sortWithinPartitions(exprs: _*)

  /** Morton-cluster `df` on `exprs` with per-batch normalization; None
    * when a string dim is too distinct to dictionary (caller falls back
    * to lexicographic ranging — a write must not fail on data shape). */
  private def zCluster(spark: SparkSession, df: DataFrame,
                       exprs: Seq[Column]): Option[DataFrame] = {
    val k = exprs.size
    val bits = math.min(16, 63 / k)
    val maxZ = (1L << bits) - 1
    // helper names carry a per-write nonce: a user column literally
    // named __zd_0 must survive the final drop untouched
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val zcol = s"__z_$nonce"
    val named = exprs.zipWithIndex.map { case (e, i) => (e, s"__zd_${nonce}_$i") }
    val widened = named.foldLeft(df) { case (d, (e, n)) => d.withColumn(n, e) }
    val isString = named.map { case (_, n) => n -> (widened.schema(n).dataType == StringType) }.toMap
    // string dims: per-batch ordered dictionary (bounded), like OPTIMIZE
    val ranked: Option[DataFrame] =
      named.filter(p => isString(p._2)).foldLeft(Option(widened)) {
        case (None, _) => None
        case (Some(d), (_, n)) =>
          val approx = d.agg(approx_count_distinct(col(n), 0.05)).first().getLong(0)
          if (approx > (1L << 16)) None
          else {
            val vals = d.select(col(n)).filter(col(n).isNotNull)
              .distinct().orderBy(col(n)).collect().map(_.getString(0))
            if (vals.length > (1 << 16)) None
            else {
              val m = math.max(vals.length, 1)
              val rdf = spark.createDataFrame(
                vals.toIndexedSeq.zipWithIndex.map { case (s, i) =>
                  (s, i.toLong * (maxZ + 1) / m)
                }).toDF(n, s"__zr_$n")
              Some(d.join(broadcast(rdf), Seq(n), "left"))
            }
          }
      }
    ranked.map { d =>
      val numeric = named.filterNot(p => isString(p._2)).map(_._2)
      val bounds: Map[String, (Double, Double)] =
        if (numeric.isEmpty) Map.empty
        else {
          val aggs = numeric.flatMap(n => Seq(
            min(col(n).cast("double")), max(col(n).cast("double"))))
          val r = d.agg(aggs.head, aggs.tail: _*).first()
          numeric.zipWithIndex.map { case (n, i) =>
            n -> (if (r.isNullAt(2 * i)) (0.0, 0.0)
                  else (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
          }.toMap
        }
      val zdims = named.map { case (_, n) =>
        if (isString(n)) coalesce(col(s"__zr_$n"), lit(0L))
        else {
          val (mn, mx) = bounds(n)
          if (!(mx > mn)) lit(0L)
          else coalesce(
            least(lit(maxZ), greatest(lit(0L), floor(
              (col(n).cast("double") - lit(mn)) / lit(mx - mn) * lit(maxZ.toDouble)))),
            lit(0L))
        }
      }
      d.withColumn(zcol, Layout.zValueK(zdims, bits))
        .repartitionByRange(col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol +: named.map(_._2) ++: named.collect {
          case (_, n) if isString(n) => s"__zr_$n" }: _*)
    }
  }
}
