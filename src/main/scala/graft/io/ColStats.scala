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
  val HistPrefix = "graft.colhist."

  /** Is this a type whose range (min/max) and equi-height histogram we
    * record? Plain integral/fractional numerics, plus DATE and TIMESTAMP
    * through their internal numeric form (days / micros since epoch —
    * what Catalyst's estimator prices them as): the estimator's
    * histograms are double ranges, and its range checks need typed
    * min/max — double round-trips are exact for all of these (micros
    * since epoch ≈ 1.7e15 < 2^53), not for decimals or strings. */
  private def histogramable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }

  /** The column's ESTIMATOR-NUMERIC image: the value Catalyst's
    * FilterEstimation actually prices — plain numerics cast, dates as
    * days since epoch, timestamps as micros since epoch. */
  private def numRep(c: org.apache.spark.sql.Column,
                     dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.DateType => unix_date(c).cast("double")
    case org.apache.spark.sql.types.TimestampType =>
      unix_micros(c).cast("double")
    case _ => c.cast("double")
  }

  /** One aggregation pass over the live table: per column NDV
    * (approx_count_distinct), null count, avg/max string-image length,
    * and — for numeric columns — true min/max. Records
    * `graft.colstat.<col>` properties in one commit; returns the
    * per-column NDV map.
    *
    * Min/max are NOT optional garnish: Spark's `FilterEstimation` prices
    * an equality/range predicate by first checking the literal against
    * the column's range, and with NDV but NO range it estimates ZERO rows
    * — i.e. NDV-only stats would make every filtered side look empty
    * under CBO, which is worse than no stats at all.
    *
    * With `histogramBins > 1`, numeric columns additionally record an
    * EQUI-HEIGHT HISTOGRAM (`graft.colhist.<col>`): bin boundaries from
    * one `percentile_approx` sweep (same pass), per-bin distinct counts
    * from one second pass of range-conditioned `approx_count_distinct`
    * sketches. Histograms are what makes selectivity on SKEWED predicates
    * honest — NDV-uniform estimation prices every value of a 95/5 column
    * identically, a histogram prices the hot value at its real share —
    * and they feed Spark's own `FilterEstimation` through the scan's
    * `columnStats().histogram()` under CBO. */
  def analyze(spark: SparkSession, table: String,
              cols: Seq[String], histogramBins: Int = 0): Map[String, Long] = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val df = Snapshots.readAt(spark, table)
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val rangeCols = cols.filter(c => histogramable(df.schema(c).dataType))
    val histCols = if (histogramBins > 1) rangeCols else Nil
    val pcts = (0 to histogramBins).map(_.toDouble / math.max(1, histogramBins))
    val aggs = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c)).as(s"__ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        ceil(coalesce(avg(length(col(c).cast("string"))), lit(0.0)))
          .cast("long").as(s"__avglen_$c"),
        coalesce(max(length(col(c).cast("string"))), lit(0))
          .cast("long").as(s"__maxlen_$c"))
    } ++ rangeCols.flatMap { c =>
      val n = numRep(col(c), df.schema(c).dataType)
      Seq(min(n).as(s"__min_$c"), max(n).as(s"__max_$c"))
    } ++ histCols.flatMap { c =>
      Seq(percentile_approx(numRep(col(c), df.schema(c).dataType),
            lit(pcts.toArray), lit(10000)).as(s"__pct_$c"),
        count(col(c)).as(s"__cnt_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val v = Snapshots.currentVersion(spark, table)
    val rangeBase = cols.length * 4
    val rangeIdx = rangeCols.zipWithIndex.toMap
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
      val range = rangeIdx.get(c).collect {
        case j if !row.isNullAt(rangeBase + j * 2) =>
          s";min=${row.getDouble(rangeBase + j * 2)}" +
            s";max=${row.getDouble(rangeBase + j * 2 + 1)}"
      }.getOrElse("")
      (Prefix + c) -> Some(s"ndv=$ndv;nulls=$nulls;avglen=$avgLen;" +
        s"maxlen=$maxLen;asof=$v$range")
    }
    // per-bin distinct counts: ONE second pass, histogramBins
    // range-conditioned HLL sketches per histogram column
    val histProps: Seq[(String, Option[String])] =
      if (histCols.isEmpty) Nil
      else {
        val base = cols.length * 4 + rangeCols.length * 2
        val info = histCols.zipWithIndex.flatMap { case (c, i) =>
          val bs = row.getSeq[Double](base + i * 2)
          val cnt = row.getLong(base + i * 2 + 1)
          if (bs == null || bs.isEmpty || cnt == 0) None
          else Some((c, bs, cnt))
        }
        if (info.isEmpty) Nil
        else {
          val binAggs = info.flatMap { case (c, bs, _) =>
            val d = numRep(col(c), df.schema(c).dataType)
            (0 until histogramBins).map { i =>
              val cond =
                if (i == 0) d >= bs(0) && d <= bs(1)
                else d > bs(i) && d <= bs(i + 1)
              approx_count_distinct(when(cond, d)).as(s"__hb_${c}_$i")
            }
          }
          val binRow = df.agg(binAggs.head, binAggs.tail: _*).first()
          var off = 0
          info.map { case (c, bs, cnt) =>
            val bins = (0 until histogramBins).map { i =>
              // an empty bin (duplicated boundary) still describes one
              // value for the estimator — never a 0-ndv division
              val ndvB = math.max(1L, binRow.getLong(off + i))
              s"${bs(i)}:${bs(i + 1)}:$ndvB"
            }.mkString("|")
            off += histogramBins
            (HistPrefix + c) -> Some(
              s"height=${cnt.toDouble / histogramBins};asof=$v;bins=$bins")
          }
        }
      }
    Snapshots.commit(spark, table, adds = Nil, props = props ++ histProps,
      notes = Seq(s"analyze:${cols.mkString(",")}" +
        (if (histCols.nonEmpty) s" hist=${histCols.mkString(",")}x$histogramBins"
         else "")))
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i * 4) }.toMap
  }

  /** Recorded equi-height histograms at `version` (default current):
    * column → (height, bins as (lo, hi, ndv)). */
  def histOf(spark: SparkSession, table: String,
             version: Option[Long] = None)
      : Map[String, (Double, Seq[(Double, Double, Long)])] =
    Snapshots.tableProperties(spark, table, version).collect {
      case (k, v) if k.startsWith(HistPrefix) =>
        val kv = v.split(';').flatMap(_.split("=", 2) match {
          case Array(a, b) => Some(a -> b); case _ => None
        }).toMap
        val bins = kv.getOrElse("bins", "").split('|').toSeq
          .filter(_.nonEmpty).map { b =>
            val Array(lo, hi, n) = b.split(':')
            (lo.toDouble, hi.toDouble, n.toLong)
          }
        k.drop(HistPrefix.length) ->
          ((kv.getOrElse("height", "0").toDouble, bins))
    }

  /** Recorded column stats at `version` (default current):
    * column → (ndv, nulls, avgLen, maxLen). */
  def of(spark: SparkSession, table: String,
         version: Option[Long] = None): Map[String, (Long, Long, Long, Long)] =
    Snapshots.tableProperties(spark, table, version).collect {
      case (k, v) if k.startsWith(Prefix) =>
        val kv = v.split(';').flatMap(_.split('=') match {
          case Array(a, b) => scala.util.Try(b.toLong).toOption.map(a -> _)
          case _ => None
        }).toMap
        k.drop(Prefix.length) -> ((kv.getOrElse("ndv", 0L),
          kv.getOrElse("nulls", 0L), kv.getOrElse("avglen", 0L),
          kv.getOrElse("maxlen", 0L)))
    }

  /** Recorded numeric min/max at `version` (default current):
    * column → (min, max) as doubles. Only columns that were numeric at
    * analyze time and had at least one non-null value appear. */
  def rangeOf(spark: SparkSession, table: String,
              version: Option[Long] = None): Map[String, (Double, Double)] =
    Snapshots.tableProperties(spark, table, version).toSeq.flatMap {
      case (k, v) if k.startsWith(Prefix) =>
        val kv = v.split(';').flatMap(_.split('=') match {
          case Array(a, b) => Some(a -> b); case _ => None
        }).toMap
        for (lo <- kv.get("min"); hi <- kv.get("max"))
          yield k.drop(Prefix.length) -> ((lo.toDouble, hi.toDouble))
      case _ => None
    }.toMap
}
