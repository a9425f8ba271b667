package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. The reference has none (single-table monthly batches),
  * but any event-shaped pipeline at scale needs the as-of join, and Spark
  * lacks a native one — the naive formulation (`l.key = r.key AND r.t <=
  * l.t` + argmax) plans as a range join whose candidate set is quadratic
  * in rows-per-key.
  */
object Temporal {

  /** Backward as-of join: for each left row, the single right row with the
    * greatest `rightTime <= leftTime` for the same key; left rows with no
    * prior right row keep null payload columns.
    *
    * Implemented as a tagged UNION + one window pass: shuffle both sides
    * once on the key, sort each partition by (time, side, tie), and carry
    * the last-seen right payload forward with `last(_, ignoreNulls)`.
    * Cost is one exchange + one in-partition sort — linear, no candidate
    * explosion; skew only where a single key's full history is hot (the
    * same boundary any per-key window has).
    *
    * At equal timestamps the right row sorts FIRST (side 0 < side 1), so a
    * same-instant right row IS matched (`<=`, DuckDB ASOF parity); right
    * ties on time resolve to the greatest `tieBreak`.
    *
    * `payload` are the right-side columns to surface; they must not collide
    * with left column names. */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String], tieBreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    // a null right time never matches anything (ASOF `l.t >= r.t` is null →
    // false); unfiltered it would sort nulls-first and become the running
    // payload for every left row before the first real right row
    val r = right.filter(col(rightTime).isNotNull).select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      tieBreak.as("__tb"),
      payloadStruct.as("__p"))
    val l = left.select(
      col(key) +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(r.schema("__tb").dataType).as("__tb") +:
        lit(null).cast(r.schema("__p").dataType).as("__p") +:
        leftCols.filterNot(_ == key).map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r.select(l.columns.map { c =>
        if (r.columns.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)
      }: _*))
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p))
    matched.select(out: _*)
  }

  /** Exact floor(x / c) for long `x` in pure column arithmetic: subtract the
    * non-negative remainder first, so the remaining division is of an exact
    * multiple. The double round-trip is exact while |x| < 2⁵³ — for
    * microsecond epochs that is every timestamp until ~year 2255. (A plain
    * `floor(x / c)` can misplace boundary values by one cell when the double
    * quotient rounds across an integer.) */
  private def floorDiv(x: Column, c: Long): Column =
    ((x - pmod(x, lit(c))) / lit(c)).cast("long")

  /** Grid-bucketed interval (range) join: every point row paired with every
    * interval row of the same key whose `[start, end)` contains `pointTime`.
    *
    * The naive formulation — equi-join on the key with the two range
    * predicates as residual filters — materializes ALL same-key
    * (point, interval) candidates: quadratic per hot key, and with no key at
    * all it plans as a broadcast nested loop. The grid shape adds time as an
    * equi-dimension instead: intervals replicate into each `cellMicros`-wide
    * cell they overlap, points map to exactly ONE cell, and the join runs as
    * a plain shuffle equi-join on (keys…, cell) with the exact range
    * predicate as a post-filter. A point's cell holds every interval copy
    * that could contain it, and holds it ONCE — so no dedup pass is needed.
    *
    * Candidate count per point is bounded by intervals-overlapping-its-cell,
    * not intervals-per-key; replication cost is rows(intervals) ×
    * avg(ceil(length / cellMicros) + 1). Pick `cellMicros` near the typical
    * interval length — much smaller over-replicates intervals, much larger
    * over-widens candidate sets (degrading toward the naive join).
    *
    * Empty or inverted intervals (`end <= start`) match nothing; a null
    * point time or interval bound matches nothing (SQL comparison parity).
    * Column names must not collide across the two frames apart from `keys`
    * (rename before calling, as with [[asofBackward]]). */
  def rangeJoin(points: DataFrame, pointTime: String,
                intervals: DataFrame, start: String, end: String,
                keys: Seq[String], cellMicros: Long): DataFrame = {
    require(cellMicros > 0, s"cellMicros must be positive, got $cellMicros")
    val iv = intervals
      .filter(col(end) > col(start))
      .withColumn("__cell", explode(sequence(
        floorDiv(unix_micros(col(start)), cellMicros),
        // end is exclusive: the last overlapped cell is the one holding end-1µs
        floorDiv(unix_micros(col(end)) - 1, cellMicros))))
    val pt = points
      .filter(col(pointTime).isNotNull)
      .withColumn("__cell", floorDiv(unix_micros(col(pointTime)), cellMicros))
    pt.join(iv, keys :+ "__cell")
      .filter(col(pointTime) >= col(start) && col(pointTime) < col(end))
      .drop("__cell")
  }

  /** Per-key time-series regularization ("gap fill"): project an irregular
    * event stream onto a fixed `stepSeconds` grid spanning each key's
    * observed range, carrying the last observation forward across empty
    * ticks — the standard pre-processing step before any
    * fixed-frequency rollup, rate comparison, or feature window, and the
    * inverse of what [[asofBackward]] consumes (a dense left grid instead
    * of an irregular one).
    *
    * Per (key, tick) with ≥1 observation, the surviving row is the one
    * greatest by (`time`, `tieBreak`) — `max_by` over a struct, no window
    * over raw events. Empty ticks inherit the previous surviving row's
    * `values` via `last(_, ignoreNulls)` over the forward-filled STRUCT
    * (null iff the tick was empty — so a null inside `values` passes
    * through as observed data rather than being skipped past). `observed`
    * marks real ticks (1) vs filled ones (0).
    *
    * Scale shape: one map-side-combined `max_by` aggregation over events,
    * one tiny per-key bounds aggregation, a per-key grid explode, and one
    * window PARTITIONED BY KEY (never a global order). Output size is
    * Σ_key (span / step) — choose `stepSeconds` so per-key grids stay
    * proportionate to per-key data; a key observed twice a year on a
    * 1-second grid is the caller's own denial of service. */
  def gapFill(df: DataFrame, key: String, time: String, stepSeconds: Long,
              values: Seq[String], tieBreak: Column): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val rows = df.filter(col(time).isNotNull)
      .withColumn("__bkt", floorDiv(unix_micros(col(time)), stepSeconds * 1000000L))
    val obs = rows.groupBy(col(key), col("__bkt"))
      .agg(max_by(struct(values.map(col): _*),
        struct(col(time), tieBreak)).as("__v"))
    val grid = rows.groupBy(col(key))
      .agg(min(col("__bkt")).as("__lo"), max(col("__bkt")).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"))).as("__bkt"))
    val w = Window.partitionBy(col(key)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = grid.join(obs, Seq(key, "__bkt"), "left")
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
    val out = col(key) +: (col("__bkt") * stepSeconds).as("ts_epoch") +:
      values.map(v => col(s"__f.$v").as(v)) :+
      col("__v").isNotNull.cast("long").as("observed")
    filled.select(out: _*)
  }
}
