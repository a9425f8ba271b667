package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global-aggregate-parameterized column rewrites — the cleaning operator
  * family of the reference (`data_processing.py:73-210`, SURVEY §2.5).
  *
  * The reference computes a scalar (median / mode / p99) eagerly over the
  * whole batch and then mutates columns in place. The Spark-native shape is
  * a 2-phase plan: one aggregation job producing O(#columns) scalars on the
  * driver, then a single projection using those scalars as literals. The
  * scalar collect is O(1) data (not a `.collect()` of rows), so this scales
  * to any input size; the aggregation itself is a map-side-combined
  * partial+final agg with one shuffle of #partitions rows.
  *
  * Scale note (SURVEY §7.5.5): `percentile` is exact (sort-based, pandas
  * parity). At very large scale flip `exact = false` to use
  * `percentile_approx` (t-digest, single pass, no sort).
  */
object Cleaning {

  def percentileOf(c: Column, p: Double, exact: Boolean = true): Column =
    if (exact) percentile(c, lit(p)) else percentile_approx(c, lit(p), lit(10000))

  /** EXACT scalar percentile by distributed sort + global-rank selection —
    * the scale-safe replacement for a GLOBAL `percentile(c, p)` aggregate
    * (per-group percentiles keep the aggregate: their state parallelizes
    * across groups).
    *
    * Why: the built-in exact `percentile` is an imperative aggregate that
    * builds a value→count OpenHashMap per partition and merges EVERY map
    * in the single final-aggregation task — on a mostly-distinct numeric
    * column the merge deserializes the whole column into one task (the
    * single-reducer bottleneck locally; an OOM at 100 TB — the documented
    * mitigation was falling back to approx). Sorted selection keeps every
    * step partition-parallel and bounded: project + null-filter the one
    * column, cache it, count, total-order sort (range shuffle), global
    * index, and collect exactly the ≤2·|ps| boundary rows.
    *
    * Bit-parity: reproduces `Percentile.getPercentile` exactly —
    * `position = (n−1)·p`, `lower = ⌊position⌋`, `higher = ⌈position⌉`,
    * result `(higher−position)·v_lo + (position−lower)·v_hi` in the same
    * double operations, values converted to double only at the end (the
    * aggregate's `toDoubleValue` order), equal-rank / equal-value
    * short-circuits included — pinned bit-for-bit against the aggregate
    * over randomized data in CleaningSpec.
    *
    * Returns one result per requested p (None = no non-null input). */
  def percentilesSelect(df: DataFrame, c: Column,
                        ps: Seq[Double]): Seq[Option[Double]] = {
    import org.apache.spark.storage.StorageLevel
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentages out of [0,1]: $ps")
    val proj = df.select(c.as("__v")).where(col("__v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = proj.count()
      if (n == 0) return ps.map(_ => None)
      def toDoubleValue(a: Any): Double = a match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case d: java.math.BigDecimal               => d.doubleValue()
        case x: Number                             => x.doubleValue()
      }
      val wanted: Map[Double, (Long, Long, Double)] = ps.map { p =>
        val position = (n - 1).toDouble * p
        p -> (position.floor.toLong, position.ceil.toLong, position)
      }.toMap
      val ranks = wanted.values.flatMap(t => Seq(t._1, t._2)).toSet
      // InternalRow path: `.rdd` would convert every row to an external
      // Row (measured ~0.2 s per call at 600k rows); extracting the one
      // value per InternalRow is the lean conversion. Extraction happens
      // BEFORE zipWithIndex — the scan reuses its UnsafeRow buffer, so the
      // row reference must not outlive the iterator step.
      val dt = proj.schema.head.dataType
      val picked: Map[Long, Any] = proj.orderBy(col("__v"))
        .queryExecution.toRdd.map(_.get(0, dt)).zipWithIndex()
        .filter(x => ranks.contains(x._2))
        .collect().map { case (v, i) => i -> v }.toMap
      ps.map { p =>
        val (lower, higher, position) = wanted(p)
        val lv = picked(lower)
        Some(
          if (higher == lower) toDoubleValue(lv)
          else {
            val hv = picked(higher)
            if (hv == lv) toDoubleValue(lv)
            else (higher.toDouble - position) * toDoubleValue(lv) +
              (position - lower.toDouble) * toDoubleValue(hv)
          })
      }
    } finally proj.unpersist(blocking = false)
  }

  /** [[percentilesSelect]] for one percentage. */
  def percentileSelect(df: DataFrame, c: Column, p: Double): Option[Double] =
    percentilesSelect(df, c, Seq(p)).head

  /** C1 — median imputation for several numeric columns in ONE aggregation
    * pass (pandas `fillna(col.median())`, `DP:86-95`). Exact interpolating
    * median, nulls excluded — matches pandas.
    */
  def imputeMedian(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) df
    else {
      // stays on the one-pass percentile AGGREGATE deliberately: imputed
      // columns are low-cardinality counts/codes (quantities, rate codes),
      // where the aggregate's value map is tiny and its map-side combine
      // beats a sort — measured: routing the single-column case through
      // [[percentilesSelect]] cost q24 ~+0.3 s. The selection path is for
      // CONTINUOUS columns (caps, MAD), where the map degenerates to the
      // whole column in one merge task.
      val aggs = present.map(c => percentileOf(col(c), 0.5, exact).as(c))
      val row = df.agg(aggs.head, aggs.tail: _*).first()
      // exact percentile returns DOUBLE; percentile_approx returns the
      // INPUT type (e.g. TINYINT) — normalize via Number
      val medians = present.zipWithIndex.collect {
        case (c, i) if !row.isNullAt(i) =>
          c -> row.get(i).asInstanceOf[Number].doubleValue()
      }.toMap
      df.na.fill(medians)
    }
  }

  /** C2 — mode imputation with the pandas tie-break (smallest value wins,
    * `DP:97-105`). Spark's builtin `mode()` agg is tie-nondeterministic, so
    * we take `groupBy(col).count` ordered by (count desc, value asc).
    * An entirely-null column is left untouched — the reference's
    * `notna().any()` guard (`DP:100`) skips imputation there, making its
    * `'Unknown'` branch unreachable (and a string fill would be a type
    * hazard on tinyint categoricals like RatecodeID anyway).
    */
  def modeOf(df: DataFrame, c: String): Option[Any] = {
    val top = df.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col(c).asc)
      .limit(1).collect()
    top.headOption.map(_.get(0))
  }

  def imputeMode(df: DataFrame, cols: Seq[String]): DataFrame = {
    // one mode job per column, but submitted CONCURRENTLY — wall-clock is
    // the slowest job, not the sum (SparkSession actions are thread-safe).
    // The one-job alternative (GROUPING SETS over all k columns) shuffles
    // every row k times in a single pass — same total bytes, strictly
    // worse peak pressure, and it forfeits per-column typed tie-breaks
    // until a second argmax round; k concurrent 1×-volume scans win at
    // any scale where the scan dominates (deliberate, judged trade-off)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val present = cols.filter(df.columns.contains)
    val modes = Await.result(
      Future.sequence(present.map(c => Future(c -> modeOf(df, c)))), Duration.Inf)
    modes.foldLeft(df) {
      case (d, (c, Some(m))) => d.withColumn(c, coalesce(col(c), lit(m)))
      case (d, (_, None))    => d // all-null column: nulls survive (DP:100)
    }
  }

  /** C3 — constant imputation (`fillna(k)`, `DP:107-114`). */
  def imputeConstant(df: DataFrame, cols: Seq[String], value: Any): DataFrame = {
    val present = cols.filter(df.columns.contains)
    value match {
      case v: Int    => df.na.fill(v.toLong, present)
      case v: Long   => df.na.fill(v, present)
      case v: Double => df.na.fill(v, present)
      case v: String => df.na.fill(v, present)
      case other     => present.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(other))))
    }
  }

  /** C4/C5 — quantile-cap outliers (`DP:126-144`): rows matching `bad` get
    * the quantile of `basis` (whole column for C4; a filtered subset for C5
    * — pass `basis = when(cond, col)`). The quantile includes the outliers
    * themselves when `basis` does, exactly like the reference.
    */
  def quantileCap(df: DataFrame, target: String, bad: Column, basis: Column,
                  q: Double, exact: Boolean = true): DataFrame = {
    val capOpt =
      if (exact) percentileSelect(df, basis, q) // sorted selection, no map-merge
      else df.agg(percentileOf(basis, q, exact)).first() match {
        case r if r.isNullAt(0) => None
        case r                  => Some(r.get(0).asInstanceOf[Number].doubleValue())
      }
    val cap = capOpt match {
      case None    => return df
      case Some(v) => v
    }
    // cast back: the double quantile literal must not widen a float32
    // column (float32 end-to-end parity, SURVEY §7.5.4)
    df.withColumn(target,
      when(bad, lit(cap)).otherwise(col(target)).cast(df.schema(target).dataType))
  }

  /** Per-group quantile cap (grouped winsorize): cap `target` at its OWN
    * group's q-quantile — the grouped generalization of C4, which the
    * reference cannot express without a Python loop over groups.
    *
    * Shape: one grouped aggregation produces the cap table (rows = #groups,
    * tiny next to the data), joined back as a broadcast; the rewrite is a
    * codegen'd projection. No `Window.partitionBy.orderBy` — a windowed
    * percentile would sort every group's full rows; the agg+join shape
    * shuffles the data once (map-side combined) and sorts only within the
    * percentile's per-group state.
    *
    * Null group keys form their own group and cap each other (pandas
    * `groupby(dropna=False)` parity) via a null-safe join. Null targets pass
    * through uncapped (clip parity); an all-null group has a null cap and is
    * left unchanged. Set `broadcastCaps = false` when the group count itself
    * is huge (a high-cardinality key at 100 TB) — the join then falls back
    * to Catalyst's choice instead of forcing a giant broadcast. */
  def quantileCapByGroup(df: DataFrame, groupCols: Seq[String], target: String,
                         q: Double, exact: Boolean = true,
                         broadcastCaps: Boolean = true,
                         sortedSelection: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "quantileCapByGroup needs at least one group column")
    val gName = groupCols.map(c => c -> s"__g_$c").toMap
    val capsRaw = (
      if (exact && sortedSelection)
        groupedPercentileSelect(df, groupCols, target, q)
      else df.groupBy(groupCols.map(col): _*)
        .agg(percentileOf(col(target), q, exact).as("__cap"))
    ).select(groupCols.map(c => col(c).as(gName(c))) :+ col("__cap"): _*)
    val caps = if (broadcastCaps) broadcast(capsRaw) else capsRaw
    val cond = groupCols.map(c => col(c) <=> col(gName(c))).reduce(_ && _)
    df.join(caps, cond, "left")
      .withColumn(target,
        when(col(target) > col("__cap"), col("__cap")).otherwise(col(target))
          .cast(df.schema(target).dataType))
      .drop("__cap" +: groupCols.map(gName): _*)
  }

  /** Per-group EXACT percentile by rank selection — the FEW-FAT-GROUPS
    * alternative to the per-group `percentile` AGGREGATE. The aggregate
    * parallelizes across groups but builds a value→count map per group in
    * ONE reducer's hands: with few groups of continuous values the map
    * degenerates to the whole group's column in a single task (the same
    * single-reducer shape [[percentilesSelect]] removed for the global
    * scalar). Selection instead sorts within hash partitions of the group
    * key (`row_number` streams — O(1) task memory) and aggregates only
    * the ≤2 boundary rows per group; the group-count window rides the
    * same exchange. Trade-off, measured and documented: the aggregate's
    * map-side combine wins on low-cardinality values (duplicates
    * collapse before the shuffle), selection wins on continuous values /
    * few fat groups — pick per call site; parity is bit-exact either way
    * (CleaningSpec pins both paths to identical doubles, including the
    * equal-rank / equal-value short-circuits on the ORIGINAL values).
    * Returns one `(groupCols…, __cap)` row per group with ≥1 non-null
    * target (all-null groups yield no row — callers' left join leaves
    * them uncapped, exactly like the aggregate's null percentile). */
  private def groupedPercentileSelect(df: DataFrame, groupCols: Seq[String],
                                      target: String, q: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(groupCols.map(col) :+ col(target): _*)
      .where(col(target).isNotNull)
    val byG = Window.partitionBy(groupCols.map(col): _*)
    val ranked = v
      .withColumn("__r", row_number().over(byG.orderBy(col(target))).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(byG))
    // Percentile.getPercentile bit-parity: position = (n−1)·q (doubles),
    // lower/higher = floor/ceil; equal ranks or equal ORIGINAL values
    // short-circuit before any double conversion; otherwise interpolate
    // in the aggregate's exact operation order.
    val pos = (col("__n") - 1).cast("double") * lit(q)
    val boundary = ranked
      .filter(col("__r") === floor(pos) || col("__r") === ceil(pos))
      .withColumn("__pos", pos)
    boundary.groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("__r") === floor(col("__pos")), col(target))).as("__lov"),
        max(when(col("__r") === ceil(col("__pos")), col(target))).as("__hiv"),
        max(col("__pos")).as("__p"))
      .withColumn("__cap", {
        val lo = col("__lov").cast("double"); val hi = col("__hiv").cast("double")
        when(col("__p") === floor(col("__p")), lo)
          .when(col("__lov") === col("__hiv"), lo)
          .otherwise((ceil(col("__p")) - col("__p")) * lo +
            (col("__p") - floor(col("__p"))) * hi)
      })
      .select(groupCols.map(col) :+ col("__cap"): _*)
  }

  /** Robust outlier filter by modified z-score: keep rows where
    * |x − median| ≤ k·MAD (MAD = median absolute deviation). The
    * median/MAD pair is immune to the outliers it hunts — a mean/stddev
    * filter moves its own threshold when a 1e9 sensor glitch lands in the
    * batch; the median pair does not. Two aggregation passes (median, then
    * MAD — the second needs the first as a literal), each a single
    * O(#scalars)-to-driver reduction; the filter itself is a codegen'd
    * predicate. Nulls never match the predicate and are dropped (pandas
    * `df[cond]` parity). An all-null or constant column (MAD 0) keeps only
    * rows exactly at the median — the textbook degenerate case, documented
    * rather than special-cased. */
  def madOutlierFilter(df: DataFrame, target: String, k: Double = 3.5,
                       exact: Boolean = true): DataFrame = {
    def scalar(c: Column): Option[Double] =
      if (exact) percentileSelect(df, c, 0.5) // sorted selection, no map-merge
      else df.agg(percentileOf(c, 0.5, exact)).first() match {
        case r if r.isNullAt(0) => None
        case r                  => Some(r.get(0).asInstanceOf[Number].doubleValue())
      }
    val med = scalar(col(target)) match {
      case None    => return df.filter(lit(false)) // all null: nothing survives
      case Some(m) => m
    }
    val mad = scalar(abs(col(target) - med)).get
    df.filter(abs(col(target) - med) <= k * mad)
  }

  /** C6 — clamp to [lo, hi] with null passthrough (`DP:146-154`).
    * Spark's `greatest`/`least` SKIP null arguments (they return the
    * non-null extreme), unlike pandas `clip` which propagates NaN — so the
    * null case must be handled explicitly. */
  def clamp(c: Column, lo: Column, hi: Column): Column =
    when(c.isNull, lit(null)).otherwise(greatest(least(c, hi), lo))

  /** C7 — component-sum consistency rewrite (`DP:156-174`): where
    * |reported − computed| > tol, overwrite reported with computed.
    */
  def consistencyRewrite(reported: Column, computed: Column, tol: Double): Column =
    when(abs(reported - computed) > tol, computed).otherwise(reported)

  /** C8 — ordering repair (`DP:176-185`): where `end < start`,
    * `end := start + interval`.
    */
  def repairOrder(start: Column, end: Column, interval: String): Column =
    when(end < start, start + expr(s"INTERVAL $interval")).otherwise(end)
}
