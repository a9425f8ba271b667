package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics at 100 TB: a
  * count-min sketch (Cormode & Muthukrishnan) built as a plain group-by —
  * the sketch IS a (depth × width)-cell aggregate, so Spark's map-side
  * partial aggregation ships at most depth·width cells per task through
  * the shuffle regardless of input rows, and "merging sketches" is the
  * same sum-by-cell group-by over more data. Point queries overestimate,
  * never underestimate (est ≥ true count; error ≤ εN with ε = e/width at
  * the usual depth = ln(1/δ) rows).
  *
  * Complements the existing exact/heavy-hitter machinery: Misra-Gries
  * (x27) answers "which keys are frequent", the CMS answers "how frequent
  * is THIS key" for any key, in fixed memory, without storing the key set.
  *
  * Determinism / oracle parity: buckets come from md5 hex prefixes
  * (`md5("row:key")` first 8 hex chars mod width) — engine-portable, so
  * the DuckDB oracle rebuilds the identical sketch cell-for-cell.
  */
object Sketches {

  /** Row-`r` bucket for `key`: first 8 md5 hex chars of "r:key", mod
    * `width`. Nonnegative, so `%`/`pmod` agree across engines. */
  private def cmBucket(key: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$r:"), key).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch over one key per input row: `(row, bucket, cnt)`,
    * depth·width cells max. Each input row fans out to `depth` cells via a
    * single generator (one pass over the data). */
  def countMin(df: DataFrame, key: Column, depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    df.select(explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("row"), cmBucket(key, r, width).as("bucket"))): _*)).as("__c"))
      .select(col("__c.row").as("row"), col("__c.bucket").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: `(probe, est)` where est = min over depth
    * rows of the probed cell (0 when a cell is empty). `probes` is small
    * (broadcast side); `depth`/`width` must match the build. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, probe: Column,
                       depth: Int = 4, width: Int = 512): DataFrame =
    probes.select(probe.as("probe"))
      .select(col("probe"), explode(array((0 until depth).map(r =>
        struct(lit(r.toLong).as("row"), cmBucket(col("probe"), r, width).as("bucket"))): _*)).as("__c"))
      .select(col("probe"), col("__c.row").as("row"), col("__c.bucket").as("bucket"))
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  // ---------------------------------------------------------------------
  // KMV (k-minimum-values) DISTINCT-COUNT sketch — the cardinality
  // counterpart to the CMS: keep the k smallest 48-bit hashes per group;
  // |distinct| ≈ (k−1)·2⁴⁸ / h_k (Bar-Yossef et al.). Mergeable (k
  // smallest of a union = re-take over unioned sketches) and — unlike
  // HLL — EXACTLY reproducible in the oracle: the hash order and the
  // integer estimate formula have no implementation freedom.

  /** 48-bit md5 hash for KMV (12 hex chars — collision-free at corpus
    * vocab scales, identical in DuckDB). */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 12), 16, 10).cast("long")

  /** Per-group sketch: the k smallest DISTINCT hashes, `(group, h)` rows.
    * One distinct-shuffle + the bounded top-k heap aggregate (O(k) per
    * task) — never a whole-group window. */
  def kmvSketch(df: DataFrame, group: Column, key: Column, k: Int = 64): DataFrame =
    graft.functions.TopKAgg.rankTopK(
        df.select(group.as("group"), kmvHash(key).as("h")).distinct(),
        col("group"), -col("h").cast("double"), col("h"), k)
      .select(col("group"), col("id").as("h"))

  /** Cardinality estimates from a sketch: exact below k (the sketch IS
    * the distinct set), else the (k−1)·2⁴⁸ div h_k integer estimator. */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): DataFrame =
    sketch.groupBy("group")
      .agg(count(lit(1)).as("__m"), max(col("h")).as("__hk"))
      .select(col("group"),
        when(col("__m") < k, col("__m"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div __hk"))
          .cast("long").as("est_distinct"))

  /** Pairwise corpus-overlap audit from per-group KMV sketches (the
    * multiset-operation estimators of Beyer et al. 2007, "On synopses for
    * distinct-value estimation"): for every group pair, the merged sketch
    * M = k smallest distinct hashes of the two sketches' union; with
    * j = |{h ∈ M present in BOTH}|, Jaccard ≈ j/k and
    * |A∩B| ≈ (j · est|A∪B|) div k. When M holds fewer than k hashes both
    * input sketches were exact, so j IS the exact intersection. All
    * integer arithmetic — exactly reproducible in the oracle.
    *
    * Work is sketch-sized throughout (pairs × O(k) rows, two equi-joins
    * against the sketch, the bounded merge heap): the audit answers "how
    * much do sources A and B overlap?" from kilobyte summaries without
    * ever re-touching corpus data — the 100 TB posture. Membership flags
    * ride INSIDE the heap id (h·4 + in_a·2 + in_b), so the merge stays
    * one [[graft.functions.TopKAgg]] pass. */
  def kmvOverlap(sketch: DataFrame, k: Int = 64): DataFrame = {
    val g = sketch.select(col("group")).distinct()
    val pairs = g.as("ga").join(g.as("gb"), col("ga.group") < col("gb.group"))
      .select(col("ga.group").as("g_a"), col("gb.group").as("g_b"))
    val aRows = pairs.join(sketch, col("group") === col("g_a"))
      .select(col("g_a"), col("g_b"), col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
    val bRows = pairs.join(sketch, col("group") === col("g_b"))
      .select(col("g_a"), col("g_b"), col("h"), lit(0L).as("ia"), lit(1L).as("ib"))
    val u = aRows.unionByName(bRows)
      .groupBy("g_a", "g_b", "h")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val m = graft.functions.TopKAgg.rankTopK(
      u.select(struct(col("g_a"), col("g_b")).as("__pair"),
        (col("h") * 4 + col("ia") * 2 + col("ib")).as("__enc"), col("h")),
      col("__pair"), -col("h").cast("double"), col("__enc"), k)
    m.select(col("group.g_a").as("g_a"), col("group.g_b").as("g_b"),
        shiftrightunsigned(col("id"), 2).as("h"),
        (col("id").bitwiseAND(3) === 3).cast("long").as("both"))
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("__m"), max(col("h")).as("__hk"),
        sum(col("both")).as("__j"))
      .withColumn("est_union",
        when(col("__m") < k, col("__m"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div __hk"))
          .cast("long"))
      .withColumn("est_intersect",
        when(col("__m") < k, col("__j"))
          .otherwise(expr(s"(__j * est_union) div $k")).cast("long"))
      .select(col("g_a"), col("g_b"), col("est_union"),
        col("__j").cast("long").as("overlap_k"), col("est_intersect"))
  }

  // ---------------------------------------------------------------------
  // LOG-HISTOGRAM quantile sketch — mergeable percentiles without a sort
  // (the DDSketch idea, Masson et al. 2019 VLDB, re-based onto PURELY
  // INTEGER buckets so the sketch has an exact cross-engine oracle —
  // log-gamma bucketing would put engine-ulp ln() differences on bucket
  // boundaries): a positive long lands in bucket (bitlen · 16 + top-4-
  // bits). Values below 16 are bucketed exactly; above, each power of
  // two splits into 8 sub-buckets → the bucket's lower bound
  // underestimates the true value by < 12.5% (one sub-bucket width).
  // ≤ ~16·64 buckets per group regardless of data, counts merge by
  // addition — the shape that answers p50/p99 over 100 TB from
  // kilobyte partial sketches with map-side combine, no global sort.

  /** Column-arg shift (the `functions.shiftright/shiftleft` wrappers only
    * take Int literals; the Catalyst expressions are general). */
  private def shr(v: Column, bits: Column): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      toExpression(v), toExpression(bits.cast("int"))))
  }
  private def shl(v: Column, bits: Column): Column = {
    import org.apache.spark.sql.graftbridge.ExprBridge.{toColumn, toExpression}
    toColumn(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      toExpression(v), toExpression(bits.cast("int"))))
  }

  /** Bucket id of a positive long (0 for values ≤ 0): bitlen·16 + top-4
    * bits. Codegen'd column arithmetic (conv/shift/mask), no UDF. */
  def logHistBucket(value: Column): Column = {
    val v = value.cast("long")
    val bl = length(conv(v, 10, 2)).cast("long")
    val top = when(bl <= 4, v)
      .otherwise(shr(v, bl - 4).bitwiseAND(lit(15L)))
    when(v <= 0, lit(0L)).otherwise(bl * 16 + top)
  }

  /** The bucket's lower bound — the deterministic quantile estimate. */
  def logHistLow(bucket: Column): Column = {
    val bl = shiftright(bucket, 4)
    val top = bucket.bitwiseAND(lit(15L))
    when(bl <= 4, top).otherwise(shl(top, bl - 4))
  }

  /** Per-group sketch: `(group, bucket, cnt)` — one map-side-combined
    * aggregation; merging sketches = summing cnt per (group, bucket). */
  def logHist(df: DataFrame, group: Column, value: Column): DataFrame =
    df.select(group.as("group"), logHistBucket(value).as("bucket"))
      .groupBy("group", "bucket").agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a sketch, one row per (group, q‰): the value
    * at 0-based rank ((N−1)·q) div 1000 resolves to the lower bound of
    * the first bucket whose cumulative count exceeds the rank. The
    * cumulative window is safe by CONSTRUCTION, not by data: a group
    * holds ≤ 16·64 bucket rows whatever the input size. */
  def logHistQuantiles(sketch: DataFrame, qPermille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = sketch
      .withColumn("__cum", sum(col("cnt"))
        .over(Window.partitionBy("group").orderBy("bucket")))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy("group")))
    cum.withColumn("q", explode(array(qPermille.map(q => lit(q.toLong)): _*)))
      .withColumn("__target", expr("((__n - 1) * q) div 1000"))
      .filter(col("__cum") > col("__target"))
      .groupBy("group", "q").agg(min(col("bucket")).as("__b"))
      .select(col("group"), col("q"), logHistLow(col("__b")).as("est"))
  }
}
