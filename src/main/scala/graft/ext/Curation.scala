package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation for training-data pipelines: deterministic data mixing
  * (per-group downsampling quotas) and per-group quality top-n. Both are
  * single-pass, shuffle-minimal, and RNG-free — reruns, retries, and
  * cluster resizes produce byte-identical corpora, which is what makes a
  * 100 TB mixing job auditable.
  */
object Curation {

  /** Deterministic stratified downsampling: keep a row iff its 256-way md5
    * bucket ([[TextAnalysis.hashBucket]] over `key`) falls below the
    * group's quota (quota/256 ≈ sampling rate; groups absent from `quotas`
    * get `defaultQuota`). A pure filter — no shuffle, no sampling RNG; the
    * kept set is a stable function of the key, so incremental reruns keep
    * the same rows. */
  def stratifiedSample(df: DataFrame, group: Column, key: Column,
                       quotas: Map[String, Int], defaultQuota: Int = 256): DataFrame = {
    require((defaultQuota +: quotas.values.toSeq).forall(q => q >= 0 && q <= 256),
      "quotas are buckets out of 256")
    val quota = quotas.toSeq.sortBy(_._1).foldLeft(lit(defaultQuota)) {
      case (acc, (g, q)) => when(group === lit(g), lit(q)).otherwise(acc)
    }
    df.filter(TextAnalysis.hashBucket(key) < quota)
  }

  /** The temperature-mixing bucket space: 2^16 md5 buckets, NOT
    * [[stratifiedSample]]'s 256 — quota resolution is 1/buckets, and with
    * only 256 buckets any group ≳512^(1/(1-α)) times larger than the
    * smallest would round to quota 0 and be silently DELETED rather than
    * downsampled (at web-corpus skews that is the dominant language). */
  val TemperatureBuckets: Int = 65536

  /** Temperature-scaled mixing quotas: rebalance group proportions from
    * p_g to p_g^α / Σ p^α (α < 1 flattens — the standard multilingual
    * rebalancing; α = 1 is a no-op, α = 0 is uniform). Returns one row per
    * group: (group, n_rows, quota) where `quota` ∈ [1, 65536] is the
    * md5-bucket threshold that downsamples the group toward its target
    * share. The largest REQUIRED ratio maps to 65536 (keep everything),
    * so the plan only ever downsamples; the floor of 1 means no nonempty
    * group is ever zeroed — flattening must never silently delete a
    * group (a ratio below 1/65536 keeps its sliver instead).
    *
    * Deterministic: quotas derive from exact group counts through a fixed
    * arithmetic pipeline (one grouped count — the corpus is never
    * re-scanned), and the sampling itself stays the md5-bucket filter. */
  def temperatureQuotas(df: DataFrame, group: Column, alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha in [0,1], got $alpha")
    val counts = df.groupBy(group.as("group")).agg(count(lit(1)).as("n_rows"))
    // target share ∝ n^α; realized share after keeping ratio r_g is
    // r_g·n_g / Σ r·n. Set r_g ∝ n_g^(α-1) (so r·n ∝ n^α), normalized to
    // max r = 1 → the biggest downsample hits the SMALLEST quota and the
    // group with max n^(α-1) (the smallest group) keeps everything.
    counts.crossJoin(broadcast(
        counts.agg(max(pow(col("n_rows").cast("double"), alpha - 1.0)).as("__rmax"))))
      .select(col("group"), col("n_rows"),
        // ratio rounded to 6 dp BEFORE scaling: pow() may differ by an ulp
        // across engines (Java Math.pow vs libm pow), and an ulp must not
        // flip an integer quota
        greatest(lit(1L),
          round(round(pow(col("n_rows").cast("double"), alpha - 1.0) / col("__rmax"), 6)
            * TemperatureBuckets, 0).cast("long")).as("quota"))
  }

  /** Apply [[temperatureQuotas]] in one shot: keep a row iff its md5
    * bucket clears its group's temperature quota. The quota table is
    * #groups rows — broadcast; the corpus scans once for counts and once
    * for the filter. Null group keys form their own group (null-safe
    * join) and are sampled like any other. */
  def temperatureSample(df: DataFrame, group: Column, key: Column, alpha: Double): DataFrame =
    df.join(broadcast(temperatureQuotas(df, group, alpha)
        .select(col("group").as("__tq_group"), col("quota").as("__tq_quota"))),
        group <=> col("__tq_group"))
      .filter(TextAnalysis.hashBucket16(key) < col("__tq_quota"))
      .drop("__tq_group", "__tq_quota")

  /** Per-group top-n by score (ties → smallest id): the bounded top-k
    * AGGREGATE ([[graft.functions.TopKAgg]]) keeps an O(n) heap per map
    * task and ships ≤ n entries per task through the shuffle — never a
    * per-group window over the group's full candidate set (whose biggest
    * group would otherwise bound the whole stage). Output: (group, rk,
    * id, score), rk 1-based by descending score. */
  def topNPerGroup(df: DataFrame, group: Column, score: Column, id: Column,
                   nTop: Int): DataFrame =
    graft.functions.TopKAgg.rankTopK(df, group, score, id, nTop)

  /** Per-group percentile-rank normalization WITHOUT a per-group window:
    * scores become their quantile-bucket rank in [0, 1), so a single
    * threshold means the same thing in every group (the cross-language
    * quality-calibration step). `Window.partitionBy(group)` + percent_rank
    * would funnel each group's full rows through one task — the scale
    * ceiling; instead ONE grouped aggregation computes `buckets−1`
    * boundaries per group (rows = #groups — broadcast), and the rank is a
    * compiled binary search against the group's boundary array
    * ([[graft.functions.ArrayExprs.LowerBoundCount]], O(log buckets) per
    * row). Resolution is 1/buckets; `exact = false` swaps the boundary
    * aggregation to t-digest for the 100 TB path. Null scores and all-null
    * groups yield null ranks. Appends `rankCol` to the input columns. */
  def quantileNormalize(df: DataFrame, group: Column, score: Column,
                        buckets: Int = 100, exact: Boolean = true,
                        rankCol: String = "qrank"): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val probsCol = array(probs.map(lit): _*)
    val boundsAgg =
      if (exact) percentile(score.cast("double"), probsCol)
      else percentile_approx(score.cast("double"), probsCol, lit(10000))
    val bounds = df.groupBy(group.as("__g")).agg(boundsAgg.as("__bounds"))
    df.join(broadcast(bounds), group <=> col("__g"), "left")
      .withColumn(rankCol,
        graft.functions.ArrayExprs.lowerBoundCount(score, col("__bounds"))
          .cast("double") / buckets)
      .drop("__g", "__bounds")
  }

  /** Exact heavy hitters without an exact-everything shuffle: a Misra-Gries
    * sketch ([[graft.functions.FreqAgg]], O(k) state per task) nominates ≤k
    * candidates, then ONE filtered pass counts just those candidates
    * exactly (broadcast semi-join — the candidate set is tiny). Provided
    * `minCount > n/(k+1)` (n = total items), the sketch cannot miss a true
    * heavy hitter, so the output is EXACTLY the items with true count ≥
    * `minCount` — deterministic even though sketch estimates are not.
    * Returns (item, n_occurrences). */
  /** `persistItems`: the verify pass re-reads the item stream; by default
    * it RECOMPUTES the projection (at 100 TB the tokenized stream is larger
    * than the corpus — caching it would spill more than the rescan costs).
    * Set true when the upstream tokenize is expensive relative to the data
    * size (derived/exploded streams at moderate scale) to run both passes
    * off one materialized frame. */
  def heavyHitters(df: DataFrame, item: Column, k: Int, minCount: Long,
                   persistItems: Boolean = false,
                   minShare: Option[Double] = None): DataFrame = {
    val items0 = df.select(item.cast("string").as("item"))
    val items =
      if (persistItems)
        items0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else items0
    try {
      // n rides the same aggregation as the sketch (no extra pass) so the
      // exactness precondition is ENFORCED, not just documented: with
      // minCount ≤ n/(k+1) the sketch may evict a true heavy hitter during
      // partial merges and the output would be silently merge-order-dependent
      val agg = items.agg(graft.functions.FreqAgg.freqSketch(col("item"), k).as("__sk"),
        count(col("item")).as("__n")).head()
      val n = agg.getLong(1)
      // scale-invariant thresholding: a fixed absolute cut stops satisfying
      // the exactness bound once the stream grows past minCount×(k+1);
      // minShare makes the cut a FRACTION of the stream (count ≥ share×n —
      // the classic φ-heavy-hitter definition, valid at every scale when
      // share > 1/(k+1)) with minCount as the small-corpus floor
      val effMin = minShare
        .map(s => math.max(minCount, math.ceil(n * s).toLong))
        .getOrElse(minCount)
      require(effMin > n / (k + 1).toLong,
        s"threshold=$effMin is not > n/(k+1) = $n/${k + 1}: raise k or the threshold " +
          "or the sketch cannot guarantee every true heavy hitter is nominated")
      val cands = agg.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
      val out = items.filter(col("item").isin(cands: _*))
        .groupBy("item").agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= effMin)
      if (persistItems) out.localCheckpoint(true) else out
    } finally {
      if (persistItems) items.unpersist(blocking = false)
    }
  }

  /** Token-budget EPOCH mixing — the other half of data mixing: when a
    * source's target share exceeds what it holds, the standard move is to
    * repeat (epoch) it up to a cap rather than silently under-deliver
    * (LLaMA-style up-weighting of small high-quality sources). Exact
    * integer semantics end to end:
    *
    *   desired_s  = ppm_s × budget div 10⁶
    *   efull_s    = min(desired_s div avail_s, maxEpochs)
    *   rem_s      = desired_s − efull_s × avail_s   (0 when the cap binds)
    *
    * Each source emits `efull` full copies (epoch 1..efull) plus one
    * PARTIAL epoch: docs in deterministic md5 order — (hashBucket16(id),
    * id) — are included while they fit under `rem` without overshooting
    * (exclusive-prefix + tokens ≤ rem), so reruns cut at the identical doc
    * boundary. Sources absent from `weightsPpm` contribute nothing.
    *
    * Scale shape: one grouped sum for availability, a broadcast per-source
    * plan, and the partial-epoch cut as a TWO-PHASE per-source prefix sum
    * — per-(source, bucket16) totals, per-source offsets over a ≤65536-row
    * frame, then within-bucket windows — never a whole source's rows
    * through one window task. Full epochs are an `explode(sequence)` over
    * the epoch count: no data is copied until a sink materializes it.
    *
    * `budget` is a ONE-ROW frame with a long `__budget` column (derive it
    * in-plan, e.g. 3 × corpus tokens) so the whole mix stays a composed
    * declarative plan. Returns (source, epoch, id, tokens). */
  def epochMix(df: DataFrame, source: Column, id: Column, tokens: Column,
               weightsPpm: Map[String, Long], budget: DataFrame,
               maxEpochs: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxEpochs >= 1, s"maxEpochs >= 1, got $maxEpochs")
    require(weightsPpm.values.forall(w => w >= 0L && w <= 1000000L),
      "weights are parts-per-million in [0, 1e6]")
    val base = df.select(source.cast("string").as("source"), id.as("id"),
      tokens.cast("long").as("tokens"),
      TextAnalysis.hashBucket16(id).as("__b"))
    val ppm = weightsPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (g, w)) => when(col("source") === lit(g), lit(w)).otherwise(acc)
    }
    val plan = base.groupBy("source").agg(sum(col("tokens")).as("__a"))
      .crossJoin(broadcast(budget))
      .withColumn("__ppm", ppm)
      .withColumn("__d", expr("(__ppm * __budget) div 1000000"))
      .withColumn("__efull", least(expr("__d div __a"), lit(maxEpochs.toLong)))
      .withColumn("__rem", when(col("__efull") < maxEpochs,
        col("__d") - col("__efull") * col("__a")).otherwise(lit(0L)))
      .select("source", "__efull", "__rem")
    val joined = base.join(broadcast(plan), "source")
    val full = joined.filter(col("__efull") >= 1L)
      .select(col("source"), explode(sequence(lit(1L), col("__efull"))).as("epoch"),
        col("id"), col("tokens"))
    val cand = joined.filter(col("__rem") > 0L)
    val off = cand.groupBy("source", "__b").agg(sum(col("tokens")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.partitionBy("source").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("source", "__b", "__off")
    val local = Window.partitionBy("source", "__b").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val partial = cand.join(off, Seq("source", "__b"))
      .withColumn("__pre", coalesce(sum(col("tokens")).over(local), lit(0L)) + col("__off"))
      .filter(col("__pre") + col("tokens") <= col("__rem"))
      .select(col("source"), (col("__efull") + 1L).as("epoch"), col("id"), col("tokens"))
    full.unionByName(partial)
  }

  /** Weighted PPS (probability-proportional-to-size) SYSTEMATIC sampling:
    * per group, pick ~`k` rows with inclusion probability ∝ `weight`
    * (token count, quality mass, …) using the classic systematic rule —
    * lay rows on a deterministic md5-ordered line, cumulate weights, and
    * select every row whose weight span crosses a step boundary
    * (`(cum·k) div W` changes). All arithmetic is exact integers, so the
    * kept set is a stable function of (ids, weights, k): reruns, retries,
    * and resizes keep identical rows, and the DuckDB oracle reproduces it
    * bit-for-bit — the auditable alternative to RNG reservoir sampling.
    *
    * A row heavier than W/k spans multiple boundaries but is emitted once,
    * so groups with such rows yield fewer than k (standard PPS behavior —
    * certainty units: any row with w ≥ W/k is ALWAYS selected). Rows much
    * lighter than W/k may be skipped even in small groups — selection
    * count is ≤ min(k, rows), exactly k when no row exceeds W/k.
    *
    * Scale shape: one per-(group, md5-bucket) cumsum window (≤2^16 rows
    * per group in the offsets frame, never a whole-group window — the
    * epochMix two-level prefix-sum pattern) plus one broadcast of
    * per-group totals. No RNG, no collect, no global sort. */
  def ppsSample(df: DataFrame, group: Column, id: Column, weight: Column,
                k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k >= 1, got $k")
    val base = df.select(group.cast("string").as("group"), id.as("id"),
        weight.cast("long").as("w"), TextAnalysis.hashBucket16(id).as("__b"))
      .filter(col("w") > 0)
    val tot = base.groupBy("group").agg(sum(col("w")).as("__wtot"))
    val off = base.groupBy("group", "__b").agg(sum(col("w")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.partitionBy("group").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("group", "__b", "__off")
    val local = Window.partitionBy("group", "__b").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(off, Seq("group", "__b"))
      .withColumn("__pre", coalesce(sum(col("w")).over(local), lit(0L)) + col("__off"))
      .join(broadcast(tot), "group")
      .filter(expr(s"((__pre + w) * ${k}L) div __wtot") >
        expr(s"(__pre * ${k}L) div __wtot"))
      .select(col("group"), col("id"), col("w").as("weight"))
  }
}
