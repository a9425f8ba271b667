package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed training of a LEARNED quality classifier — the
  * FineWeb-Edu/fastText shape: logistic regression over hashed
  * bag-of-words counts, trained full-batch on the cluster and then
  * applied as a stateless scoring gate. No external ML runtime: the model
  * is a 1-D weight table, training is `iters` rounds of one broadcast
  * join + two aggregations, and every quantity that crosses a shuffle is
  * an exact integer.
  *
  * Determinism (the part that makes a distributed trainer auditable):
  *   - features are integer token counts in `buckets` md5-hashed bins
  *     (+ a bias bin), so the margin Σ xⱼ·wⱼ is an exact long in
  *     micro-units;
  *   - each doc's per-bin gradient contribution xⱼ·(y − σ(margin)) is
  *     rounded to micro-units BEFORE the sum — longs add
  *     order-independently, so the gradient is shuffle-order-proof;
  *   - the update w += Σg div (lrDen·N) is exact truncating integer
  *     division of the summed gradient by the mean-normalizer (Spark
  *     `div` and DuckDB `//` both truncate toward zero).
  *   - the squashing function is the ALGEBRAIC sigmoid (softsign),
  *     computed with IEEE correctly-rounded ops only — the logistic's
  *     exp differs across libm implementations in the last ulp, which
  *     micro-rounding amplifies into diverging trajectories.
  *   A rerun, a different partitioning, or the DuckDB oracle therefore
  *   reproduce the weight trajectory bit-for-bit.
  *
  * Scale shape: feats is the big frame (corpus tokens → (id, bin, count));
  * weights are `buckets`+1 rows, always broadcast. Per round: one
  * broadcast join + groupBy(id) sum (margins), one join back + groupBy(bin)
  * sum (gradient) — linear scans, no driver data, rounds are fixed.
  */
object Classifier {

  /** Feature bin for a token: first 8 md5 hex chars of "f:token", mod
    * `buckets` (engine-portable, like the CMS hashing). */
  def featureBin(token: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("f:"), token).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Hashed bag-of-words counts: `(id, j, x)` with token bins 0..buckets-1
    * and a constant bias bin j=buckets (x=1) for every doc. */
  def hashedFeatures(docs: DataFrame, id: Column, text: Column,
                     buckets: Int): DataFrame = {
    val toks = docs.select(id.as("id"),
      explode(filter(split(lower(text), "\\s+"), x => x =!= "")).as("__w"))
    val counts = toks.groupBy(col("id"), featureBin(col("__w"), buckets).as("j"))
      .agg(count(lit(1)).as("x"))
    val bias = docs.select(id.as("id"), lit(buckets.toLong).as("j"), lit(1L).as("x"))
    counts.unionByName(bias)
  }

  /** Train logistic weights on `feats` (= [[hashedFeatures]] output) and
    * `labels` `(id, y)` with y ∈ {0.0, 1.0}. Returns `(j, w_micro)` —
    * `buckets`+1 rows, weights in micro-units. The update divides the
    * SUMMED gradient by `lrDen · |labels|` — i.e. learning rate 1/lrDen on
    * the MEAN gradient, so the weight trajectory (and any calibrated
    * serving threshold) is stable across corpus sizes; an unnormalized
    * full-batch update would scale with N and saturate at 10× the data. */
  def trainLogistic(feats: DataFrame, labels: DataFrame, buckets: Int,
                    iters: Int, lrDen: Long = 10L): DataFrame = {
    require(iters >= 1 && lrDen >= 1, s"bad training knobs ($iters, $lrDen)")
    val spark = feats.sparkSession
    // Pre-partition the feature and label tables by `id` ONCE (guide §2.4
    // "two operations keyed the same way can often share one exchange"):
    // every iteration aggregates margins by id and joins features ⇄
    // margins ⇄ labels on id, which un-partitioned costs two full
    // feature-table shuffles per iteration — O(iters × data) shuffle
    // bytes. Hash-partitioned-and-persisted, the per-id aggregation and
    // both id joins reuse the cached layout (margins inherit it through
    // the broadcast join + aggregation), so the loop's only remaining
    // exchange is the bucket-sized gradient reduce: one data shuffle
    // total, regardless of iteration count. DATA-CONDITIONAL: below
    // ~200k labeled docs the id-joins plan as broadcasts (no shuffle to
    // save — verified in the one-iteration plan: both id-joins are
    // BroadcastHashJoin at small scale), so the upfront shuffle would be
    // pure cost; the layout only pays in the sort-merge regime.
    val lbl = labels.select(col("id"), col("y").cast("double").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLbl = lbl.count()
    val gradDen = lrDen * nLbl // mean-gradient normalization
    require(gradDen > 0, "trainLogistic needs at least one labeled doc")
    val f = (if (nLbl >= 200000L) feats.repartition(col("id")) else feats)
      .persist(StorageLevel.MEMORY_AND_DISK)
    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    try {
      val bins = spark.range(buckets + 1).select(col("id").as("j"))
      var w = bins.withColumn("w", lit(0L)).localCheckpoint(true)
      var wRdds = checkpointRdds(w)
      var t = 0
      while (t < iters) {
        val margins = f.join(broadcast(w), "j")
          .groupBy("id").agg(sum(col("x") * col("w")).as("__dot"))
        // ALGEBRAIC sigmoid (softsign squashing), not the logistic: exp()
        // is not bit-portable across libm implementations (JVM vs DuckDB
        // differ in the last ulp, which the micro-rounding then amplifies
        // into diverging weight trajectories). softsign uses only IEEE
        // correctly-rounded ops (+ × ÷ abs), so both engines produce the
        // identical double — and it is a standard squashing function, not
        // a numerical compromise.
        val half = col("__dot") / lit(2000000.0) // margin/2 in units
        val sig = lit(0.5) + lit(0.5) * half / (lit(1.0) + abs(half))
        // floor(v + 0.5), NOT round(v, 0): Spark's Round goes through
        // BigDecimal.valueOf (shortest-string) while DuckDB rounds the
        // exact binary double — they disagree at .5-adjacent values.
        // floor and + are IEEE-correctly-rounded in both engines, so this
        // half-up is bit-portable (and equals Java Math.round).
        val grad = f.join(margins, "id").join(lbl, "id")
          .select(col("j"),
            floor(col("x") * (col("y") - sig) * lit(1000000.0) + lit(0.5))
              .cast("long").as("__g"))
          .groupBy("j").agg(sum(col("__g")).as("__g"))
        // Spark `div` and DuckDB `//` BOTH truncate toward zero (verified:
        // duckdb `SELECT -7 // 2` → -3), so the negative-gradient update
        // needs no floor adjustment — plain integer division matches
        val next = bins.join(grad, Seq("j"), "left")
          .join(w, "j")
          .select(col("j"),
            (col("w") + expr(s"coalesce(__g, 0L) div ${gradDen}L")).as("w"))
          .localCheckpoint(true)
        val nextRdds = checkpointRdds(next)
        wRdds.foreach(_.unpersist(blocking = false))
        w = next
        wRdds = nextRdds
        t += 1
      }
      w.select(col("j"), col("w").as("w_micro"))
    } finally {
      f.unpersist(blocking = false)
      lbl.unpersist(blocking = false)
    }
  }

  /** Score docs under trained weights: `(id, margin_micro)` — the exact
    * long margin; gate with `margin_micro > 0` (σ > ½) or a calibrated
    * threshold. Stateless — the serving path of the learned filter. */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights.select(col("j"), col("w_micro").as("__w"))), "j")
      .groupBy("id").agg(sum(col("x") * col("__w")).as("margin_micro"))

  /** The DuckDB twin of [[trainLogistic]] + [[score]] for a given feats/
    * labels CTE prelude (must define `feats(id, j, x)` and
    * `labels(id, y)`), unrolled `iters` rounds — generated next to the
    * operator so the algebra can't drift. Emits `(j, w_micro)`. */
  def trainOracleSql(prelude: String, buckets: Int, iters: Int,
                     lrDen: Long = 10L): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH $prelude,
              |bins AS (SELECT r AS j FROM range(${buckets + 1}) t(r)),
              |nn AS (SELECT $lrDen * count(*) AS den FROM labels),
              |w0 AS (SELECT j, CAST(0 AS BIGINT) AS w FROM bins)""".stripMargin
    for (t <- 1 to iters) {
      val p = t - 1
      sb ++= s""",
                |m$t AS (SELECT f.id, CAST(sum(f.x * w.w) AS BIGINT) AS dot
                |        FROM feats f JOIN w$p w USING (j) GROUP BY 1),
                |g$t AS (SELECT f.j,
                |          CAST(sum(CAST(floor(f.x * (l.y - (0.5 + 0.5 * (m.dot / 2000000.0)
                |               / (1.0 + abs(m.dot / 2000000.0))))
                |               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g
                |        FROM feats f JOIN m$t m USING (id) JOIN labels l USING (id)
                |        GROUP BY 1),
                |w$t AS (SELECT bins.j, w.w + coalesce(g.g, 0) // nn.den AS w
                |        FROM bins JOIN w$p w USING (j) LEFT JOIN g$t g ON bins.j = g.j, nn)""".stripMargin
    }
    sb ++= s"""
              |SELECT j, CAST(w AS BIGINT) AS w_micro FROM w$iters ORDER BY j""".stripMargin
    sb.toString
  }

  /** [[trainOracleSql]]'s serving twin: same unrolled training, final
    * SELECT scores every doc — `(id, margin_micro, gate)`. */
  def scoreOracleSql(prelude: String, buckets: Int, iters: Int,
                     lrDen: Long = 10L, idAs: String = "id",
                     gateMicro: Long = 0L): String = {
    val train = trainOracleSql(prelude, buckets, iters, lrDen)
    val cut = train.lastIndexOf("SELECT j,")
    train.substring(0, cut) +
      s"""SELECT f.id AS $idAs, CAST(sum(f.x * w.w) AS BIGINT) AS margin_micro,
         |       CAST(sum(f.x * w.w) > $gateMicro AS BIGINT) AS gate
         |FROM feats f JOIN w$iters w USING (j)
         |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** [[scoreOracleSql]] keeping only gated-in docs — the ingest-gate twin
    * (`(idAs, margin_micro)` where margin > 0). */
  def gateOracleSql(prelude: String, buckets: Int, iters: Int,
                    lrDen: Long = 10L, idAs: String = "id",
                    gateMicro: Long = 0L): String = {
    val train = trainOracleSql(prelude, buckets, iters, lrDen)
    val cut = train.lastIndexOf("SELECT j,")
    train.substring(0, cut) +
      s"""SELECT f.id AS $idAs, CAST(sum(f.x * w.w) AS BIGINT) AS margin_micro
         |FROM feats f JOIN w$iters w USING (j)
         |GROUP BY 1 HAVING sum(f.x * w.w) > $gateMicro ORDER BY 1""".stripMargin
  }
}
