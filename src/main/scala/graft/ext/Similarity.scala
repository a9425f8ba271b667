package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — a map-side nested loop, no shuffle except
  * the final per-query top-k. The LSH variant buckets by random-hyperplane
  * signatures so the join only touches colliding buckets — the 100 TB path
  * (candidates ∝ rows × tables, not rows²).
  *
  * All vector math is higher-order-function expressions (`zip_with` +
  * `aggregate`) — stays inside whole-stage codegen, no UDF.
  */
object Similarity {

  /** Cast array<float> → array<double> (exact; keeps fold order stable). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product — matches a left-to-right summation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Native one-pass expression (graft.functions.VectorExprs): identical
    * IEEE semantics to the sequential-fold HOF formulation, ~50× cheaper
    * (HOFs are interpreted). A zero-norm vector yields null similarity
    * (ranked last) instead of an ANSI divide-by-zero error. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** Rank scored candidates per query with the bounded top-k AGGREGATE
    * (graft.functions.TopKAgg.rankTopK), not a window: a window partition
    * holds a query's ENTIRE candidate set in one task; the aggregate keeps
    * an O(k) heap per map task and ships ≤ k entries per task through the
    * shuffle. Ordering: sim desc, id asc. NULL sims (zero-norm vectors)
    * are deliberately excluded — an unknowable similarity is not a
    * neighbor, so unlike a nulls-last window the output never pads a
    * query's top-k with them. */
  private def rankTopK(scored: DataFrame, k: Int, qId: String, cId: String): DataFrame =
    graft.functions.TopKAgg.rankTopK(scored, col(qId), col("sim"), col(cId), k)
      .select(col("group").as(qId), col("rk"), col("id").as(cId), col("score").as("sim"))

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (ties broken by corpus id asc). `queries` must be small
    * enough to broadcast — the scan is a map-side nested loop over the
    * corpus, and the only shuffle is the O(k)-per-task top-k aggregation. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "query_id", cId: String = "neighbor_id"): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as(qId), toDouble(col("embedding")).as("__qv")))
    val c = corpus.select(col("vec_id").as(cId), toDouble(col("embedding")).as("__cv"))
    val scored = c.join(q, col(qId) =!= col(cId))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k, qId, cId)
  }

  /** Deterministic pseudo-random hyperplanes: `tables` independent sets of
    * `bits` hyperplanes over `dim` dimensions, seeded. */
  def hyperplanes(dim: Int, bits: Int, tables: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Approximate top-k via multi-table random-hyperplane LSH: candidates are
    * corpus rows sharing a bucket with the query in ANY table, scored
    * exactly, top-k per query. Recall grows with `tables`; cost is
    * #tables equi-joins instead of a full cross product. Signatures for all
    * tables × bits come from one native expression pass
    * (graft.functions.VectorExprs.hyperplaneSigs). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, bits: Int = 8, tables: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, tables, seed)
    def bucketed(df: DataFrame, idAs: String): DataFrame = {
      val v = toDouble(col("embedding"))
      df.select(col("vec_id").as(idAs),
        posexplode(graft.functions.VectorExprs.hyperplaneSigs(v, planes)).as(Seq("__t", "__b")))
    }
    // Candidate generation carries IDS ONLY: a row that collides in many
    // tables would otherwise drag its full embedding array through the
    // dedup exchange once per collision (the round-1 scale defect). The
    // distinct runs over two longs; vectors are joined back exactly once
    // per surviving candidate — corpus side via one hash join (AQE turns
    // it broadcast when the candidate set is small), query side broadcast.
    val q = broadcast(bucketed(queries, "query_id"))
    val c = bucketed(corpus, "neighbor_id")
    val candidates = q.as("q").join(c.as("c"),
        col("q.__t") === col("c.__t") && col("q.__b") === col("c.__b")
          && col("q.query_id") =!= col("c.neighbor_id"))
      .select(col("q.query_id"), col("c.neighbor_id"))
      .distinct()
    val qv = broadcast(queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("__qv")))
    val cv = corpus.select(col("vec_id").as("neighbor_id"),
      toDouble(col("embedding")).as("__cv"))
    val scored = candidates
      .join(cv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k, "query_id", "neighbor_id")
  }

  /** IVF coarse quantizer: k-means centroids by spherical Lloyd iterations.
    * Deterministic: seeds are the `nlist` lowest-id vectors; each iteration
    * is ONE distributed pass (assign via the native NearestCentroids
    * expression, re-center via a (cell, dim)-keyed average); only
    * O(nlist × dim) values ever reach the driver. */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 5): Array[Array[Double]] = {
    // every Lloyd iteration re-reads the working set — persist it once for
    // the loop and release before returning (iters+1 scans otherwise)
    val vecs = corpus.select(col("vec_id"), toDouble(col("embedding")).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids = vecs.orderBy("vec_id").limit(nlist)
      .select("__v").collect()
      .map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = vecs.withColumn("__cell",
        element_at(graft.functions.VectorExprs.nearestCentroids(col("__v"), centroids, 1), 1))
      val means = assigned
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__cell", "__dim").agg(avg(col("__x")).as("__m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
      it += 1
    }
    vecs.unpersist()
    centroids
  }

  /** Shared IVF serving path: probe cells per query (broadcast), score the
    * probed cells' rows exactly, bounded top-k. `cells` is the inverted
    * file: (neighbor_id, __cv, __cell). */
  private def ivfServe(queries: DataFrame, cells: DataFrame, k: Int,
                       centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("__qv"))
      .withColumn("__cell", explode(nearestCentroids(col("__qv"), centroids, nprobe))))
    val scored = cells.join(q, Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k, "query_id", "neighbor_id")
  }

  /** IVF approximate top-k: corpus rows land in their nearest-centroid
    * cell (ONE cell each — the inverted file); each query probes its
    * `nprobe` nearest cells and scores those cells' rows exactly. The join
    * is a plain equi-join on the cell id: shuffle is linear in corpus rows
    * (corpus side keyed once) + queries × nprobe. Recall grows with
    * nprobe; nprobe = nlist degenerates to exact brute force. For repeated
    * query batches use [[buildIvfIndex]] + [[ivfTopKIndexed]] — this
    * variant re-quantizes the corpus every call. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    val c = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("__cv"))
      .withColumn("__cell", element_at(nearestCentroids(col("__cv"), centroids, 1), 1))
    ivfServe(queries, c, k, centroids, nprobe)
  }

  /** PERSISTED IVF index: train the coarse quantizer, assign every corpus
    * row to its cell once, and write the inverted file as a
    * bucketed-by-`__cell` sorted catalog table
    * ([[graft.io.Layout.writeBucketed]]). Serving then pays neither
    * re-quantization (the O(rows × nlist × dim) assignment is on disk) nor
    * a corpus shuffle. Returns the centroids a query batch needs. */
  def buildIvfIndex(corpus: DataFrame, table: String, nlist: Int,
                    iters: Int = 5, numBuckets: Int = 16): Array[Array[Double]] = {
    val centroids = kmeansCentroids(corpus, nlist, iters)
    writeIvfIndex(corpus, table, centroids, numBuckets)
    centroids
  }

  /** Assign `corpus` to PRECOMPUTED centroids and (over)write the bucketed
    * inverted file — [[buildIvfIndex]] without the training step, for
    * callers that train on a subset (e.g. to keep a held-out calibration
    * slice for [[IvfDrift]]) or reuse centroids across snapshots. */
  def writeIvfIndex(corpus: DataFrame, table: String,
                    centroids: Array[Array[Double]], numBuckets: Int = 16): Unit = {
    import graft.functions.VectorExprs.nearestCentroids
    val indexed = corpus
      .select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("__cv"))
      .withColumn("__cell", element_at(nearestCentroids(col("__cv"), centroids, 1), 1))
    graft.io.Layout.writeBucketed(indexed, table, "__cell", numBuckets)
  }

  /** Mean cosine of each vector to its assigned (nearest) centroid — the
    * assignment-quality statistic behind IVF index maintenance. One
    * distributed pass (native nearest-centroid assignment + a broadcast
    * join against the O(nlist × dim) centroid table); only the scalar
    * mean reaches the driver. */
  def ivfAssignQuality(corpus: DataFrame, centroids: Array[Array[Double]]): Double = {
    import graft.functions.VectorExprs.nearestCentroids
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("__cell", "__cent"))
    corpus.select(toDouble(col("embedding")).as("__v"))
      .withColumn("__cell", element_at(nearestCentroids(col("__v"), centroids, 1), 1))
      .join(cents, "__cell")
      .agg(avg(cosine(col("__v"), col("__cent"))))
      .first().getDouble(0)
  }

  /** Drift report of an incremental IVF append: if the delta's vectors sit
    * `margin` further (in mean assignment cosine) from the existing
    * centroids than the reference did, the quantizer no longer covers the
    * data and the index should be retrained — the answer to "rebuild or
    * go stale" for a daily-ingest corpus.
    *
    * `refMeanSim` must be measured on build-time data UNSEEN by the
    * k-means training (a held-out calibration slice): quantizers fit
    * their training sample, so train-set quality sits systematically
    * above any unseen batch's (measured ~0.08 mean-cosine gap on the test
    * embeddings) and an in-distribution delta would false-trigger
    * against it. Unseen-vs-unseen, the gap is sampling noise. */
  final case class IvfDrift(refMeanSim: Double, deltaMeanSim: Double, margin: Double) {
    def shouldRetrain: Boolean = deltaMeanSim < refMeanSim - margin
  }

  /** Incremental IVF maintenance — the append path of [[buildIvfIndex]]:
    * assign DELTA vectors to the EXISTING centroids (one narrow pass, no
    * retraining, no base re-scan) and append them to the persisted
    * inverted file ([[graft.io.Layout.appendBucketed]] — new files beside
    * the old per bucket, bucket pruning still holds over base ∪ delta).
    * Serving via [[ivfTopKIndexed]] picks the appended rows up with zero
    * further work. Pair with [[ivfAssignQuality]] + [[IvfDrift]] to decide
    * when appending must give way to a retrain. */
  def appendToIvfIndex(delta: DataFrame, table: String,
                       centroids: Array[Array[Double]], numBuckets: Int = 16): Unit = {
    import graft.functions.VectorExprs.nearestCentroids
    val indexed = delta
      .select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("__cv"))
      .withColumn("__cell", element_at(nearestCentroids(col("__cv"), centroids, 1), 1))
    graft.io.Layout.appendBucketed(indexed, table, "__cell", numBuckets)
  }

  /** Serve a query batch from a persisted index. The probed cell set
    * (≤ queries × nprobe ints — driver-bounded) is pushed as an IN filter
    * on the bucket column, so the scan reads ONLY the buckets holding
    * probed cells (SelectedBucketsCount in the plan) and the corpus side
    * joins with zero shuffle — broadcast probe → scan → score → O(k)
    * top-k. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, queries: DataFrame,
                     indexTable: String, centroids: Array[Array[Double]],
                     k: Int, nprobe: Int): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    val probed = queries
      .select(explode(nearestCentroids(toDouble(col("embedding")), centroids, nprobe)).as("__cell"))
      .distinct().collect().map(_.getInt(0))
    val cells = graft.io.Layout.table(spark, indexTable)
      .filter(col("__cell").isin(probed.map(Integer.valueOf).toSeq: _*))
    ivfServe(queries, cells, k, centroids, nprobe)
  }

  /** Product-quantization codebooks: `m` contiguous subspaces of dim/m,
    * each trained with its own `ksub`-centroid k-means ([[kmeansCentroids]]
    * on the sliced vectors; same determinism — lowest-id seeds, one
    * distributed pass per Lloyd iteration). Subspaces train CONCURRENTLY
    * (independent jobs — wall-clock is one subspace, not m). Result shape:
    * codebooks(s)(j) = sub-centroid j of subspace s. */
  def pqTrain(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 4): Array[Array[Array[Double]]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Await.result(Future.sequence((0 until m).toList.map { s =>
      Future(kmeansCentroids(corpus.select(col("vec_id"),
        slice(col("embedding"), s * subDim + 1, subDim).as("embedding")), ksub, iters))
    }), Duration.Inf).toArray
  }

  /** Encode the corpus into PQ codes: (id, __code array<int> of length m).
    * THIS is the frame to persist at 100 TB — m ints per row instead of
    * dim floats (32× smaller here), the compressed first-pass scan. */
  def pqEncodeDf(corpus: DataFrame, codebooks: Array[Array[Array[Double]]],
                 idAs: String = "neighbor_id"): DataFrame =
    corpus.select(col("vec_id").as(idAs),
      graft.functions.VectorExprs.pqEncode(toDouble(col("embedding")), codebooks).as("__code"))

  /** PQ-ANN top-k with exact re-ranking: the ADC pass scores every CODE
    * against each broadcast query (compressed scan — the corpus's raw
    * vectors never stream through this stage) and keeps `rerank × k`
    * candidates via the bounded-heap aggregate; only those candidates'
    * raw vectors are fetched (one hash join) for the exact cosine that
    * produces the final ranking. Recall is governed by `rerank` and the
    * codebook resolution, verified in-plan by the caller (x41 pattern). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             codebooks: Array[Array[Array[Double]]], rerank: Int = 5): DataFrame =
    pqTopKFromCodes(queries, pqEncodeDf(corpus, codebooks), corpus, k, codebooks, rerank)

  /** [[pqTopK]] serving off a PERSISTED code table (`(neighbor_id, __code)`)
    * — the production shape: encode once per corpus snapshot, serve many
    * query batches off the 32×-smaller frame without re-encoding. */
  /** Mean self-reconstruction cosine of `df`'s vectors under `codebooks`
    * — each vector scored against its OWN PQ code (the ADC expression
    * computes cosine(vector, reconstruction)). This is PQ's drift
    * reference, the [[ivfAssignQuality]] analog: record it at codebook
    * training time on a held-out calibration slice, re-measure on every
    * appended delta, and feed both to [[IvfDrift]] — when a delta's
    * reconstruction quality falls below build-time minus margin, the
    * codebooks no longer span the data and append must give way to a
    * retrain. One narrow pass, scalar out. */
  def pqEncodeQuality(df: DataFrame, codebooks: Array[Array[Array[Double]]]): Double = {
    import graft.functions.VectorExprs.{pqAdcCosine, pqEncode}
    df.select(avg(pqAdcCosine(toDouble(col("embedding")),
        pqEncode(toDouble(col("embedding")), codebooks), codebooks)).as("__q"))
      .first().getDouble(0)
  }

  def pqTopKFromCodes(queries: DataFrame, codes: DataFrame, corpus: DataFrame, k: Int,
                      codebooks: Array[Array[Array[Double]]], rerank: Int = 5): DataFrame = {
    import graft.functions.VectorExprs.pqAdcCosine
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("__qv")))
    val adcScored = codes.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", pqAdcCosine(col("__qv"), col("__code"), codebooks))
    val candidates = graft.functions.TopKAgg
      .rankTopK(adcScored, col("query_id"), col("sim"), col("neighbor_id"), rerank * k)
      .select(col("group").as("query_id"), col("id").as("neighbor_id"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("__cv"))
    val qv = broadcast(queries.select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("__qv")))
    val exact = candidates
      .join(cv, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__cv")))
    rankTopK(exact, k, "query_id", "neighbor_id")
  }

  /** Per-group embedding centroid (dimension-wise mean). One shuffle of
    * (group, dim) pairs with map-side partial aggregation; output is
    * O(#groups × dim) — broadcastable. */
  def groupCentroids(df: DataFrame, group: Column, vec: Column): DataFrame =
    df.select(group.as("group"), posexplode(toDouble(vec)).as(Seq("__dim", "__x")))
      .groupBy("group", "__dim").agg(avg(col("__x")).as("__m"))
      .groupBy("group")
      .agg(transform(array_sort(collect_list(struct(col("__dim"), col("__m")))),
        e => e.getField("__m")).as("centroid"))

  /** Embedding outlier detection: rows whose cosine to their own group's
    * centroid falls below `threshold` (mislabeled, corrupted, or poisoned
    * vectors). Centroids broadcast back — the scan stays one pass, no
    * per-group window. Returns (group, id, sim). */
  def centroidOutliers(df: DataFrame, group: Column, id: Column, vec: Column,
                       threshold: Double): DataFrame = {
    val cents = groupCentroids(df, group, vec)
    df.select(group.as("group"), id.as("id"), toDouble(vec).as("__v"))
      .join(broadcast(cents), "group")
      .withColumn("sim", cosine(col("__v"), col("centroid")))
      .filter(col("sim") < threshold)
      .select(col("group"), col("id"), col("sim"))
  }

  /** Exact cosine near-duplicate pairs (sim ≥ threshold) among all rows —
    * brute force within blocks for verification; LSH at scale. */
  def cosineNearDups(df: DataFrame, threshold: Double): DataFrame = {
    val p = df.select(col("vec_id").as("__id"), toDouble(col("embedding")).as("__v"))
    p.as("a").join(p.as("b"), col("a.__id") < col("b.__id"))
      .withColumn("sim", cosine(col("a.__v"), col("b.__v")))
      .filter(col("sim") >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("sim"))
  }

  /** Cluster-bucketed embedding near-dup pairs — the SCALE path for
    * [[cosineNearDups]], the shape published as SemDeDup (Abbas et al.
    * 2023, arXiv:2303.09540): assign every vector to its nearest k-means
    * centroid and compare pairs only WITHIN a cell. One shuffle on the
    * cell id; the quadratic term is bounded by the largest cell, not the
    * corpus (pick nlist so cells stay ~corpus/nlist; a skewed cell is a
    * retrain signal, see [[IvfDrift]]). By construction an exact
    * duplicate always lands in its twin's cell (same vector, same
    * nearest centroid). The knowing trade vs all-pairs: a NEAR-dup pair
    * straddling a Voronoi boundary is missed unless `nprobe > 1` fans
    * each vector into its n nearest cells (pairs are then deduped, cost
    * scales ×nprobe²/cell-balance — nprobe 2 catches boundary twins at
    * the data's thresholds). */
  def cellCosineNearDups(df: DataFrame, centroids: Array[Array[Double]],
                         threshold: Double, nprobe: Int = 1): DataFrame = {
    import graft.functions.VectorExprs.nearestCentroids
    val p = df.select(col("vec_id").as("__id"), toDouble(col("embedding")).as("__v"))
      .withColumn("__cell", explode(nearestCentroids(col("__v"), centroids, nprobe)))
    p.as("a").join(p.as("b"),
        col("a.__cell") === col("b.__cell") && col("a.__id") < col("b.__id"))
      .withColumn("sim", cosine(col("a.__v"), col("b.__v")))
      .filter(col("sim") >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("sim"))
      .distinct() // nprobe > 1 can surface the same pair from two cells
  }

  /** SemDeDup keep/drop cut over [[cellCosineNearDups]]: drop every
    * vector that near-duplicates a SMALLER id (the deterministic
    * keep-one-per-neighborhood rule; chains collapse toward the minimum
    * id the same way the reference's argmax dedup keeps one row). The
    * hit set is a vanishing fraction → broadcast anti-join, corpus never
    * re-shuffles. */
  def semanticDedup(df: DataFrame, centroids: Array[Array[Double]],
                    threshold: Double, nprobe: Int = 1): DataFrame = {
    val drops = cellCosineNearDups(df, centroids, threshold, nprobe)
      .select(col("id_b").as("__drop_id")).distinct()
    df.join(broadcast(drops), col("vec_id") === col("__drop_id"), "left_anti")
  }
}
