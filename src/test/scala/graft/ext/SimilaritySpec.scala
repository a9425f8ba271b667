package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vector similarity: exact cosine math, brute-force top-k ordering, and
  * LSH recall against the exact baseline on a deterministic corpus.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of parallel vectors is 1, orthogonal is 0, antiparallel is -1") {
    val df = Seq((
      Seq(1.0f, 0.0f), Seq(2.0f, 0.0f), Seq(0.0f, 3.0f), Seq(-1.0f, 0.0f)
    )).toDF("a", "b", "c", "d")
    def cos(x: String, y: String) =
      df.select(Similarity.cosine(Similarity.toDouble(col(x)), Similarity.toDouble(col(y))))
        .first().getDouble(0)
    assert(math.abs(cos("a", "b") - 1.0) < 1e-12)
    assert(math.abs(cos("a", "c")) < 1e-12)
    assert(math.abs(cos("a", "d") + 1.0) < 1e-12)
  }

  // deterministic pseudo-random corpus: 80 vectors in 16 dims
  private def corpus = {
    val rnd = new scala.util.Random(7)
    (0L until 80L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("bruteForceTopK returns k neighbors ranked by descending cosine") {
    val c = corpus
    val out = Similarity.bruteForceTopK(c.filter($"vec_id" === 0), c, 5)
    val rows = out.orderBy("rk").collect()
    assert(rows.length === 5)
    val sims = rows.map(_.getDouble(3))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(!rows.map(_.getLong(2)).contains(0L)) // self excluded
  }

  test("lshTopK achieves ≥60% average recall@5 vs brute force on the corpus") {
    val c = corpus
    val q = c.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // bits=4 on 16-dim gaussian noise: p(bucket hit) ≈ (2/3)^4 per table
    // → expected recall ≈ 1-(1-0.2)^8 ≈ 0.83; bits=6 would sit near 0.5
    val approx = Similarity.lshTopK(q, c, 5, dim = 16, bits = 4, tables = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, nbrs) =>
      approx.getOrElse(qid, Set.empty).intersect(nbrs).size.toDouble / nbrs.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.6, s"avg recall@5 = $avg")
  }

  test("ivfTopK: planted duplicate lands in the probed cell and ranks first") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val planted = c.unionByName(q.withColumn("vec_id", $"vec_id" + 1000L))
    val cents = Similarity.kmeansCentroids(planted, nlist = 8)
    assert(cents.length === 8)
    val out = Similarity.ivfTopK(q, planted, 3, cents, nprobe = 3)
      .filter($"rk" === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 5L).foreach(qid => assert(out(qid) === qid + 1000L))
  }

  test("ivfTopK with nprobe = nlist degenerates to exact brute force") {
    val c = corpus
    val q = c.filter($"vec_id" < 5)
    val cents = Similarity.kmeansCentroids(c, nlist = 4)
    val ivf = Similarity.ivfTopK(q, c, 5, cents, nprobe = 4)
      .select("query_id", "rk", "neighbor_id")
    val bf = Similarity.bruteForceTopK(q, c, 5)
      .select("query_id", "rk", "neighbor_id")
    assert(ivf.exceptAll(bf).isEmpty && bf.exceptAll(ivf).isEmpty)
  }

  test("groupCentroids averages per dimension in order; centroidOutliers flags negations") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(3.0f, 0.0f)),
      (3L, 1, Seq(0.0f, 2.0f)), (4L, 1, Seq(0.0f, 4.0f)),
      (5L, 1, Seq(0.0f, -5.0f)) // negated: cosine to centroid = -1
    ).toDF("vec_id", "label", "embedding")
    val cents = Similarity.groupCentroids(df, $"label", $"embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(0) === Seq(2.0, 0.0))
    assert(cents(1) === Seq(0.0, 1.0 / 3))
    val out = Similarity.centroidOutliers(df, $"label", $"vec_id", $"embedding", -0.7)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(5L))
  }

  test("pqEncode is deterministic and identical vectors share a code") {
    val c = corpus
    val twin = c.filter($"vec_id" === 3).withColumn("vec_id", lit(999L))
    val cb = Similarity.pqTrain(c, m = 4, ksub = 8, iters = 2)
    val codes = Similarity.pqEncodeDf(c.unionByName(twin), cb, idAs = "id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(999L) === codes(3L))
    assert(codes.values.forall(_.length === 4))
    assert(codes.values.forall(_.forall(j => j >= 0 && j < 8)))
  }

  test("pqAdcCosine approximates true cosine (and is exact when recon = vector)") {
    // codebook with a centroid equal to a corpus vector → recon error 0 there
    val v = Array(1.0, 2.0, 3.0, 4.0)
    val cb = Array(
      Array(Array(1.0, 2.0), Array(9.0, 9.0)),
      Array(Array(3.0, 4.0), Array(-9.0, 9.0)))
    val df = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(0, 0))).toDF("q", "code")
    val sim = df.select(graft.functions.VectorExprs.pqAdcCosine($"q", $"code", cb))
      .first().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12) // recon == q exactly
    val off = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(1, 1))).toDF("q", "code")
    val simOff = off.select(graft.functions.VectorExprs.pqAdcCosine($"q", $"code", cb))
      .first().getDouble(0)
    assert(simOff < 1.0) // a wrong code cannot look like a perfect match
  }

  test("pqTopK retrieves a planted identical twin at rank 1 after exact rerank") {
    val c = corpus
    val q = c.filter($"vec_id" < 3)
    val withTwins = c.unionByName(q.withColumn("vec_id", $"vec_id" + 500L))
    val cb = Similarity.pqTrain(withTwins, m = 4, ksub = 8, iters = 2)
    val top1 = Similarity.pqTopK(q, withTwins, 3, cb, rerank = 8)
      .filter($"rk" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1 === Map(0L -> 500L, 1L -> 501L, 2L -> 502L))
  }

  test("pqTopK's ADC stage scans codes, not raw vectors (compressed first pass)") {
    val c = corpus
    val cb = Similarity.pqTrain(c, m = 4, ksub = 8, iters = 2)
    val plan = Similarity.pqTopK(c.filter($"vec_id" < 2), c, 3, cb, rerank = 4)
      .queryExecution.executedPlan.toString
    // the bounded-heap candidate cut must appear (no window over all pairs)
    assert(plan.contains("partial_top_k_by_score"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("cosineNearDups finds planted duplicates") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 20L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    // plant: vec 100 = exact copy of vec 0; vec 101 = slightly perturbed vec 1
    val planted = base ++ Seq(
      (100L, base(0)._2),
      (101L, base(1)._2.map(x => x + 0.01f)))
    val df = planted.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDups(df, 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))
    assert(pairs.contains((1L, 101L)))
  }

  test("cellCosineNearDups equals all-pairs on planted twins; semanticDedup keeps the smaller id") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val planted = (base ++ Seq((100L, base(0)._2), (101L, base(1)._2),
      (102L, base(0)._2))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(planted, nlist = 4, iters = 3)
    val exact = Similarity.cosineNearDups(planted, 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cell = Similarity.cellCosineNearDups(planted, cents, 0.999, nprobe = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical twins always share a cell → the cell pass finds every
    // exact pair the quadratic pass does (incl. the 100-102 twin chain)
    assert(exact.subsetOf(cell) && cell.subsetOf(exact))
    assert(cell.contains((0L, 100L)) && cell.contains((0L, 102L)) && cell.contains((100L, 102L)))
    val kept = Similarity.semanticDedup(planted, cents, 0.999, nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every chain collapses to its minimum id
    assert(kept === (0L until 40L).toSet)
  }

  test("appendToIvfIndex: appended twin served at rank 1 through the same index table") {
    val base = corpus.filter(col("vec_id") >= 10)
    val centroids = Similarity.buildIvfIndex(base, "graft_ivfa_spec", nlist = 4)
    // delta: the query rows themselves plus identical twins at id+100000
    val q = corpus.filter(col("vec_id") < 3)
    val delta = q.unionByName(q.withColumn("vec_id", col("vec_id") + 100000L))
    Similarity.appendToIvfIndex(delta, "graft_ivfa_spec", centroids, numBuckets = 16)
    val top1 = Similarity
      .ivfTopKIndexed(spark, q, "graft_ivfa_spec", centroids, 3, nprobe = 2)
      .filter(col("rk") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach(i => assert(top1(i) === i + 100000L,
      s"appended twin of $i must be served at rank 1"))
  }

  test("IvfDrift: same-distribution delta passes, shifted delta demands retrain") {
    val base = corpus.filter(col("vec_id") % 2 === 0)
    // the drift reference comes from a held-out calibration slice (unseen
    // by k-means, like every future delta) — referencing TRAIN-set quality
    // would false-trigger on any in-distribution delta (quantizers fit
    // their training sample; the gap measures ~0.2 on this tiny corpus)
    val train = base.filter(col("vec_id") % 4 === 0)
    val calib = base.filter(col("vec_id") % 4 =!= 0)
    val sameDist = corpus.filter(col("vec_id") % 2 === 1)
    // a delta the quantizer has never seen anything like: constant offset
    // dominating every component pushes all vectors into one far corner
    val shifted = sameDist.withColumn("embedding",
      transform(col("embedding"), x => x * 0.05f + 8.0f))
    val centroids = Similarity.kmeansCentroids(train, nlist = 4)
    val refQ = Similarity.ivfAssignQuality(calib, centroids)
    assert(!Similarity.IvfDrift(refQ,
      Similarity.ivfAssignQuality(sameDist, centroids), margin = 0.05).shouldRetrain,
      "in-distribution delta must not trigger a retrain")
    assert(Similarity.IvfDrift(refQ,
      Similarity.ivfAssignQuality(shifted, centroids), margin = 0.05).shouldRetrain,
      "out-of-distribution delta must trigger a retrain")
  }
}
