package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/KenLM-style filter: a
  * document whose token stream is improbable under a corpus-trained LM is
  * junk (boilerplate, OCR noise, keyword stuffing), one whose stream is TOO
  * probable is degenerate repetition. This is the canonical "model-based"
  * quality signal that needs no external model: the LM is trained
  * distributed, from the corpus itself.
  *
  * Model: bigram with add-one smoothing over the corpus vocabulary —
  * p(w2|w1) = (C(w1,w2)+1)/(C(w1)+V). Scoring emits EXACT integers (each
  * bigram's −ln p in micro-nats, summed as longs) so the result is
  * order-independent and cross-engine hashable; perplexity is
  * exp(sum/n/1e6) when a float is wanted.
  *
  * Scale shape: two aggregations over the exploded bigram stream (map-side
  * combined), one distinct count for V, then score = stream ⋈ C(w1,w2) ⋈
  * C(w1) — all equi-joins on token keys, linear in corpus tokens; the
  * per-doc reduce is one groupBy. Nothing is ever collected: train and
  * score are a single composed plan.
  */
object LmScore {

  /** (id, w1, w2) bigram stream: whitespace-class split, lowercased, empty
    * tokens dropped ([[Tfidf]]'s tokenization). Docs with <2 tokens emit
    * nothing. */
  private def bigrams(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val arr = filter(split(lower(text), "\\s+"), x => x =!= "")
    docs.select(id.as("id"), arr.as("__t"))
      .select(col("id"), explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }

  /** Per-document LM negative log-likelihood under the self-trained bigram
    * model: (id, n_bigrams, nll_micro) where nll_micro is Σ round(−ln
    * p(w2|w1) × 1e6) as an exact long. `train` defaults to the scored
    * corpus (self-scoring — the deterministic quality-ranking mode); pass
    * a held-out reference corpus to score drift against it. */
  def bigramNll(docs: DataFrame, id: Column, text: Column,
                train: Option[DataFrame] = None,
                materialize: Boolean = true): DataFrame = {
    // the train-side bigram stream feeds two count aggregations — and, in
    // self-train mode, the score join as well (three consumers of the same
    // split/explode lineage, which Spark would otherwise recompute per
    // consumer; the explode IS the dominant cost at corpus scale). Persist
    // it for the duration of the one composed job, materialize the per-doc
    // three-column result eagerly, and release the cache before returning
    // — a library call must not leave cached lineage behind in a
    // long-lived session.
    val scoreStream0 = bigrams(docs, id, text)
    val trainStream = train.map(t => bigrams(t, id, text)).getOrElse(scoreStream0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scoreStream = if (train.isEmpty) trainStream else scoreStream0
    try {
      val c12 = trainStream.groupBy("w1", "w2").agg(count(lit(1)).as("__n12"))
      val c1 = trainStream.groupBy("w1").agg(count(lit(1)).as("__n1"))
      // V = corpus vocabulary (distinct tokens incl. doc-final ones)
      val trainDocs = train.getOrElse(docs)
      val vocab = trainDocs
        .select(explode(filter(split(lower(text), "\\s+"), x => x =!= "")).as("__w"))
        .agg(count_distinct(col("__w")).as("__v"))
      val nll = round(-log((col("__n12") + 1.0) / (col("__n1") + col("__v"))) * 1e6, 0)
        .cast("long")
      val scored = scoreStream
        .join(c12, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
        // unseen bigram/context under a held-out model: C defaults to 0
        .na.fill(0L, Seq("__n12", "__n1"))
        .withColumn("__nll", nll)
        .groupBy("id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("nll_micro"))
      // materialize=false keeps the composed plan inspectable (PlanSpec);
      // production callers keep the eager checkpoint so the cache released
      // below is never re-demanded
      if (materialize) scored.localCheckpoint(true) // blocks freed with the frame
      else scored
    } finally trainStream.unpersist(blocking = false)
  }

  /** Per-document NLL under an interpolated KNESER-NEY bigram model — the
    * smoothing KenLM actually ships (CCNet's filter is a KN 5-gram): the
    * add-one model of [[bigramNll]] over-penalizes frequent-but-bursty
    * tokens, while KN discounts observed mass by a fixed D and backs off
    * to the CONTINUATION probability (how many distinct contexts a word
    * follows), the signal that separates fluent glue words from keyword
    * stuffing:
    *
    *   p(w2|w1) = (max(C(w1,w2) − D, 0) + D · N1+(w1·) · Pcont(w2)) / C(w1·)
    *   Pcont(w2) = N1+(·w2) / N1+(··)
    *
    * Self-train mode (this operator's scope — the deterministic quality
    * ranking): every scored bigram was seen, so C(w1·) ≥ 1 and p ∈ (0, 1].
    * For held-out scoring use [[bigramNll]]'s add-one model, whose C=0
    * fallback is principled; inventing an unseen-history fallback for KN
    * is not.
    *
    * Exactness: counts are integers; p is evaluated in one fixed
    * parenthesization mirrored by the oracle, each bigram emits
    * round(−ln p × 1e6) as a long, and longs sum order-independently.
    *
    * Scale shape: like [[bigramNll]] plus two group-bys OVER THE TYPE
    * TABLE (N1+ statistics aggregate c12, not the stream) — the bigram
    * stream and the type table are each persisted once and released; all
    * joins are token-key equi-joins, nothing collected. */
  def knBigramNll(docs: DataFrame, id: Column, text: Column,
                  discount: Double = 0.75,
                  materialize: Boolean = true): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount in (0,1), got $discount")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val stream = bigrams(docs, id, text).persist(lvl)
    // c12 feeds four consumers (score join + both N1+ stats + the type
    // total); without the persist each would re-run the explode
    val c12 = stream.groupBy("w1", "w2").agg(count(lit(1)).as("__n12")).persist(lvl)
    try {
      val c1 = stream.groupBy("w1").agg(count(lit(1)).as("__n1"))
      val n1fw = c12.groupBy("w1").agg(count(lit(1)).as("__n1fw"))
      val n1pw = c12.groupBy("w2").agg(count(lit(1)).as("__n1pw"))
      val ntypes = c12.agg(count(lit(1)).as("__ntypes"))
      val p = (greatest(col("__n12") - lit(discount), lit(0.0)) +
        lit(discount) * col("__n1fw") * (col("__n1pw") / col("__ntypes"))) / col("__n1")
      val scored = stream
        .join(c12, Seq("w1", "w2"))
        .join(c1, Seq("w1"))
        .join(n1fw, Seq("w1"))
        .join(n1pw, Seq("w2"))
        .crossJoin(broadcast(ntypes))
        .withColumn("__nll", round(-log(p) * 1e6, 0).cast("long"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("__nll")).as("nll_micro"))
      if (materialize) scored.localCheckpoint(true) else scored
    } finally {
      stream.unpersist(blocking = false)
      c12.unpersist(blocking = false)
    }
  }

  /** CCNet-style perplexity bucketing: rank documents by per-bigram LM
    * score ascending (most fluent first) and split the corpus into
    * `head` / `middle` / `tail` at 1/3 and 2/3 of CUMULATIVE TOKEN MASS —
    * CCNet's partition rule (equal token budget per bucket, not equal doc
    * count; a few long fluent docs fill `head`). All arithmetic is exact:
    * per-doc score = nll_micro div n_bigrams (truncating long division),
    * boundaries via `cum×3 ≤ total` / `cum×3 ≤ 2×total` integer
    * comparisons — no float percentile anywhere.
    *
    * Scale shape: [[bigramNll]]'s linear train+score plan, then ONE
    * distributed prefix sum over the per-doc frame ([[graft.ops.PrefixSum]]
    * — the global cumulative order never funnels through a single
    * partition; the (score, id) lexicographic order needs no composite-key
    * packing, so id range never threatens overflow at any SF) and a
    * broadcast one-row total. Docs with <2 tokens have no bigram stream
    * and are not ranked (callers route them to quarantine, not `tail`).
    */
  def perplexityBuckets(docs: DataFrame, id: Column, text: Column,
                        train: Option[DataFrame] = None): DataFrame = {
    // bigramNll materializes eagerly, so the two consumers below (prefix
    // sum + total) read the checkpoint, not the train/score lineage
    val scored = bigramNll(docs, id, text, train)
      .withColumn("avg_micro", expr("nll_micro div n_bigrams"))
    val total = scored.agg(sum(col("n_bigrams")).as("__total"))
    graft.ops.PrefixSum.exclusivePrefixSumMulti(scored, Seq("avg_micro", "id"),
        "n_bigrams", "__cum0")
      .withColumn("__cum", col("__cum0") + col("n_bigrams"))
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        when(col("__cum") * 3 <= col("__total"), lit("head"))
          .when(col("__cum") * 3 <= col("__total") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__cum0", "__cum", "__total")
  }

  /** Corpus collocation mining by pointwise mutual information — the
    * classic association measure (Church & Hanks 1990) that separates
    * genuine multi-word units ("new york") from pairs that co-occur only
    * because both words are frequent ("of the"):
    *
    *   PMI(a,b) = ln( C(ab)·N / (C(a·)·C(·b)) )
    *
    * over the corpus bigram stream, with positional marginals (C(a·) =
    * count of bigrams whose FIRST token is a, C(·b) symmetric) so the
    * three counts live in the same event space and PMI is a true log
    * probability ratio. A `minCount` floor kills the low-count PMI
    * pathology (hapax pairs score highest); the top-`k` surviving pairs
    * by PMI are returned.
    *
    * Exactness: all four inputs are exact longs; the score is emitted as
    * round(PMI × 1e6) micro-nats ([[bigramNll]]'s convention) with one
    * fixed parenthesization mirrored by the oracle — products stay under
    * 2^53, so the doubles entering the division are exact in both engines.
    *
    * Scale shape: three map-side-combined aggregations over one persisted
    * bigram stream, marginal joins are token-key equi-joins on the PAIR
    * TABLE (|pairs| ≪ |stream|), N is a broadcast one-row aggregate, and
    * the top-k is a TakeOrdered (O(k) per partition) — never a global
    * sort of the pair table. */
  def pmiCollocations(docs: DataFrame, id: Column, text: Column,
                      minCount: Long = 5, k: Int = 50,
                      materialize: Boolean = true): DataFrame = {
    val stream = bigrams(docs, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cab = stream.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      val ca = stream.groupBy("w1").agg(count(lit(1)).as("__na"))
      val cb = stream.groupBy("w2").agg(count(lit(1)).as("__nb"))
      val n = stream.agg(count(lit(1)).as("__n"))
      val pmi = round(log((col("n_pair").cast("double") * col("__n")) /
        (col("__na").cast("double") * col("__nb"))) * 1e6, 0).cast("long")
      val scored = cab.filter(col("n_pair") >= minCount)
        .join(ca, Seq("w1"))
        .join(cb, Seq("w2"))
        .crossJoin(broadcast(n))
        .withColumn("pmi_micro", pmi)
        .select("w1", "w2", "n_pair", "pmi_micro")
        .orderBy(col("pmi_micro").desc, col("w1").asc, col("w2").asc)
        .limit(k)
      // release the cache before returning (library-call discipline);
      // the limit is tiny — materializing it eagerly costs nothing.
      // materialize=false keeps the composed plan inspectable (PlanSpec).
      if (materialize) scored.localCheckpoint(true) else scored
    } finally stream.unpersist(blocking = false)
  }
}
