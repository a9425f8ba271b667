package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication: exact, n-gram Jaccard, MinHash+LSH,
  * SimHash. All are pure Catalyst expression pipelines (whole-stage codegen,
  * no UDFs); the only shuffles are the final candidate joins / group-bys.
  *
  * Scale posture (100 TB): exact dedup is a hash group-by on a digest —
  * one shuffle of (digest, id). MinHash-LSH turns the quadratic all-pairs
  * problem into an equi-join on (band, signature) — shuffle is O(rows ×
  * bands), candidates verified exactly afterwards. SimHash gives a compact
  * 64-bit sketch joinable on rotated prefixes.
  */
object TextDedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct k-word shingles. Native expression (graft.functions.TextExprs)
    * — the HOF formulation (`transform` over `sequence` with per-position
    * `concat_ws`) is interpreted, not codegen'd, and dominated the dedup
    * runtime. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.TextExprs.wordShingles(text, k)

  /** Exact set Jaccard of two shingle arrays — integer size ratio, so the
    * double result is bit-deterministic across engines. Native compiled
    * expression (the array_intersect/array_union formulation was the
    * all-pairs-verifier bottleneck). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.TextExprs.jaccardSim(a, b)

  /** Content digest for exact dedup (md5 hex of the raw text). */
  def digest(text: Column): Column = md5(text.cast("binary"))

  /** Exact dedup: keep the min-`order` row per text digest. One shuffle. */
  def dedupExact(df: DataFrame, text: Column, order: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(digest(text)).orderBy(order.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: `numHashes` permutation-min values over the shingle
    * set. Native single-pass expression — one XXH64 per shingle plus a
    * cheap per-permutation remix, in a compiled loop (the HOF fold was
    * interpreted and ~100× slower). */
  def minhashSignature(shingleSet: Column, numHashes: Int = 64): Column =
    graft.functions.TextExprs.minhashSig(shingleSet, numHashes)

  /** Per-document LSH band hashes: (id, band index, band hash) — one row
    * per band, the joinable form of a MinHash signature. This is also the
    * shape to PERSIST for incremental dedup: write the history's band
    * table bucketed on (band, bh) once and every ingest equi-joins into it
    * without recomputing history signatures. */
  def bandHashes(df: DataFrame, id: Column, sig: Column, rowsPerBand: Int = 2): DataFrame =
    df.select(id.as("__id"), sig.as("__sig"))
      .withColumn("__nb", (size(col("__sig")) / rowsPerBand).cast("int"))
      .withColumn("__band", explode(sequence(lit(0), col("__nb") - 1)))
      .withColumn("__bh", xxhash64(col("__band"),
        slice(col("__sig"), col("__band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select(col("__id"), col("__band"), col("__bh"))

  /** LSH banding: candidate pairs whose signatures agree on ≥1 band of
    * `rowsPerBand` consecutive minhashes. Returns (idA, idB) with idA < idB,
    * distinct. Equi-join on (band index, band hash) — linear shuffle.
    */
  def lshCandidates(df: DataFrame, id: Column, sig: Column, rowsPerBand: Int = 2): DataFrame = {
    val withSig = bandHashes(df, id, sig, rowsPerBand)
    val a = withSig.as("a")
    val b = withSig.as("b")
    a.join(b, col("a.__band") === col("b.__band") && col("a.__bh") === col("b.__bh")
        && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline with exact-Jaccard verification:
    * returns (id_a, id_b, jacc) for pairs with Jaccard ≥ threshold.
    * False positives from banding are removed by the exact check; recall is
    * 1-(1-s^r)^b (≈1 for s ≥ threshold with r=2, b=32).
    */
  def minhashNearDups(df: DataFrame, id: Column, text: Column,
                      k: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 2,
                      threshold: Double = 0.8): DataFrame = {
    val prepared = df.select(id.as("__id"), shingles(text, k).as("__sh"))
    val sigs = prepared.withColumn("__sig", minhashSignature(col("__sh"), numHashes))
    val cands = lshCandidates(sigs, col("__id"), col("__sig"), rowsPerBand)
    val sh = prepared.select(col("__id"), col("__sh"))
    cands
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sha"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__shb"), "id_b")
      .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
      .filter(col("jacc") >= threshold)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }

  /** EXACT set-similarity self-join via prefix filtering — the PPJoin
    * family's candidate rule (Xiao, Wang, Lin & Yu, "Efficient Similarity
    * Joins for Near Duplicate Detection", WWW 2008): order the shingle
    * universe by ascending corpus frequency, and for a Jaccard threshold
    * τ = num/den each document exposes only its |s| − ⌈τ·|s|⌉ + 1 RAREST
    * shingles; any pair with J ≥ τ must share an exposed shingle, so the
    * equi-join on exposed shingles is a complete candidate generator —
    * recall is exactly 1 BY THEOREM, not 1−ε by sketch luck (the
    * difference from [[minhashNearDups]]: same output contract, no
    * probabilistic caveat, at the cost of a frequency-ordering pass).
    * Returns (id_a, id_b, jacc) with id_a < id_b for all pairs with
    * exact Jaccard ≥ num/den.
    *
    * Scale shape: one map-side-combined frequency count over the exploded
    * shingle stream; the frequency ORDER is realized with no global pass
    * at all — the theorem needs any one CONSISTENT total order on the
    * shingle universe, and the (count, shingle) pair compared
    * lexicographically IS one, so each document just sorts its own tiny
    * (count, shingle) array and exposes the first L entries (a dense
    * global RANK — the first formulation here — is not only unnecessary,
    * it is an anti-pattern: shingle frequencies are Zipfian, almost every
    * shingle is a hapax, and any count-bucketed global-rank pass
    * serializes on the count=1 bucket — the 100× curve caught exactly
    * that at 16.9× wall for 10× rows); candidates come from an equi-join
    * on PREFIX shingles only — each key is among some document's rarest
    * shingles, so per-key fan-out is bounded and the quadratic blowup of
    * naive token blocking never materializes; an integer length filter
    * (den·|A| ≥ num·|B| both ways) prunes before verification; exact
    * Jaccard runs only on surviving candidates via the compiled
    * [[jaccard]] expression.
    *
    * The prefix length uses EXACT integer arithmetic (⌈num·s/den⌉ via
    * `(num·s + den − 1) div den`) — a double `ceil(0.8 × s)` rounds the
    * wrong way when 0.8·s lands on an integer (0.8 is not a binary
    * double), silently shrinking the prefix and breaking the
    * completeness theorem. */
  def prefixFilterNearDups(df: DataFrame, id: Column, text: Column,
                           k: Int = 3, tauNum: Int = 4, tauDen: Int = 5,
                           materialize: Boolean = true): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum < tauDen, "need 0 < num/den < 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // shingle arrays feed the frequency pass, the prefix explode, and both
    // verification joins — one shingling pass, not four
    val sh = df.select(id.as("__id"), shingles(text, k).as("__sh")).persist(lvl)
    try {
      // work on 64-bit shingle hashes from here: the order key and join
      // key become two longs instead of strings (cheaper sort, collect,
      // shuffle). A hash collision can only MERGE two shingles — a
      // superset of candidates and a consistent (merged-count) order —
      // so completeness is unaffected and the exact verify still decides.
      val toks = sh.select(col("__id"), explode(col("__sh")).as("__t"))
        .select(col("__id"), xxhash64(col("__t")).as("__h"))
      val freq = toks.groupBy("__h").agg(count(lit(1)).as("__n"))
      // rarest-first CONSISTENT order without a global rank: sort each
      // doc's own (count, hash) pairs — struct comparison is
      // lexicographic, so every doc orders the shared universe
      // identically
      val docOrd = toks.join(freq, "__h")
        .groupBy("__id")
        .agg(sort_array(collect_list(struct(col("__n"), col("__h")))).as("__ord"))
        .withColumn("__sz", size(col("__ord")))
      // EXTENDED prefix (Xiao et al.'s rule at q=2, cf. Wang et al. 2012's
      // adaptive l = |s| − α + q): any valid partner needs overlap
      // α ≥ ⌈τ·|s|⌉ ≥ 2 once |s| ≥ 2, and sets with overlap ≥ α share
      // ≥ 2 elements of their (|s| − α + 2)-prefixes — so requiring TWO
      // prefix collisions is still recall-1, and it collapses the flood
      // of chance single-collision candidates that made verification the
      // sf10 bottleneck (5.5M candidates for ~20k true pairs). The only
      // pairs allowed α ≤ 1 are those with num·(|A|+|B|) ≤ num+den —
      // single-shingle docs — which keep the 1-collision rule.
      // `div`, not `/`: Column./ on integers is DOUBLE division in Spark
      val prefixLen = expr(
        s"cast(least(__sz, __sz - ((__sz * $tauNum + $tauDen - 1) div $tauDen) + 2) as int)")
      val prefixes = docOrd
        .withColumn("__p", explode(slice(col("__ord"), lit(1), prefixLen)))
        .select(col("__id"), col("__sz"), col("__p.__h").as("__ph"))
      val cands = prefixes.as("a").join(prefixes.as("b"),
          col("a.__ph") === col("b.__ph") && col("a.__id") < col("b.__id") &&
            col("a.__sz") * tauDen >= col("b.__sz") * tauNum &&
            col("b.__sz") * tauDen >= col("a.__sz") * tauNum)
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          col("a.__sz").as("__sza"), col("b.__sz").as("__szb"))
        .groupBy("id_a", "id_b", "__sza", "__szb")
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= 2 ||
          (col("__sza") + col("__szb")) * tauNum <= tauNum + tauDen)
        .select(col("id_a"), col("id_b"))
      val tau = tauNum.toDouble / tauDen
      val out = cands
        .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sha")), "id_a")
        .join(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")), "id_b")
        .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
        .filter(col("jacc") >= tau)
        .select(col("id_a"), col("id_b"), col("jacc"))
      // eager so the cache below releases without lazy re-demand;
      // materialize=false keeps the composed plan inspectable (PlanSpec)
      if (materialize) out.localCheckpoint(true) else out
    } finally sh.unpersist(blocking = false)
  }

  /** Incremental MinHash near-dup at INGEST time: near-duplicate pairs
    * between a NEW batch and the already-ingested history — the cross-set
    * companion of [[minhashNearDups]] (which dedups a corpus against
    * itself). Returns (new_id, hist_id, jacc) for every cross pair with
    * exact Jaccard ≥ threshold; candidates come from a band equi-join of
    * the two band tables, so the shuffle is O(rows × bands) on each side
    * and never a self-join of the combined corpus.
    *
    * At 100 TB the history's band table is the thing to precompute:
    * [[bandHashes]] written bucketed on (band, bh) serves every future
    * ingest without recomputing history signatures (mirrors the persisted
    * IVF index pattern in [[Similarity]]). Here both sides derive from
    * text for the self-contained form. */
  def minhashNearDupsAgainst(newDf: DataFrame, newId: Column, newText: Column,
                             history: DataFrame, histId: Column, histText: Column,
                             k: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 2,
                             threshold: Double = 0.8): DataFrame = {
    // each side's shingle+minhash lineage feeds BOTH the band join and the
    // exact-Jaccard verification joins — persist so the signature pass (the
    // dominant cost at scale) runs once per side, not twice. The hit set is
    // a vanishing fraction of either input, so it is materialized EAGERLY
    // (localCheckpoint) and both signature caches released before returning
    // — the intended per-ingest-batch caller must not accumulate cached
    // lineage across a long-lived session. (At 100 TB pass precomputed
    // signature tables and skip prep entirely.)
    def prep(df: DataFrame, id: Column, text: Column) =
      df.select(id.as("__id"), shingles(text, k).as("__sh"))
        .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val np = prep(newDf, newId, newText)
    val hp = prep(history, histId, histText)
    try {
      val cands = bandHashes(np, col("__id"), col("__sig"), rowsPerBand).as("n")
        .join(bandHashes(hp, col("__id"), col("__sig"), rowsPerBand).as("h"),
          col("n.__band") === col("h.__band") && col("n.__bh") === col("h.__bh"))
        .select(col("n.__id").as("new_id"), col("h.__id").as("hist_id"))
        .distinct()
      cands
        .join(np.select(col("__id").as("new_id"), col("__sh").as("__sha")), "new_id")
        .join(hp.select(col("__id").as("hist_id"), col("__sh").as("__shb")), "hist_id")
        .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
        .filter(col("jacc") >= threshold)
        .select(col("new_id"), col("hist_id"), col("jacc"))
        .localCheckpoint(true) // eager: hits only, frees checkpoint blocks with the frame
    } finally {
      np.unpersist(blocking = false)
      hp.unpersist(blocking = false)
    }
  }

  /** The ingest filter companion: NEW rows that near-duplicate nothing in
    * the history (anti-join on the hit set — hits are a vanishing fraction,
    * so the anti-join side stays tiny). */
  def dropNearDupsOfHistory(newDf: DataFrame, newId: Column, newText: Column,
                            history: DataFrame, histId: Column, histText: Column,
                            k: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 2,
                            threshold: Double = 0.8): DataFrame = {
    val hits = minhashNearDupsAgainst(newDf, newId, newText, history, histId, histText,
      k, numHashes, rowsPerBand, threshold)
      .select(col("new_id").as("__dup_id")).distinct()
    newDf.join(broadcast(hits), newId === col("__dup_id"), "left_anti")
  }

  /** Persistable per-document signature artifact: (doc_id, sh, sig) — the
    * history table a continuous ingest gate APPENDS per batch so history
    * text is never re-shingled (the streaming composition of [[x39]]'s
    * batch shape; see [[graft.streaming.NearDupGate]]). Shingles ride
    * along because the exact-Jaccard verification join needs them; a
    * recall-only band gate could drop the column and store 64 longs per
    * doc. At 100 TB additionally bucket-write the exploded [[bandHashes]]
    * on (band, bh) — here bands derive from `sig` in one narrow map, no
    * shuffle. */
  def signatureTable(df: DataFrame, id: Column, text: Column,
                     k: Int = 3, numHashes: Int = 64): DataFrame =
    df.select(id.as("doc_id"), shingles(text, k).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

  /** Cross-set near-dups of a NEW batch's signature table against a
    * persisted history signature table — [[minhashNearDupsAgainst]] for
    * the case where both sides are already signed: no text recompute, the
    * band equi-join and the verification joins read the artifact directly.
    * Returns (new_id, hist_id, jacc) with exact Jaccard ≥ threshold. */
  def nearDupsAgainstSigTable(newSigs: DataFrame, histSigs: DataFrame,
                              rowsPerBand: Int = 2, threshold: Double = 0.8): DataFrame = {
    val cands = bandHashes(newSigs, col("doc_id"), col("sig"), rowsPerBand).as("n")
      .join(bandHashes(histSigs, col("doc_id"), col("sig"), rowsPerBand).as("h"),
        col("n.__band") === col("h.__band") && col("n.__bh") === col("h.__bh"))
      .select(col("n.__id").as("new_id"), col("h.__id").as("hist_id"))
      .distinct()
    cands
      .join(newSigs.select(col("doc_id").as("new_id"), col("sh").as("__sha")), "new_id")
      .join(histSigs.select(col("doc_id").as("hist_id"), col("sh").as("__shb")), "hist_id")
      .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
      .filter(col("jacc") >= threshold)
      .select(col("new_id"), col("hist_id"), col("jacc"))
  }

  /** All-pairs exact shingle-Jaccard within a blocking key (for oracle-sized
    * data / verification; quadratic within blocks — use LSH at scale). */
  def exactNearDups(df: DataFrame, id: Column, text: Column, block: Column,
                    k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val p = df.select(id.as("__id"), block.as("__blk"), shingles(text, k).as("__sh"))
    val a = p.as("a")
    val b = p.as("b")
    a.join(b, col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .withColumn("jacc", jaccard(col("a.__sh"), col("b.__sh")))
      .filter(col("jacc") >= threshold)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("jacc"))
  }

  /** Line-level boilerplate removal (the C4/RefinedWeb trick): a non-empty
    * line occurring in ≥ `minDocs` DISTINCT documents is boilerplate
    * (headers, footers, "subscribe" calls); strip it from every document,
    * preserving surviving-line order. Returns (doc_id, clean_text) for
    * every input doc (all-boilerplate docs yield "").
    *
    * Scale posture: explode → per-line distinct-doc count (two-shuffle
    * partial agg; the boilerplate lines ARE the hot keys, and partial
    * aggregation collapses them map-side) → anti-join (boilerplate set is
    * small → AQE broadcasts) → one groupBy(doc) rebuild. All linear; no
    * driver-side text. */
  def dedupLines(df: DataFrame, id: Column, text: Column, minDocs: Long,
                 sep: String = ". "): DataFrame = {
    val ids = df.select(id.as("doc_id"))
    val lines = df.select(id.as("doc_id"),
      posexplode(split(text, java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
    // empty lines never count as boilerplate: stripping them would collapse
    // separator runs and mangle the rejoin
    val boiler = lines.filter(length(col("line")) > 0)
      .groupBy("line").agg(countDistinct(col("doc_id")).as("__n"))
      .filter(col("__n") >= minDocs)
      .select("line")
    val rebuilt = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        e => e.getField("line")), sep).as("clean_text"))
    ids.join(rebuilt, Seq("doc_id"), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  /** Connected components over near-dup pairs by hash-min label
    * propagation: each node's component label starts at its own id and
    * iteratively drops to the smallest id among itself and its neighbours,
    * so the fixpoint labels every node with the minimum id reachable in its
    * component — turning pairwise near-dup hits into dedup GROUPS (keep the
    * min-id canonical doc per group, drop the rest).
    *
    * Each round is one edge→label equi-join plus one min-aggregate, then a
    * POINTER-JUMPING compression (comp(n) ← comp(comp(n)), one more
    * self-equi-join) — all linear shuffles on ids only (two longs per row;
    * no payloads ride the exchange). Compression makes the reach double
    * per round, so rounds needed ≈ log₂(largest component diameter) — a
    * million-node chain converges in ~20 rounds, not a million (the 100×
    * scale answer; near-dup clusters themselves are shallow anyway).
    * Convergence is detected by the strictly-decreasing Σcomp (decimal —
    * no overflow), one scalar agg per round. Round state is
    * localCheckpoint'ed (the canonical lineage truncation for iterative
    * Spark — the self-join would otherwise double the logical plan per
    * round) and every superseded round's blocks are released by RDD id as
    * soon as the next round lands, so block-manager usage stays at one
    * live label copy regardless of round count. The returned frame reads
    * from its checkpoint blocks (freed by the ContextCleaner when the
    * frame is collected); on a real cluster prefer
    * `spark.sparkContext.setCheckpointDir` + reliable checkpoints if
    * executor loss must be survivable mid-job.
    *
    * `nodes`/`nodeCol`: the full id universe (singletons label themselves).
    * `pairs`: (id_a, id_b) edges, e.g. [[minhashNearDups]] output. */
  def connectedComponents(nodes: DataFrame, nodeCol: Column, pairs: DataFrame,
                          maxIters: Int = 25): DataFrame = {
    // materialize the (two-longs-per-row) edge list once: every round joins
    // it, and without the persist each round would recompute the upstream
    // pair pipeline (e.g. the whole MinHash-LSH run) from scratch
    // keyed by the round-join key `v` ONCE (guide §2.4): every hash-min
    // round joins `edges.v = labels.node`, and a checkpointed label table
    // reports UnknownPartitioning, so an unkeyed edge cache re-shuffled
    // the EDGE LIST every round — keyed, rounds shuffle only the
    // node-sized label table
    val edges = pairs.select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .unionByName(pairs.select(col("id_b").cast("long").as("u"), col("id_a").cast("long").as("v")))
      .repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Dataset.unpersist can't release localCheckpoint blocks (it only talks
    // to the CacheManager), so superseded rounds are freed by unpersisting
    // the checkpointed RDD itself — pulled out of the frame's own LogicalRDD
    // leaf, never by diffing the context-global persisted-RDD map (that
    // diff would sweep blocks persisted by CONCURRENT jobs in the same
    // session, e.g. Cleaning.imputeMode's parallel aggregates).
    // NEVER release a live frame's RDDs — checkpoint blocks are the only
    // copy once lineage is truncated.
    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    def release(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
      rdds.foreach(_.unpersist(blocking = false))

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)

    var labels = nodes.select(nodeCol.cast("long").as("node")).distinct()
      .withColumn("comp", col("node")).localCheckpoint(true)
    var labelRdds = checkpointRdds(labels)
    var prevSum = labelSum(labels)
    if (prevSum == null) { // empty node set: trivially converged
      edges.unpersist()
      return labels
    }
    // SCALE-ADAPTIVE round width (same rule as LinkGraph.pageRankPico):
    // every round shuffles node-sized label tables; width derives from the
    // measured node count instead of the session constant, so a small
    // label set stops paying sessionWidth task launches per stage while a
    // big one keeps the configured width. The label count is a cheap scan
    // of the already-checkpointed blocks. Restored in the finally.
    val n = labels.count()
    val sess = nodes.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    val sessionWidth = scala.util.Try(prevParts.toLong).getOrElse(200L)
    val iterParts = math.min(sessionWidth, n / 100000L + 1L)
    sess.conf.set("spark.sql.shuffle.partitions", iterParts)
    // same data-conditional gate as pageRankPico: at the measured width of
    // one partition per exchange, adaptive re-planning has nothing to
    // coalesce or skew-split — it only adds a planning round + a job per
    // exchange to EVERY CC round. Wider label sets keep AQE untouched.
    val prevAqe = sess.conf.get("spark.sql.adaptive.enabled")
    if (iterParts == 1L) sess.conf.set("spark.sql.adaptive.enabled", "false")
    var it = 0
    var done = false
    try {
    while (!done && it < maxIters) {
      val nbrMin = edges.join(labels, edges("v") === labels("node"))
        .groupBy(col("u")).agg(min(col("comp")).as("__nbrComp"))
      // materialize the hash-min step ONCE (eager checkpoint) so the
      // pointer-jumping self-join below reads its blocks twice instead of
      // recomputing the labels⋈nbrMin join on both sides — and so the
      // round's lineage stays flat (the self-join would otherwise double
      // the logical plan per round; plan stringification alone OOMs ~8
      // rounds in)
      val stepped = labels.join(nbrMin, labels("node") === nbrMin("u"), "left")
        .select(labels("node"),
          least(col("comp"), coalesce(col("__nbrComp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val steppedRdds = checkpointRdds(stepped)
      // pointer jumping: follow the label one more hop (comp is itself a
      // node id, so its own label exists); labels only ever decrease, so
      // compression preserves the fixpoint while doubling reach per round
      val next = stepped.as("a")
        .join(stepped.as("b"), col("a.comp") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.comp"), col("a.comp")).as("comp"))
        .localCheckpoint(false) // lazy: the labelSum action materializes it
      val nextRdds = checkpointRdds(next)
      val s = labelSum(next)
      release(labelRdds ++ steppedRdds) // superseded: old labels + this round's step
      labels = next
      labelRdds = nextRdds
      done = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
    }
    } finally {
      sess.conf.set("spark.sql.shuffle.partitions", prevParts)
      sess.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    edges.unpersist()
    if (!done) {
      release(labelRdds)
      // silently-partial labels would split one true component into several
      // "groups", each keeping its own canonical doc — fail loudly instead
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds of " +
          "doubling reach; the graph is pathological — raise maxIters")
    }
    labels
  }

  /** 64-bit SimHash over the token multiset: bit i of the sketch is the
    * sign of Σ_tokens (bit i of hash(token) ? +1 : −1). Native expression
    * (compiled loop; the HOF formulation allocated a 64-element array per
    * token per row). */
  def simhash(text: Column): Column = graft.functions.TextExprs.simhash64(text)

  /** SimHash near-dup pairs within a blocking key: hamming(sketch) ≤ maxDist. */
  def simhashNearDups(df: DataFrame, id: Column, text: Column, block: Column,
                      maxDist: Int = 8): DataFrame = {
    val p = df.select(id.as("__id"), block.as("__blk"), simhash(text).as("__sh"))
    val a = p.as("a")
    val b = p.as("b")
    a.join(b, col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .withColumn("hamming", bit_count(col("a.__sh").bitwiseXOR(col("b.__sh"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"), col("hamming"))
  }
}
