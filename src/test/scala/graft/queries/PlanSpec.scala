package graft.queries

import graft.SparkSpec

/** Physical-plan assertions for the core queries — the properties that
  * matter at 100 TB, checked at any scale: filters/projections reach the
  * parquet scan, small dimensions broadcast, top-k never globally sorts,
  * and shuffle counts stay at the theoretical minimum.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.queries(name)(spark, d).queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(p).size

  test("q03: predicate AND projection pushed into the parquet scan") {
    val p = plan("q03_filter_project")
    // (toString truncates long fields — assert on stable prefixes)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)"), p)
    // pruned scan: only the 5 referenced columns appear in the FileScan list
    assert(p.contains("FileScan parquet [l_orderkey#"), p)
    assert(!p.contains("l_tax"), s"q03 scan must prune unreferenced columns:\n$p")
  }

  test("q17: dimension broadcast + TakeOrderedAndProject (no global sort)") {
    val p = plan("q17_top_customers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q20: multi-way join keeps small dims on the broadcast side") {
    val p = plan("q20_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q02: single-shuffle aggregation with map-side partial aggregation") {
    val p = plan("q02_pricing_summary")
    // partial + final aggregation pairs around exactly one agg exchange
    // (plus the presentation sort's range exchange)
    assert(p.contains("partial_"), p)
    assert(exchanges(p) <= 2, s"expected ≤2 shuffles (agg + orderBy), got:\n$p")
  }

  test("q06: anti-join is a join, not a cartesian filter") {
    val p = plan("q06_anti_join")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q01 events scan prunes to the referenced columns") {
    val p = plan("q01_hourly_demand")
    // only ts and value are needed
    assert(!p.contains("props"), s"events scan should prune the wide props column:\n$p")
  }

  test("x03: LSH candidate generation contains no cartesian product") {
    val p = plan("x03_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x06: candidate-dedup exchange carries ids only, never embedding arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.ArrayType
    val qe = Registry.queries("x06_ann_lsh")(spark, d).queryExecution
    val shuffles = qe.executedPlan.collect { case e: ShuffleExchangeLike => e }
    // raw embedding vectors must never ride a shuffle of the candidate set
    // (the round-1 defect: distinct() over (ids, __qv, __cv) hashed and
    // compared whole arrays); the only array allowed through an exchange is
    // the top-k agg's bounded ≤ k struct buffer
    assert(!shuffles.exists(_.child.output.exists(a =>
      (a.name == "__qv" || a.name == "__cv") && a.dataType.isInstanceOf[ArrayType])),
      s"embedding arrays must not ride an exchange:\n${qe.executedPlan}")
  }

  test("x22: per-group top-n is a two-phase bounded aggregate, not a window") {
    val p = plan("x22_quality_topn")
    assert(p.contains("partial_top_k_by_score"), p) // map-side O(k) heaps
    assert(!p.contains("Window"), s"top-n must not fall back to a window:\n$p")
  }

  test("x27: verify pass filters by candidate set pre-aggregation, no join shuffle") {
    // (the sketch itself runs eagerly inside heavyHitters — its two-phase
    // partial_freq_sketch shape is pinned in FreqAggSpec.) x27 itself runs
    // persistItems=true, whose returned frame is an eager checkpoint (the
    // verify plan is hidden behind a Scan ExistingRDD), so the shape is
    // pinned on the default recompute path with the same inputs.
    import org.apache.spark.sql.functions._
    val toks = graft.Tables.documents(spark, d)
      .withColumn("text", concat(col("text"), repeat(lit(" graftheavytoken"), 3)))
      .select(explode(graft.ext.TextDedup.tokens(col("text"))).as("token"))
    val p = graft.ext.Curation.heavyHitters(toks, col("token"), k = 999, minCount = 1000L)
      .orderBy("item").queryExecution.executedPlan.toString
    assert(p.contains("INSET") || p.contains(" IN ("), p) // candidate filter on the scan side
    assert(!p.contains("Join"), s"exact pass must not join the token stream:\n$p")
    assert("(?<!Broadcast)Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("x54: URL extraction is a narrow map — no joins, one presentation sort") {
    val p = plan("x54_url_extract")
    assert(!p.contains("Join"), s"link stats must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x55 shape: LM train+score is equi-joins + one broadcast one-row vocab") {
    // the production call eagerly checkpoints (the plan hides behind a
    // Scan ExistingRDD); materialize=false exposes the composed plan
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, d)
    val p = graft.ext.LmScore.bigramNll(docs, col("doc_id"), col("text"),
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join is the broadcast of the ONE-ROW vocab agg
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("partial_count"), s"count aggs must map-side combine:\n$p")
  }

  test("x58: big-vocab BPE encode is a narrow map over a pruned scan") {
    val p = plan("x58_bpe_big_vocab")
    assert(!p.contains("Join"), s"tokenization must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x67/x68: image resize and PCM energy stay narrow per-row pipelines") {
    Seq("x67_image_resize", "x68_wav_energy").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Join"), s"$name must not join anything:\n$p")
      assert(exchanges(p) <= 1, s"$name: only the orderBy range exchange is allowed:\n$p")
      assert(!p.contains("BatchEvalPython") && !p.contains("ArrowEvalPython"), p)
    }
  }

  test("x69: HTML extraction is a narrow map over a pruned documents scan") {
    val p = plan("x69_html_extract")
    assert(!p.contains("Join"), s"extraction must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x50: media encode/decode round-trip is per-row expressions, no shuffle but the sort") {
    val p = plan("x50_media_decode")
    assert(!p.contains("Join"), p)
    assert(exchanges(p) <= 1, s"header decode must stay narrow:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ArrowEvalPython"), p)
  }

  test("x56: appended-IVF serve scans only the probed buckets, corpus never shuffles") {
    val p = plan("x56_ann_ivf_append")
    assert(p.contains("SelectedBucketsCount"),
      s"probed-cell IN filter must prune buckets:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe side must broadcast:\n$p")
    // top-k agg exchange + presentation sort; the corpus side contributes none
    assert(exchanges(p) <= 2, s"corpus rows must not shuffle before top-k:\n$p")
  }

  test("x64 shape: DSIR scoring is one token⋈weight equi-join + one broadcast totals row") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, d)
    val p = graft.ext.Dsir.importanceScores(docs, col("doc_id"), col("text"),
        col("lang") === "en", materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join is the broadcast of the ONE-ROW totals agg
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("partial_count"), s"count aggs must map-side combine:\n$p")
    // selection is a bounded top-k, never a global sort
    val sel = Registry.queries("x64_dsir_resample")(spark, d)
      .queryExecution.executedPlan.toString
    assert(sel.contains("TakeOrderedAndProject"), sel)
  }

  test("x65: Gopher rules are a narrow map — no joins, one presentation sort") {
    val p = plan("x65_gopher_rules")
    assert(!p.contains("Join"), s"rule signals must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x66 shape: span removal is digest equi-joins + per-doc covered sets — the corpus token stream never shuffles") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, d)
    val p = graft.ext.ExactSubstr.removeRepeatedSpans(docs, col("doc_id"),
        col("text"), k = 8, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), s"shingle agg must map-side combine:\n$p")
    // covered positions collapse to ONE set per doc (partial collect_set =
    // map-side combined) and the rebuild is a per-row array projection —
    // the old shape's corpus-wide posexplode + (id, pos) anti join + kept-
    // token re-aggregation must stay gone
    assert(p.contains("partial_collect_set"),
      s"covered positions must aggregate map-side into per-doc sets:\n$p")
    assert(!p.contains("LeftAnti"),
      s"the keep filter is an array_except projection, not an anti join:\n$p")
    assert(!p.contains("posexplode"),
      s"the corpus token stream must never explode:\n$p")
    assert(p.contains("array_except"), s"rebuild must be the hash-based array projection:\n$p")
  }

  test("x79: BM25 serve broadcasts query terms; top-k is the bounded agg, not a window") {
    val p = plan("x79_bm25_search")
    assert(p.contains("BroadcastHashJoin"), s"query terms must broadcast:\n$p")
    assert(!p.contains("Window"), s"ranking must be the heap aggregate, not a window:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"index aggs must map-side combine:\n$p")
  }

  test("x82: epoch-mix windows all partition by source — no global data window") {
    val p = plan("x82_epoch_mix")
    // SinglePartition exchanges exist only under the one-row budget/plan
    // scalar aggregates; the thing that must never happen is a WINDOW over
    // data rows without a partition spec (the global-cut scale trap)
    val wins = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(wins.nonEmpty, s"expected the offset/cut windows in:\n$p")
    assert(wins.forall(_.contains("windowspecdefinition(source#")),
      s"every window must lead with the source partition key:\n${wins.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x84: encoding repair is a narrow map — no joins, one presentation sort") {
    val p = plan("x84_encoding_repair")
    assert(!p.contains("Join"), s"repair must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x87: banded image near-dup joins on (band, value) — never all pairs") {
    val p = plan("x87_image_neardup")
    assert(!p.contains("CartesianProduct"), s"banding exists to avoid all pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x89: robots gate is a narrow map — no joins, one presentation sort") {
    val p = plan("x89_robots_gate")
    assert(!p.contains("Join"), s"the gate must not join anything:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
  }

  test("x73: PDF decode is a narrow map — no shuffle but the presentation sort") {
    val p = plan("x73_pdf_extract")
    assert(!p.contains("Join"), s"per-row PDF decode must not join:\n$p")
    assert(exchanges(p) <= 1, s"only the orderBy range exchange is allowed:\n$p")
    assert(!p.contains("n_chars"), s"documents scan must prune unreferenced columns:\n$p")
  }

  test("x75: Dolma ingest is one container groupBy + narrow decode, no joins") {
    val p = plan("x75_dolma_ingest")
    assert(!p.contains("Join"), s"container build/parse must not join:\n$p")
    // container groupBy + presentation sort; partial aggregation on the
    // map side keeps the container shuffle at one pass
    assert(exchanges(p) <= 2, s"container groupBy + orderBy only:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
  }

  test("x76: z-order cells are one partial-agg shuffle of pure arithmetic") {
    val p = plan("x76_zorder_layout")
    assert(!p.contains("Join"), s"z-value math must not join:\n$p")
    assert(exchanges(p) <= 2, s"cell groupBy + orderBy only:\n$p")
    assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
    // the interleave is column arithmetic (codegen-able), never a UDF
    // (AQE prints isFinalPlan=false here, so WholeStageCodegen spans are
    // not visible in the string — absence of eval nodes is the pin)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("x19: no single-partition window ever runs over the document rows") {
    val p = plan("x19_seq_pack")
    // the per-row cumsum must be partitioned by bucket; the only
    // unpartitioned window is the ≤`buckets`-row offsets frame
    val rowWindows = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("doc_id#")).toSeq
    assert(rowWindows.nonEmpty, p)
    assert(rowWindows.forall(_.contains("__bkt#")),
      s"row-level window lost its bucket partitioning:\n$p")
    // and the bucket totals reach the rows via broadcast, not a shuffled join
    assert(p.contains("BroadcastHashJoin [__bkt"),
      s"bucket offsets must broadcast, not shuffle:\n$p")
  }

  test("x90: RRF fusion never cartesians; final re-rank partitions by query") {
    val p = plan("x90_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // the one data-sized nested loop allowed is the dense ranker's
    // broadcast query batch (x05 shape); fusion itself is union+agg+window
    val wins = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(wins.nonEmpty && wins.forall(_.contains("windowspecdefinition(qid#")),
      s"fusion re-rank must partition by qid:\n${wins.mkString("\n")}")
  }

  test("x93: PPS sampling windows partition by (group, bucket) — never whole-group") {
    val p = plan("x93_pps_sample")
    val rowWins = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("id#")).toSeq
    assert(rowWins.nonEmpty, p)
    assert(rowWins.forall(w => w.contains("group#") && w.contains("__b#")),
      s"row-level cumsum lost its (group, bucket) partitioning:\n${rowWins.mkString("\n")}")
    // per-group totals broadcast back, never shuffled onto the rows
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x94: count-min build is one partial-agg shuffle; probes join the tiny sketch") {
    val p = plan("x94_countmin")
    assert(p.contains("partial_count"), s"sketch cells must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x96: classifier training joins weights by broadcast, gradients map-side combine") {
    val p = plan("x96_train_classifier")
    // the iteration bodies ran eagerly (localCheckpoint) during plan()—
    // what remains visible is the final weights frame; pin the TRAINING
    // plan on an un-materialized round instead
    val feats = graft.ext.Classifier.hashedFeatures(
      graft.Tables.documents(spark, d), org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text"), 32)
    val labels = graft.Tables.documents(spark, d).selectExpr("doc_id as id",
      "cast(1.0 as double) as y")
    val w = spark.range(33).selectExpr("id as j", "cast(0 as long) as w")
    import org.apache.spark.sql.functions._
    val margins = feats.join(broadcast(w), "j")
      .groupBy("id").agg(sum(col("x") * col("w")).as("__dot"))
    val mp = margins.queryExecution.executedPlan.toString
    assert(mp.contains("BroadcastHashJoin"), s"weights must broadcast:\n$mp")
    assert(mp.contains("partial_sum"), s"margins must map-side combine:\n$mp")
    assert(p.nonEmpty)
  }

  test("x97: serving gate is one broadcast join + one combined aggregation") {
    val p = plan("x97_classifier_gate")
    assert(p.contains("BroadcastHashJoin"), s"trained weights must broadcast:\n$p")
    assert(p.contains("partial_sum"), s"margin sums must map-side combine:\n$p")
    assert(!p.contains("SortMergeJoin"), s"nothing here justifies a sort-merge:\n$p")
  }

  test("x109: PMI top-k is a TakeOrdered over the pair table — no global sort, " +
    "counts map-side combine, N broadcasts") {
    import org.apache.spark.sql.functions.col
    val p = graft.ext.LmScore.pmiCollocations(
        graft.Tables.documents(spark, d), col("doc_id"), col("text"),
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not globally sort:\n$p")
    assert(p.contains("partial_count"), s"counts must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x110: prefix-filter candidates come from equi-joins only — no cartesian, " +
    "no nested loop anywhere in the exact similarity join") {
    import org.apache.spark.sql.functions.col
    val p = graft.ext.TextDedup.prefixFilterNearDups(
        graft.Tables.documents(spark, d), col("doc_id"), col("text"),
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), s"shingle frequency must map-side combine:\n$p")
  }

  test("x112: novelty scoring is gram equi-join + one combined per-doc agg") {
    val p = plan("x112_ngram_novelty")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), s"per-doc counts must map-side combine:\n$p")
  }

  test("x115: rolling anomaly is ONE key shuffle + an incremental RANGE window") {
    val p = plan("x115_rolling_anomaly")
    // the user_id exchange for the window + the presentation orderBy range
    // exchange — nothing else; the frame must never re-shuffle per stat
    assert(exchanges(p) <= 2, s"expected ≤2 shuffles (window + orderBy):\n$p")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x117: radius-join candidates are an EQUI-join on cell ids — the only " +
    "nested loop is the one-row broadcast radius") {
    val p = plan("x117_grid_radius_join")
    assert(!p.contains("CartesianProduct"), p)
    // the pair join must be hash/sort-merge on the (cx+dx, cy+dy) keys;
    // BroadcastNestedLoopJoin may appear ONLY for the 1-row rad frame
    // (twice: once per side deriving cells from it)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).nonEmpty, s"pair join must be an equi-join:\n$p")
  }

  test("x116: skyline's global window runs over bucket maxima via broadcast, " +
    "never over the pair table") {
    val p = plan("x116_skyline")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket prefix maxima must broadcast back:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x118: every funnel stage joins and aggregates on the user key only") {
    val p = plan("x118_funnel")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x120: shard assembly is one partial-aggregated shuffle on the bucket key") {
    val p = plan("x120_webdataset_shards")
    assert(!p.contains("CartesianProduct"), p)
    // collect_list per bucket: objHashAggregate with a partial phase —
    // entry lists combine map-side, shards never funnel through one task
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_collect_list"), p)
  }

  test("x124: cohort matrix is key-partitioned aggs + one equi-join on the user key") {
    val p = plan("x124_cohort_retention")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_"), p) // map-side combine on the aggs
  }

  test("x125: phrase postings joins are equi-joins; the term filters prune the stream") {
    val p = plan("x125_phrase_search")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty, p)
  }

  test("x126: each LPA round is an equi-join against the label table — no cartesian") {
    val p = plan("x126_lpa_communities")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x121: wedge and closure joins are equi-joins on node ids — no cartesian, " +
    "and the one-row census aggregates broadcast") {
    val p = plan("x121_triangle_census")
    assert(!p.contains("CartesianProduct"), p)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"wedge/closure joins must be equi-joins (at sf0.001 the planner may " +
        s"broadcast the tiny oriented-edge side):\n$p")
    // the final census stitches three one-row aggregates — broadcast only
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("MoR read: tombstone suppression is a BROADCAST anti-join — the corpus " +
    "never shuffles to resolve a point delete") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_planspec_dv").toString + "/tbl"
    graft.io.Snapshots.commitAppend(
      (1L to 1000L).map(i => (i, i * 10L)).toDF("id", "v"), t, recordSchema = true)
    graft.io.Snapshots.deleteWhereMor(spark, t, col("id") <= 3L, keys = Seq("id"))
    val p = graft.io.Snapshots.readAt(spark, t).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"dv suppression must be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a point-delete dv must never sort-merge the corpus:\n$p")
  }

  test("readPoint: the scan reads ONLY bloom candidates, not the live set") {
    import org.apache.spark.sql.functions.{col, md5}
    val t = java.nio.file.Files.createTempDirectory("graft_planspec_bloom").toString + "/tbl"
    (0 until 4).foreach { i =>
      graft.io.Snapshots.commitAppend(
        spark.range(i.toLong * 100, i * 100 + 100)
          .select(col("id"), md5(col("id").cast("string")).as("ukey")).coalesce(1),
        t, recordSchema = true)
    }
    graft.io.Snapshots.buildBloomIndex(spark, t, "ukey", fpp = 0.001)
    val probe = java.security.MessageDigest.getInstance("MD5")
      .digest("242".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = graft.io.Snapshots.readPoint(spark, t, "ukey", Seq(probe))
    // the physical proof of the pruning: the plan's input files are the
    // bloom candidates (≤2 of 4 at this fpp), never the whole live set
    assert(df.inputFiles.length <= 2,
      s"readPoint must scan only bloom candidates, read ${df.inputFiles.length} files")
    assert(df.count() === 1)
  }

  test("IVM maintain: the view-state probe broadcasts the change-sized delta") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_planspec_ivm").toString
    val t = s"$root/tbl"
    graft.io.Snapshots.commitAppend(
      (1L to 500L).map(i => (i, s"g${i % 7}", i)).toDF("id", "grp", "m"),
      t, recordSchema = true)
    graft.io.ViewMaintenance.maintain(spark, t, Seq("id"), Seq("grp"), Seq("m"),
      s"$root/feed", s"$root/view")
    graft.io.Snapshots.mergeInto(spark, t,
      Seq((2L, "g0", 999L)).toDF("id", "grp", "m"), keys = Seq("id"))
    graft.io.ViewMaintenance.maintain(spark, t, Seq("id"), Seq("grp"), Seq("m"),
      s"$root/feed", s"$root/view")
    // the view equals the direct aggregate (law), and the maintained state
    // table stayed small — one row per live group, zero-rows filtered
    val view = graft.io.ViewMaintenance.readView(spark, s"$root/view")
    assert(view.count() === 7)
    val direct = graft.io.Snapshots.readAt(spark, t)
      .groupBy("grp").agg(org.apache.spark.sql.functions.sum("m").as("sum_m"))
      .as[(String, Long)].collect().toMap
    assert(view.select("grp", "sum_m").as[(String, Long)].collect().toMap === direct)
  }

  test("x155: greedy packing is ONE shard shuffle + a partition-local pass, no sort, no cartesian") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, d)
    val p = graft.ext.Packing.packGreedy(df, col("doc_id"),
      size(split(col("text"), " ", -1)), capacity = 512L, shards = 32)
      .queryExecution.executedPlan.toString
    assert(exchanges(p) <= 1, s"expected exactly the shard repartition:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the per-shard order comes from sortWithinPartitions — NO global Sort
    // exchange (a range Exchange would mean a cluster-wide sort)
    assert(!p.contains("rangepartitioning"), s"no global sort expected:\n$p")
  }
}
