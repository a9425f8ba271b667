package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics for web-crawl curation: PageRank over a (possibly
  * multi-) edge list, the standard "rank domains before you spend tokens
  * on them" signal (Common Crawl publishes exactly this shape — a
  * domain-level rank used to prioritize fetch and filter spam farms).
  *
  * Determinism / oracle parity: the whole iteration runs in INTEGER
  * arithmetic. Ranks live in pico-units (Σ ranks ≈ 1e12 = probability 1);
  * each edge forwards `(rank · w) div outw`, damping is `(85 · x) div 100`,
  * and dangling mass is redistributed as `dm div n`. Integer sums are
  * associative — no floating-point shuffle-order sensitivity — and every
  * operation has an exact DuckDB twin (`//`), so a 10-iteration run is
  * bit-reproducible cross-engine. The truncation bias (mass lost to the
  * `div`s each round) is identical in both engines and bounded by
  * n + |E| pico-units per iteration — irrelevant at 1e12 scale.
  *
  * Scale posture: the edge list is the big thing (billions of page→page
  * links); it is collapsed to weighted (src,dst,w) ONCE (one shuffle),
  * joined per-iteration against the rank table on src (ids-only rows),
  * and each iteration is one equi-join + one sum-aggregate + one scalar
  * dangling aggregate — the canonical iterative-Spark shape. Rank state is
  * localCheckpoint'ed per round with superseded blocks released (same
  * frame-owned release discipline as TextDedup.connectedComponents), so
  * block-manager usage stays at one live rank copy regardless of rounds.
  */
object LinkGraph {

  /** PageRank in integer pico-units. `edges` is a raw (multi-)edge list;
    * parallel edges become weights. Returns `(node, rank_pico)`.
    *
    * `iters` fixed (no convergence test): crawl-curation ranking wants a
    * reproducible artifact, and 8-12 damped iterations are the published
    * practice for rank stabilization at web scale.
    *
    * `init`: optional WARM-START ranks `(node, rank_pico)` — the
    * incremental-maintenance path: after appending a delta month of
    * links, re-iterating a few rounds from the previous committed rank
    * vector converges where a cold start would need the full schedule
    * (the perturbation is local; damped iteration contracts it
    * geometrically). Nodes absent from `init` (newly discovered domains)
    * seed at the uniform 1e12/n. */
  def pageRankPico(edges: DataFrame, src: String, dst: String, iters: Int = 8,
                   dampNum: Long = 85L, dampDen: Long = 100L,
                   init: Option[DataFrame] = None,
                   seeds: Option[DataFrame] = None,
                   releaseInit: Boolean = false): DataFrame = {
    val scale = 1000000000000L // Σ ranks ≈ 1e12 ≡ probability mass 1
    // collapse the multigraph once; everything downstream joins this
    val w = edges.groupBy(col(src).as("src"), col(dst).as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = w.groupBy("src").agg(sum("w").as("outw"))
    val ew = w.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // PERSONALIZED mode (`seeds`): teleport and dangling mass land only on
    // the seed set (topic-sensitive PageRank — rank domains by proximity
    // to a curated seed list instead of globally). __seed rides on the
    // node table; the per-iteration algebra is otherwise identical.
    val nodes0 = w.select(col("src").as("node"))
      .unionByName(w.select(col("dst").as("node"))).distinct()
    // __dang (no outgoing edges) is a STATIC per-node fact — computed once
    // here and carried on the node/rank tables, so the per-iteration
    // dangling-mass aggregate is a FILTER over the checkpointed rank
    // vector instead of an anti-join against `srcs` (whose plan re-derived
    // w → outw from the RAW edge list every iteration: one full edge scan
    // + shuffle per round that the cache never served — at web scale,
    // iters × O(|E|) wasted work; guide §2.4 "remove shuffles outright")
    val nodes = (seeds match {
      case None => nodes0.withColumn("__seed", lit(1L))
      case Some(sd) => nodes0.join(
          broadcast(sd.select(col(sd.columns.head).as("node"), lit(1L).as("__seed"))),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__seed"), lit(0L)).as("__seed"))
    }).join(outw.select(col("src").as("node"), lit(1L).as("__out")), Seq("node"), "left")
      .select(col("node"), col("__seed"),
        col("__out").isNull.cast("long").as("__dang"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodesWide = nodes
    val n = nodesWide.count()
    if (n == 0) { ew.unpersist(); return nodes.select(col("node"), lit(0L).as("rank_pico")) }

    // SCALE-ADAPTIVE iteration width (guide §2): every round shuffles the
    // rank vector (O(nodes) rows of ~24 bytes) and scans the cached node
    // and edge tables, so round cost is (stages × partitions) of task
    // launches once partitions stop carrying real data. Derive the width
    // from the measured node count (~100k nodes per partition, floored at
    // 1, capped at the session setting so a big graph still gets the
    // configured width). Conf alone is NOT enough: a cached session-width
    // table anchors every downstream join at that width regardless of the
    // conf (EnsureRequirements matches the existing partitioning) — which
    // is exactly what profiling showed (conf-only sizing left the
    // 2,676-task iteration schedule untouched). So the node cache is
    // RE-ANCHORED: one node-sized repartition out of the wide cache into
    // an iterParts-wide cache that the whole loop joins against. Restored
    // in the finally — the session conf is shared.
    val prevParts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    val sessionWidth = scala.util.Try(prevParts.toLong).getOrElse(200L)
    val iterParts = math.min(sessionWidth, n / 100000L + 1L)
    edges.sparkSession.conf.set("spark.sql.shuffle.partitions", iterParts)
    // DATA-CONDITIONAL adaptive-planning gate, keyed on the measured node
    // count like the width itself: at iterParts == 1 every exchange in the
    // loop body is a single partition — AQE has nothing to coalesce and no
    // skew to split, but still re-optimizes the plan and materializes it
    // stage-by-stage on EVERY iteration (~90 ms/round of pure driver work
    // in the profile). Wider graphs keep AQE untouched. Restored in the
    // same finally as the width.
    val prevAqe = edges.sparkSession.conf.get("spark.sql.adaptive.enabled")
    if (iterParts == 1L)
      edges.sparkSession.conf.set("spark.sql.adaptive.enabled", "false")
    val nodesIter =
      if (iterParts >= sessionWidth) nodesWide // already at the right width
      else {
        val ni = nodesWide.repartition(col("node"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        ni.count() // fill from the wide cache — one node-sized shuffle
        nodesWide.unpersist(blocking = false)
        ni
      }
    val finalRanks = try {
    // teleport denominator: every node (uniform mode) or the seed count
    val k = seeds.map(_ => nodesIter.filter(col("__seed") === 1L).count()).getOrElse(n)
    require(k > 0, "personalized PageRank needs at least one seed present in the graph")
    val base = (scale - dampNum * scale / dampDen) / k // teleport share, exact ints

    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }

    var ranks = init match {
      case None => nodesIter.select(col("node"), col("__seed"), col("__dang"),
        lit(scale / n).as("rank")).localCheckpoint(true)
      case Some(prev) =>
        val r0 = nodesIter.join(prev.select(col("node"), col("rank_pico").as("__pr")),
            Seq("node"), "left")
          .select(col("node"), col("__seed"), col("__dang"),
            coalesce(col("__pr"), lit(scale / n)).as("rank"))
          .localCheckpoint(true)
        // `releaseInit`: the warm-start ranks are folded into r0 above, so
        // a CHAINED caller (cold build → warm maintenance, x98's shape)
        // can hand ownership of the cold phase's final checkpoint here and
        // have its blocks freed the moment they're absorbed — otherwise
        // every phase's last rank table stays in the block manager for the
        // JVM's lifetime (each call releases its SUPERSEDED rounds, but
        // its final result must outlive the call for the caller to read).
        if (releaseInit) checkpointRdds(prev).foreach(_.unpersist(blocking = false))
        r0
    }
    var ranksRdds = checkpointRdds(ranks)
    var i = 0
    while (i < iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(rank * w) div outw")).as("c"))
      // dangling mass: a filter over the (checkpointed) rank vector — the
      // __dang flag was joined once at build time
      val dangling = ranks.filter(col("__dang") === 1L)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
      val next = nodesIter.join(contrib, Seq("node"), "left")
        .crossJoin(dangling) // one-row scalar — broadcast, not a real cross
        .select(col("node"), col("__seed"), col("__dang"),
          (expr(s"if(__seed = 1L, ${base}L, 0L)") +
            expr(s"($dampNum * (coalesce(c, 0L) + if(__seed = 1L, dm div ${k}L, 0L))) div $dampDen"))
          .as("rank"))
        .localCheckpoint(true)
      val nextRdds = checkpointRdds(next)
      ranksRdds.foreach(_.unpersist(blocking = false))
      ranks = next
      ranksRdds = nextRdds
      i += 1
    }
    ranks
    } finally {
      edges.sparkSession.conf.set("spark.sql.shuffle.partitions", prevParts)
      edges.sparkSession.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    ew.unpersist(blocking = false)
    nodesIter.unpersist(blocking = false)
    finalRanks.select(col("node"), col("rank").cast("long").as("rank_pico"))
  }

  /** The unrolled-iteration CTE block of the oracle, prefixed so multiple
    * PageRank phases (e.g. cold build + warm-started maintenance) compose
    * in one statement. Requires `${p}edges(src, dst)` to exist; emits
    * `${p}w/${p}ow/${p}nodes/${p}nn/${p}r0..rN`; warm-starts from the
    * relation named by `initRef` (`(node, rank)`) when given. Returns the
    * CTE text (leading comma included). */
  def pageRankOracleCtes(p: String, iters: Int,
                         dampNum: Long = 85L, dampDen: Long = 100L,
                         initRef: Option[String] = None,
                         seedsRef: Option[String] = None): String = {
    val scale = "1000000000000"
    val sb = new StringBuilder
    sb ++= s""",
              |${p}w AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM ${p}edges GROUP BY 1, 2),
              |${p}ow AS MATERIALIZED (SELECT src, sum(w) AS outw FROM ${p}w GROUP BY 1),
              |${p}nodes AS MATERIALIZED (SELECT src AS node FROM ${p}w UNION SELECT dst FROM ${p}w),
              |${p}nn AS MATERIALIZED (SELECT count(*) AS n FROM ${p}nodes)""".stripMargin
    seedsRef.foreach { sr =>
      sb ++= s""",
                |${p}sk AS MATERIALIZED (SELECT count(*) AS k FROM ${p}nodes
                |        JOIN $sr s ON ${p}nodes.node = s.node)""".stripMargin
    }
    sb ++= (initRef match {
      case None => s""",
              |${p}r0 AS MATERIALIZED (SELECT node, $scale // n AS rank FROM ${p}nodes, ${p}nn)""".stripMargin
      case Some(init) => s""",
              |${p}r0 AS MATERIALIZED (SELECT ${p}nodes.node,
              |             coalesce($init.rank, $scale // n) AS rank
              |           FROM ${p}nodes LEFT JOIN $init ON ${p}nodes.node = $init.node,
              |                ${p}nn)""".stripMargin
    })
    for (i <- 1 to iters) {
      val q = i - 1
      sb ++= s""",
                |${p}c$i AS MATERIALIZED (SELECT w.dst AS node,
                |          CAST(sum((r.rank * w.w) // ow.outw) AS BIGINT) AS c
                |        FROM ${p}w w JOIN ${p}r$q r ON w.src = r.node
                |             JOIN ${p}ow ow ON w.src = ow.src GROUP BY 1),
                |${p}d$i AS MATERIALIZED (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dm
                |        FROM ${p}r$q WHERE node NOT IN (SELECT src FROM ${p}ow)),""".stripMargin
      sb ++= (seedsRef match {
        case None => s"""
                |${p}r$i AS MATERIALIZED (SELECT ${p}nodes.node,
                |          ($scale - $dampNum * $scale // $dampDen) // n
                |          + ($dampNum * (coalesce(c.c, 0) + d.dm // n)) // $dampDen AS rank
                |        FROM ${p}nodes LEFT JOIN ${p}c$i c ON ${p}nodes.node = c.node,
                |             ${p}d$i d, ${p}nn)""".stripMargin
        case Some(sr) => s"""
                |${p}r$i AS MATERIALIZED (SELECT ${p}nodes.node,
                |          CASE WHEN s.node IS NOT NULL
                |               THEN ($scale - $dampNum * $scale // $dampDen) // k ELSE 0 END
                |          + ($dampNum * (coalesce(c.c, 0)
                |             + CASE WHEN s.node IS NOT NULL THEN d.dm // k ELSE 0 END)) // $dampDen AS rank
                |        FROM ${p}nodes LEFT JOIN ${p}c$i c ON ${p}nodes.node = c.node
                |             LEFT JOIN $sr s ON ${p}nodes.node = s.node,
                |             ${p}d$i d, ${p}sk)""".stripMargin
      })
    }
    sb.toString
  }

  /** The matching DuckDB oracle for [[pageRankPico]], generated for a given
    * edge-list CTE: unrolled iterations of the identical integer algebra.
    * `edgesCte` must define a relation `edges(src, dst)`. Lives next to the
    * operator so the algebra and its twin can't drift apart. */
  def pageRankOracleSql(edgesCte: String, iters: Int = 8,
                        dampNum: Long = 85L, dampDen: Long = 100L): String =
    s"WITH $edgesCte" + pageRankOracleCtes("", iters, dampNum, dampDen) +
      s"""
         |SELECT node, CAST(rank AS BIGINT) AS rank_pico FROM r$iters
         |ORDER BY rank_pico DESC, node""".stripMargin

  /** Synchronous label-propagation communities (LPA, Raghavan et al.) over
    * an undirected (multi-)edge list of LONG node ids — the cheap
    * community detector run next to PageRank in crawl audits (link farms
    * and mirror clusters collapse into one label long before a modularity
    * method would be affordable at web scale).
    *
    * Determinism (LPA is famously order-sensitive; this variant is not):
    * SYNCHRONOUS rounds — every node votes with its neighbors' ROUND-t
    * labels — and the argmax tie-break is total: highest count, then
    * LOWEST label. Labels start as the node ids, so the whole run is
    * integer-exact and the DuckDB twin replays it round for round.
    *
    * Scale posture: each round is one equi-join of the adjacency list
    * against the O(n) label table on the neighbor key + two partial-
    * aggregated group-bys — the same per-iteration shape as
    * [[pageRankPico]], with the same per-round localCheckpoint /
    * superseded-block-release discipline (one live label copy regardless
    * of rounds). Fixed `iters` (no convergence test): a reproducible
    * artifact, and sync-LPA's 2-cycles make "unchanged" a wrong stopping
    * rule anyway.
    *
    * Isolated nodes (no edges) have no votes and are not returned —
    * community membership is a statement about connectivity.
    * Returns `(node, label)`. */
  def labelPropagate(edges: DataFrame, src: String, dst: String,
                     iters: Int = 3): DataFrame = {
    val e = edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // partitioned by the join key ONCE: every round joins labels on `nb`,
    // so the cached layout already satisfies the join's distribution and
    // only the (node-sized) label table moves per round — without this
    // the adjacency re-shuffles every iteration (guide §2.4)
    val adj = e.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nb")))
      .repartition(col("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("lab")).localCheckpoint(true)
    var labelRdds = checkpointRdds(labels)
    var i = 0
    while (i < iters) {
      val votes = adj
        .join(labels.select(col("node").as("nb"), col("lab")), "nb")
        .groupBy("node", "lab").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) in ONE max: labels are ≥ 0, so
      // max(struct(c, -lab)) picks the highest count, lowest label
      val next = votes
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lab"))
        .localCheckpoint(true)
      val nextRdds = checkpointRdds(next)
      labelRdds.foreach(_.unpersist(blocking = false))
      labels = next
      labelRdds = nextRdds
      i += 1
    }
    adj.unpersist(blocking = false)
    labels
  }

  /** The matching DuckDB oracle CTE block for [[labelPropagate]]: unrolled
    * synchronous rounds of the identical (count desc, label asc) argmax.
    * Requires `edges(src, dst)`; emits `lpa_l$iters(v, lab)`. */
  def labelPropagateOracleCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """, lpa_e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |            FROM edges WHERE src <> dst),
        |lpa_adj AS (SELECT u AS v, v AS nb FROM lpa_e
        |            UNION ALL SELECT v, u FROM lpa_e),
        |lpa_l0 AS (SELECT DISTINCT v, v AS lab FROM lpa_adj)""".stripMargin)
    (1 to iters).foreach { i =>
      sb.append(s""",
        |lpa_l$i AS (SELECT v, lab FROM (
        |    SELECT a.v AS v, l.lab AS lab, count(*) AS c,
        |           row_number() OVER (PARTITION BY a.v
        |                              ORDER BY count(*) DESC, l.lab ASC) AS rk
        |    FROM lpa_adj a JOIN lpa_l${i - 1} l ON l.v = a.nb
        |    GROUP BY a.v, l.lab)
        |  WHERE rk = 1)""".stripMargin)
    }
    sb.toString
  }

  /** Triangle census + global clustering coefficient over an undirected
    * (multi-)edge list of LONG node ids — the link-graph cohesion signal
    * (spam farms and link rings show up as anomalous triangle density;
    * clustering coefficient is the standard graph-quality scalar reported
    * next to PageRank in crawl audits).
    *
    * Scale posture (the Schank/Suri–Vassilvitskii orientation): every edge
    * is oriented from its LOWER (degree, id) endpoint to the higher, so a
    * triangle x→y→z (ranks ascending) is found exactly once — as the wedge
    * (y,z) at its lowest-rank apex x, closed by the oriented edge y→z. The
    * orientation bounds any node's OUT-degree by O(√m) on arbitrary graphs
    * (a node of degree d only keeps edges to ≥-degree neighbors, and there
    * are ≤ 2m/d of those), so hub skew — the thing that kills the naive
    * "wedges at every node" join, where one celebrity node mints deg²
    * candidates — is structurally capped: Σ outdeg² = O(m^1.5) worst-case,
    * shuffled as plain equi-joins on node ids. Nothing all-pairs, nothing
    * collected; the wedge→closure probe is an equi-join on (y,z) pairs.
    *
    * Returns ONE row: `n_nodes, n_edges, n_wedges` (open+closed, Σ C(d,2)),
    * `n_triangles`, and `cc_micro` = ⌊3·T·1e6 / wedges⌋ (0 when wedge-free)
    * — all exact integers, so the DuckDB twin states the same census from
    * the definition (a 3-way self-join) rather than replaying the
    * orientation, which keeps the oracle independent of the algorithm. */
  def triangleStats(edges: DataFrame, src: String, dst: String): DataFrame = {
    // canonical undirected simple graph: (u<v), self-loops and parallel
    // edges dropped — one shuffle
    val e = edges.select(least(col(src), col(dst)).as("u"),
        greatest(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient each edge low-rank → high-rank, rank = (degree, id); carry the
    // destination's degree so wedge ordering needs no extra join
    val oriented = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db")))
          .as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b"), col("o.db").as("db"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at the apex: out-neighbor pairs in rank order, closed by an
    // oriented edge — both plain equi-joins
    val wedgePairs = oriented.as("e1").join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          (col("e1.db") < col("e2.db") ||
            (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.b").as("x"), col("e2.b").as("y"))
    val triangles = wedgePairs.join(
      oriented.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    deg.agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).cast("long").as("n_wedges"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(triangles.agg(count(lit(1)).as("n_triangles"))))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges > 0 THEN (n_triangles * 3 * 1000000) div n_wedges " +
          "ELSE 0 END").cast("long").as("cc_micro"))
  }
}
