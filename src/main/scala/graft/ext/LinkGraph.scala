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
    * practice for rank stabilization at web scale. */
  def pageRankPico(edges: DataFrame, src: String, dst: String, iters: Int = 8,
                   dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val scale = 1000000000000L // Σ ranks ≈ 1e12 ≡ probability mass 1
    // collapse the multigraph once; everything downstream joins this
    val w = edges.groupBy(col(src).as("src"), col(dst).as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = w.groupBy("src").agg(sum("w").as("outw"))
    val ew = w.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = w.select(col("src").as("node"))
      .unionByName(w.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    if (n == 0) { ew.unpersist(); return nodes.withColumn("rank_pico", lit(0L)) }
    val srcs = outw.select(col("src").as("node"))
    val base = (scale - dampNum * scale / dampDen) / n // teleport share, exact ints

    def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }

    var ranks = nodes.withColumn("rank", lit(scale / n)).localCheckpoint(true)
    var ranksRdds = checkpointRdds(ranks)
    var i = 0
    while (i < iters) {
      val contrib = ew.join(ranks, ew("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(rank * w) div outw")).as("c"))
      val dangling = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dangling) // one-row scalar — broadcast, not a real cross
        .select(col("node"), (lit(base) +
          expr(s"($dampNum * (coalesce(c, 0L) + dm div ${n}L)) div $dampDen"))
          .as("rank"))
        .localCheckpoint(true)
      val nextRdds = checkpointRdds(next)
      ranksRdds.foreach(_.unpersist(blocking = false))
      ranks = next
      ranksRdds = nextRdds
      i += 1
    }
    ew.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks.select(col("node"), col("rank").cast("long").as("rank_pico"))
  }

  /** The matching DuckDB oracle for [[pageRankPico]], generated for a given
    * edge-list CTE: unrolled iterations of the identical integer algebra.
    * `edgesCte` must define a relation `edges(src, dst)`. Lives next to the
    * operator so the algebra and its twin can't drift apart. */
  def pageRankOracleSql(edgesCte: String, iters: Int = 8,
                        dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val scale = "1000000000000"
    val sb = new StringBuilder
    sb ++= s"""WITH $edgesCte,
              |w AS (SELECT src, dst, count(*) AS w FROM edges GROUP BY 1, 2),
              |ow AS (SELECT src, sum(w) AS outw FROM w GROUP BY 1),
              |nodes AS (SELECT src AS node FROM w UNION SELECT dst FROM w),
              |nn AS (SELECT count(*) AS n FROM nodes),
              |r0 AS (SELECT node, $scale // n AS rank FROM nodes, nn)""".stripMargin
    for (i <- 1 to iters) {
      val p = i - 1
      sb ++= s""",
                |c$i AS (SELECT w.dst AS node,
                |          CAST(sum((r.rank * w.w) // ow.outw) AS BIGINT) AS c
                |        FROM w JOIN r$p r ON w.src = r.node
                |             JOIN ow ON w.src = ow.src GROUP BY 1),
                |d$i AS (SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dm
                |        FROM r$p WHERE node NOT IN (SELECT src FROM ow)),
                |r$i AS (SELECT nodes.node,
                |          ($scale - $dampNum * $scale // $dampDen) // n
                |          + ($dampNum * (coalesce(c$i.c, 0) + d$i.dm // n)) // $dampDen AS rank
                |        FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node, d$i, nn)""".stripMargin
    }
    sb ++= s"""
              |SELECT node, CAST(rank AS BIGINT) AS rank_pico FROM r$iters
              |ORDER BY rank_pico DESC, node""".stripMargin
    sb.toString
  }
}
